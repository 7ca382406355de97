"""Round-4 batch B: C4-style line filtering + head-metadata extraction.

``docs_c4_filter`` — the C4 line-level quality filter (Raffel et al.
2020, "Exploring the Limits of Transfer Learning…", §2.2): split each
document into lines, keep a line only if it ends in terminal
punctuation AND has at least 5 words, keep the document only if at
least 3 lines survive.  The synthetic ``documents`` table carries no
newlines or punctuation, so both sides derive the SAME deterministic
line structure from the raw text: line ``j`` of a document is words
``[6j, 6j+6)`` and carries a terminal '.' iff ``(doc_id + j) % 3 == 0``
— the rule logic (the thing C4 is famous for) is then exercised for
real, with a full DuckDB oracle.  The Ray side never materializes line
strings: word lengths + Arrow list offsets + ``np.add.reduceat`` /
``np.bincount`` compute every per-line and per-doc statistic
arithmetically, so the stage is a pure numpy scan (no Python loop, no
string rebuilds) — at 100 TB this runs at memory bandwidth inside
``map_batches`` with zero shuffle.

``pages_head_meta`` — registry-facing twin of ``core/html_meta.py``
(M26): per document it renders an HTML head with KNOWN field values
(entity-encoded title, attribute order/quoting/case rotated by
``doc_id % 3``, decoy second title + in-body title that must be
ignored), runs the head parser, and returns the EXTRACTED strings; the
oracle recomputes the expected strings in SQL from ``doc_id``.  A
value-level oracle — any parser drift (entity decode, first-wins rule,
attribute quoting, scan cutoff at <body>) breaks the hash match.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_PYA = {"batch_format": "pyarrow", "zero_copy_batch": True}

_LINE_W = 6        # words per derived line
_MIN_WORDS = 5     # C4: drop lines with fewer than 5 words
_MIN_KEPT = 3      # C4: drop docs with fewer than 3 surviving lines


def _c4_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
               .astype(np.int64)
    text = pc.fill_null(batch.column("text"), "").combine_chunks()
    words = pc.split_pattern(text, pattern=" ")
    offs = words.offsets.to_numpy().astype(np.int64)
    wl = pc.utf8_length(words.values).to_numpy(zero_copy_only=False) \
           .astype(np.int64)

    n = len(ids)
    doc_w = np.diff(offs)                       # words per doc (>= 1)
    nl = (doc_w + _LINE_W - 1) // _LINE_W       # lines per doc
    tot = int(nl.sum())
    if tot == 0:
        zero = np.zeros(n, dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids), "n_lines": pa.array(zero),
            "n_kept": pa.array(zero), "kept_chars": pa.array(zero),
            "doc_keep": pa.array(np.zeros(n, dtype=bool)),
        })

    doc_rep = np.repeat(np.arange(n), nl)
    first_line = np.cumsum(nl) - nl
    within = np.arange(tot) - first_line[doc_rep]
    starts = offs[:-1][doc_rep] + _LINE_W * within
    # per-line word-length sums: line starts tile the flattened word
    # array in strictly increasing order, so one reduceat covers all docs
    wsum = np.add.reduceat(wl, starts)
    nw = np.minimum(_LINE_W, doc_w[doc_rep] - _LINE_W * within)
    dotted = ((ids[doc_rep] + within) % 3) == 0
    kept = (nw >= _MIN_WORDS) & dotted
    # kept lines are exactly the dotted ones: chars = wordlens + (nw-1)
    # separators + 1 terminal dot
    kept_len = (wsum + nw) * kept

    n_kept = np.bincount(doc_rep, weights=kept, minlength=n) \
               .astype(np.int64)
    kept_sum = np.bincount(doc_rep, weights=kept_len, minlength=n) \
                 .astype(np.int64)
    kept_chars = np.where(n_kept > 0, kept_sum + n_kept - 1, 0)
    return pa.table({
        "doc_id": pa.array(ids),
        "n_lines": pa.array(nl.astype(np.int64)),
        "n_kept": pa.array(n_kept),
        "kept_chars": pa.array(kept_chars.astype(np.int64)),
        "doc_keep": pa.array(n_kept >= _MIN_KEPT),
    })


def q_docs_c4_filter(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(_c4_batch, **_PYA))


SQL_DOCS_C4_FILTER = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), l AS (
  SELECT doc_id,
         len(ws[6*j+1 : 6*j+6]) AS nw,
         length(array_to_string(ws[6*j+1 : 6*j+6], ' ')) AS base_len,
         ((doc_id + j) % 3 = 0) AS dotted
  FROM d, LATERAL (SELECT unnest(generate_series(0,
           CAST(ceil(len(ws) / 6.0) AS INT) - 1)) AS j) t
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN nw >= 5 AND dotted THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(CASE WHEN SUM(CASE WHEN nw >= 5 AND dotted THEN 1 ELSE 0 END) > 0
            THEN SUM(CASE WHEN nw >= 5 AND dotted THEN base_len + 1 ELSE 0 END)
                 + SUM(CASE WHEN nw >= 5 AND dotted THEN 1 ELSE 0 END) - 1
            ELSE 0 END AS BIGINT) AS kept_chars,
       (SUM(CASE WHEN nw >= 5 AND dotted THEN 1 ELSE 0 END) >= 3)
           AS doc_keep
FROM l GROUP BY doc_id
"""


# --- pages_head_meta: value-level head-parser oracle --------------------

def _head_html(i: int) -> str:
    """Deterministic page with known head fields and parser traps."""
    title = f"Doc {i} &#8212; r&eacute;sum&eacute; &amp; overview"
    desc = f"Crawl snippet {(i * 7) % 100} for doc {i}"
    og_t = f"OG Doc {i}"
    canon = f"https://example.org/item/{i}"
    lang = ("en", "de", "fr")[i % 3]
    v = i % 3
    if v == 0:
        meta = f'<meta name="description" content="{desc}">'
        link = f'<link rel="canonical" href="{canon}">'
        og = f'<meta property="og:title" content="{og_t}">'
    elif v == 1:
        meta = f"<meta content='{desc}' name='description'>"
        link = f"<link href='{canon}' rel='canonical'>"
        og = f"<meta content='{og_t}' property='og:title'>"
    else:
        meta = f'<meta CONTENT="{desc}" NAME="Description">'
        link = f"<link href={canon} rel=canonical>"
        og = f'<meta PROPERTY="og:title" CONTENT="{og_t}">'
    return (
        f'<!DOCTYPE html><html lang="{lang.upper()}"><head>'
        f"<meta charset=\"utf-8\"><title>  {title} </title>"
        f"{meta}{og}{link}"
        f'<meta name="keywords" content="decoy, ignored">'
        f"<title>decoy second title {i}</title>"
        f'<link rel="alternate" href="https://example.org/alt/{i}">'
        f"</head><body><title>in-body decoy {i}</title>"
        f"<p>Body paragraph for doc {i}.</p></body></html>"
    )


def _head_meta_batch(batch: pa.Table) -> pa.Table:
    from ..core.html_meta import extract_head_meta

    ids = batch.column("doc_id").to_pylist()
    rows = [extract_head_meta(_head_html(i)) for i in ids]
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "title": pa.array([r["title"] for r in rows], type=pa.string()),
        "description": pa.array([r["description"] for r in rows],
                                type=pa.string()),
        "og_title": pa.array([r["og_title"] for r in rows],
                             type=pa.string()),
        "canonical": pa.array([r["canonical"] for r in rows],
                              type=pa.string()),
        "lang": pa.array([r["lang"] for r in rows], type=pa.string()),
    })


def q_pages_head_meta(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_head_meta_batch, **_PYA))


SQL_PAGES_HEAD_META = """
SELECT doc_id,
       'Doc ' || doc_id || ' — résumé & overview' AS title,
       'Crawl snippet ' || ((doc_id * 7) % 100) || ' for doc ' || doc_id
           AS description,
       'OG Doc ' || doc_id AS og_title,
       'https://example.org/item/' || doc_id AS canonical,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'en' WHEN 1 THEN 'de'
            ELSE 'fr' END AS lang
FROM documents
"""


# --- feed_items: value-level RSS/Atom parser oracle (M28) ---------------

def _feed_xml(i: int) -> str:
    """Deterministic feed: RSS for even ids, Atom for odd; 1 + i%3
    items with entity-encoded titles and CDATA summaries on odd item
    indexes — the parser branches the corpus exercises, but with
    doc_id-derived values SQL can recompute."""
    items = []
    for k in range(1 + i % 3):
        title = f"Item {i}-{k} &amp; notes"
        link = f"https://feeds.example/item/{i}/{k}"
        v = (i * 7 + k) % 50
        if k % 2:
            summary = f"<![CDATA[sum <b>{v}</b>]]>"
        else:
            summary = f"sum plain {v}"
        items.append((title, link, summary))
    if i % 2 == 0:
        body = "".join(
            f"<item><title>{t}</title><link>{li}</link>"
            f"<pubDate>Mon, 0{k % 9 + 1} Jan 2024 00:00:00 GMT</pubDate>"
            f"<description>{s}</description></item>"
            for k, (t, li, s) in enumerate(items))
        return ('<?xml version="1.0" encoding="utf-8"?><rss version="2.0">'
                f"<channel><title>Feed {i}</title>{body}</channel></rss>")
    body = "".join(
        f"<entry><title>{t}</title>"
        f'<link rel="alternate" href="{li}"/>'
        f"<updated>2024-01-0{k % 9 + 1}T00:00:00Z</updated>"
        f"<summary>{s}</summary></entry>"
        for k, (t, li, s) in enumerate(items))
    return ('<?xml version="1.0" encoding="utf-8"?>'
            '<feed xmlns="http://www.w3.org/2005/Atom">'
            f"<title>Feed {i}</title>{body}</feed>")


def _feed_items_batch(batch: pa.Table) -> pa.Table:
    from ..core.feed import parse_feed

    ids = batch.column("doc_id").to_pylist()
    o_id, o_idx, o_kind, o_title, o_link, o_sum = [], [], [], [], [], []
    for i in ids:
        parsed = parse_feed(_feed_xml(i))
        for k, it in enumerate(parsed["items"]):
            o_id.append(i)
            o_idx.append(k)
            o_kind.append(parsed["kind"])
            o_title.append(it["title"])
            o_link.append(it["link"])
            o_sum.append(it["summary"])
    return pa.table({
        "doc_id": pa.array(o_id, type=pa.int64()),
        "item_idx": pa.array(o_idx, type=pa.int64()),
        "kind": pa.array(o_kind, type=pa.string()),
        "title": pa.array(o_title, type=pa.string()),
        "link": pa.array(o_link, type=pa.string()),
        "summary": pa.array(o_sum, type=pa.string()),
    })


def q_feed_items(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_feed_items_batch, **_PYA))


SQL_FEED_ITEMS = """
WITH it AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(doc_id % 3 AS BIGINT))) AS item_idx
  FROM documents)
SELECT doc_id, item_idx,
       CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS kind,
       'Item ' || doc_id || '-' || item_idx || ' & notes' AS title,
       'https://feeds.example/item/' || doc_id || '/' || item_idx AS link,
       CASE WHEN item_idx % 2 = 1
            THEN 'sum <b>' || (doc_id * 7 + item_idx) % 50 || '</b>'
            ELSE 'sum plain ' || (doc_id * 7 + item_idx) % 50 END AS summary
FROM it
"""


# --- pages_jsonld: value-level JSON-LD oracle (M29) ----------------------

def _jsonld_html(i: int) -> str:
    """Page with one valid JSON-LD block (plain object or @graph wrapper
    by id), one broken-JSON block and one ordinary script — the traps a
    real page sets."""
    import json

    node = {
        "@context": "https://schema.org",
        "@type": ("Article", "NewsArticle", "BlogPosting")[i % 3],
        "headline": f"Headline {i}",
        "datePublished": f"2024-{1 + i % 12:02d}-01",
        "author": {"@type": "Person", "name": f"Author {i % 10}"},
    }
    payload = (json.dumps({"@context": "https://schema.org",
                           "@graph": [node]})
               if i % 4 == 0 else json.dumps(node))
    return (
        "<html><head><title>x</title>"
        "<script>var a = {'not': 'ld'};</script>"
        f'<script type="application/ld+json">{payload}</script>'
        '<script type="application/ld+json">{broken json</script>'
        f"</head><body><p>Body {i}</p></body></html>"
    )


def _jsonld_batch(batch: pa.Table) -> pa.Table:
    from ..core.html_meta import extract_jsonld

    ids = batch.column("doc_id").to_pylist()
    types, heads, dates, authors = [], [], [], []
    for i in ids:
        nodes = extract_jsonld(_jsonld_html(i))
        node = next((n for n in nodes if "@type" in n), {})
        types.append(node.get("@type"))
        heads.append(node.get("headline"))
        dates.append(node.get("datePublished"))
        author = node.get("author")
        authors.append(author.get("name")
                       if isinstance(author, dict) else None)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "jd_type": pa.array(types, type=pa.string()),
        "headline": pa.array(heads, type=pa.string()),
        "date_published": pa.array(dates, type=pa.string()),
        "author": pa.array(authors, type=pa.string()),
    })


def q_pages_jsonld(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_jsonld_batch, **_PYA))


SQL_PAGES_JSONLD = """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'Article'
            WHEN 1 THEN 'NewsArticle' ELSE 'BlogPosting' END AS jd_type,
       'Headline ' || doc_id AS headline,
       '2024-' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || '-01'
           AS date_published,
       'Author ' || (doc_id % 10) AS author
FROM documents
"""


def queries_r4b() -> dict:
    return {"docs_c4_filter": q_docs_c4_filter,
            "pages_head_meta": q_pages_head_meta,
            "feed_items": q_feed_items,
            "pages_jsonld": q_pages_jsonld}


def parity_sql_r4b() -> dict[str, str]:
    return {"docs_c4_filter": SQL_DOCS_C4_FILTER,
            "pages_head_meta": SQL_PAGES_HEAD_META,
            "feed_items": SQL_FEED_ITEMS,
            "pages_jsonld": SQL_PAGES_JSONLD}
