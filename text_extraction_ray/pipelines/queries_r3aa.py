"""Round-3 continuation batch AA: retrieval training-data factory —
anchor→document pairs + embedding hard-negative mining.

The composition pipelines a real training-data factory runs on a
crawl, built entirely from stages this engine already has:

- ``retrieval_pairs`` — (query, positive) supervision from the web
  graph: anchors WITH TEXT (core/links.py:extract_anchors, rawtext
  discipline) resolve to absolute targets, and a distributed hash
  join against the crawl's OWN extraction output attaches each
  target's extracted text (sha16 + length; the join ships digests +
  anchor strings, never document text).  Output rows are the classic
  "anchor text is a human-written query for the linked page" pairs
  (DSSM / dense-retrieval lineage).
- ``retrieval_hard_negatives`` — for the 20 lexicographically-first
  distinct anchor queries: embed the query (hashing vectorizer),
  score EVERY extracted doc in one batched matmul scan (the
  ann_batch_queries shape), and return the top-3 most-similar docs
  that are NOT the anchor's true target — textbook in-corpus hard
  negatives.  Deterministic end-to-end; pinned against a
  single-process recompute in pytest.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min

from ..functions.embed import embed_batch, embed_text

from .extraction import default_concurrency as _conc

_PYA = {"batch_format": "pyarrow"}

HN_QUERIES = 20
HN_K = 3


LINKED_N = 240


def _linked_corpus(sf_dir: str) -> str:
    """Deterministic cross-linked page fixture: the base synthetic
    pages plus an injected related-pages nav whose anchors point at
    OTHER PAGES OF THE CORPUS by absolute url (the base crawl's
    anchors all target non-crawled paths, so the anchor→document
    join needs a corpus whose link graph closes over itself).
    Idempotent per sf tag; read back through the standard pages
    reader."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from ..schemas import PAGES
    from ..sources.synth import make_row

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(tempfile.gettempdir(), f"tx_linked_{tag}")
    stamp = os.path.join(out, "_STAMP")
    want = f"v=1 n={LINKED_N}"
    if os.path.exists(stamp) and open(stamp).read() == want:
        return out
    os.makedirs(out, exist_ok=True)
    rows = [make_row(i) for i in range(LINKED_N)]
    # url-keyed: make_row occasionally reuses a url — keep first
    seen, uniq = set(), []
    for r in rows:
        if r["url"] in seen:
            continue
        seen.add(r["url"])
        uniq.append(r)
    rows = uniq
    urls = [r["url"] for r in rows]
    n = len(rows)
    for i, r in enumerate(rows):
        if not isinstance(r["html"], bytes):
            continue
        refs = [(i + 1) % n, (i + 7) % n, (i * 3 + 1) % n]
        nav = "".join(
            f'<li><a href="{urls[j]}">related page {j} '
            f'section {j % 9}</a></li>'
            for j in dict.fromkeys(refs) if j != i)
        blob = f'<ul class="related">{nav}</ul></body>'.encode("utf-8")
        if b"</body>" in r["html"]:
            r["html"] = r["html"].replace(b"</body>", blob, 1)
    cols = {name: [r[name] for r in rows] for name in PAGES.names}
    pq.write_table(pa.Table.from_pydict(cols, schema=PAGES),
                   os.path.join(out, "part-00000.parquet"))
    with open(stamp, "w") as f:
        f.write(want)
    return out


def _extracted(sf_dir: str) -> ray.data.Dataset:
    """(url, extracted_text) of the linked corpus, url-keyed,
    parse_ok HTML pages only, materialized once (at production scale
    this is the already-written OUT parquet)."""
    from ..stages.extract import Extractor
    from .analysis import dedup_keep_latest
    from .extraction import read_pages

    return (dedup_keep_latest(
                read_pages(_linked_corpus(sf_dir))
                .map_batches(Extractor, concurrency=_conc(), **_PYA))
            .filter(expr="parse_ok == True")
            .filter(expr="extracted_text != ''")
            .select_columns(["url", "extracted_text"])
            .materialize())


def anchor_query_rows(b: pa.Table) -> pa.Table:
    """(anchor, dst_url) rows for every non-empty-text anchor."""
    from ..core.encoding import decode_html
    from ..core.links import extract_anchors, resolve_url

    anchors, dsts = [], []
    for url, payload in zip(b.column("url").to_pylist(),
                            b.column("html").to_pylist()):
        if payload is None:
            continue
        text = decode_html(payload)[0] if isinstance(payload, bytes) \
            else str(payload)
        for href, txt in extract_anchors(text):
            if not txt:
                continue
            absu = resolve_url(url, href)
            if absu is not None:
                anchors.append(txt)
                dsts.append(absu)
    return pa.table({"anchor": pa.array(anchors, pa.string()),
                     "dst_url": pa.array(dsts, pa.string())})


def _anchor_rows(sf_dir: str) -> ray.data.Dataset:
    from .extraction import read_pages

    return (read_pages(_linked_corpus(sf_dir), columns=["url", "html"])
            .map_batches(anchor_query_rows, **_PYA))


def q_retrieval_pairs(sf_dir: str) -> ray.data.Dataset:
    return _pairs_from(_extracted(sf_dir), sf_dir)


def _pairs_from(out: ray.data.Dataset, sf_dir: str) -> ray.data.Dataset:
    def digest(b: pa.Table) -> pa.Table:
        texts = b.column("extracted_text").to_pylist()
        return pa.table({
            "dst_url": b.column("url"),
            "text_sha": pa.array(
                [hashlib.sha256(t.encode("utf-8")).hexdigest()[:16]
                 for t in texts], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })

    targets = out.map_batches(digest, **_PYA)
    pairs = _anchor_rows(sf_dir).join(
        targets, join_type="inner", num_partitions=4, on=("dst_url",))
    # one row per (anchor, target): identical anchor strings repeat on
    # many pages (nav); the pair, not the occurrence, is the sample
    return (pairs.groupby(["anchor", "dst_url"])
            .aggregate(Min("text_sha", alias_name="text_sha"),
                       Min("n_chars", alias_name="n_chars")))


def q_retrieval_hard_negatives(sf_dir: str) -> ray.data.Dataset:
    out = _extracted(sf_dir)
    # deterministic query panel: lexicographically-first distinct
    # (anchor, dst_url) pairs — built from the SAME materialized
    # extraction (one extraction pass feeds pairs and scoring)
    # per-anchor min dst_url, first HN_QUERIES anchors — all computed
    # distributed (groupby → sort → limit); only the HN_QUERIES-row
    # panel ever reaches the driver, never the full pair table
    qdf = (_pairs_from(out, sf_dir)
           .groupby("anchor")
           .aggregate(Min("dst_url", alias_name="dst_url"))
           .sort("anchor")
           .limit(HN_QUERIES)
           .to_pandas())
    qm = np.stack([embed_text(a) for a in qdf.anchor])
    q_ref = ray.put((list(qdf.anchor), list(qdf.dst_url), qm))

    def score(b: pa.Table) -> pa.Table:
        anchors, pos_urls, qm = ray.get(q_ref)
        eb = embed_batch(b, "extracted_text")
        col = eb.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = col.flatten().to_numpy(zero_copy_only=False).reshape(
            len(col), -1)
        urls = b.column("url").to_pylist()
        s = np.round(mat @ qm.T, 6)
        out_q, out_u, out_c = [], [], []
        k = min(HN_K + 1, s.shape[0])   # +1: the positive may rank
        for j in range(s.shape[1]):
            col_s = s[:, j]
            idx = np.lexsort((urls, -col_s))[:k]
            out_q.extend([j] * idx.size)
            out_u.extend([urls[i] for i in idx])
            out_c.append(col_s[idx])
        return pa.table({
            "qi": pa.array(np.array(out_q, dtype=np.int64)),
            "url": pa.array(out_u, pa.string()),
            "cos": pa.array(np.concatenate(out_c) if out_c
                            else np.array([], dtype=np.float64)),
        })

    pruned = out.map_batches(score, **_PYA)

    def fold(g: pa.Table) -> pa.Table:
        anchors, pos_urls, _qm = ray.get(q_ref)
        qi = int(g.column("qi")[0].as_py())
        urls = g.column("url").to_pylist()
        cos = g.column("cos").to_numpy(zero_copy_only=False)
        idx = np.lexsort((urls, -cos))
        neg, rank = [], []
        for i in idx:
            if urls[i] == pos_urls[qi]:
                continue
            neg.append(i)
            if len(neg) == HN_K:
                break
        n = len(neg)
        return pa.table({
            "anchor": pa.array([anchors[qi]] * n, pa.string()),
            "pos_url": pa.array([pos_urls[qi]] * n, pa.string()),
            "neg_url": pa.array([urls[i] for i in neg], pa.string()),
            "neg_rank": pa.array(np.arange(n, dtype=np.int64)),
            "cos_neg": pa.array(cos[neg]),
        })

    return pruned.groupby("qi").map_groups(fold, **_PYA)


def queries_r3aa() -> dict:
    return {
        "retrieval_pairs": q_retrieval_pairs,
        "retrieval_hard_negatives": q_retrieval_hard_negatives,
    }
