"""Round-3 continuation batch P: training-corpus curation operators.

Three operators a 100 TB LLM-data pipeline needs between "extracted
text" and "training shards", each with an exact DuckDB twin pinned in
tests/test_queries_r3p.py (registered rows-only — the driver's 50-row
window is already fully allocated to the 48 oracled queries +
extract_pages + pdf_tables; see queries.py:queries() ordering note):

- ``docs_dup_ngrams`` — per-document duplicate-5-gram fraction
  (the RefinedWeb / Gopher "fraction of characters in duplicated
  n-grams" quality signal, token-5-gram variant).  Two bounded
  shuffles: (doc, gram, occ) rows — grams already deduped per doc —
  keyed by gram for the document-frequency count, then a native hash
  join back and a doc-keyed sum.  At crawl scale the gram strings
  would shuffle as 16-byte content hashes instead (collision odds
  ~n²/2¹²⁸); the string form here keeps the SQL twin exact.
- ``docs_lang_resample`` — deterministic temperature resampling of
  the language mix (mT5/UNIMAX-style, α=0.5): language l is kept at
  rate (c_min/c_l)^0.5 so the kept histogram flattens toward
  c_l^α while the smallest language keeps everything.  The keep rule
  is CONTENT-keyed (first 8 hex chars of md5(doc_id) compared to a
  precomputed per-language hex threshold), so it is
  parallelism-invariant and bit-identical to the SQL twin: rate uses
  only one correctly-rounded float chain (sqrt of an exact integer
  ratio), the threshold is floor(rate·2³²) rendered as zero-padded
  hex, and the comparison is lexicographic on lowercase hex = numeric.
  Only a tiny per-language count table crosses the cluster.
- ``docs_pack_blocks`` — sequence packing: docs in doc_id order are
  concatenated and chunked into 2048-token blocks;
  block_id = floor(exclusive-prefix-sum(n_tokens)/2048) (GPT-style
  concat-and-chunk).  Distributed prefix sum: pass 1 aggregates
  per-bucket token sums (bucket = doc_id // 4096 → the carry table is
  |docs|/4096 rows), the driver computes exclusive carries over that
  tiny sorted table, pass 2 map_groups each bucket with carry-in +
  local exclusive cumsum.  Raw rows shuffle once, as 16-byte
  (doc_id, n_tokens) pairs; at 10¹² docs the carry table itself gets
  the same two-level treatment (bucket the buckets).

Token counts use text.split(' ') semantics (NOT .split()) to match
SQL string_split exactly on runs of spaces / empty strings.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

_PYA = {"batch_format": "pyarrow"}

PACK_CAP = 2048          # tokens per training block
PACK_BUCKET = 4096       # docs per prefix-sum bucket
RESAMPLE_ALPHA = 0.5


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def _round_half_up(x: np.ndarray, digits: int) -> np.ndarray:
    q = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * q + 0.5) / q


# --- duplicate n-gram fraction ---------------------------------------------

def _doc_gram_rows(b: pa.Table) -> pa.Table:
    """Per doc: unique 5-grams with within-doc occurrence counts.
    Docs with <5 tokens emit nothing (no 5-grams — matches the SQL
    twin's empty generate_series)."""
    ids = b.column("doc_id").to_numpy(zero_copy_only=False)
    texts = b.column("text").to_pylist()
    out_id, out_g, out_occ = [], [], []
    for did, txt in zip(ids, texts):
        toks = np.array(txt.split(" "))
        n = toks.size
        if n < 5:
            continue
        g = toks[: n - 4]
        for k in range(1, 5):
            g = np.char.add(np.char.add(g, " "), toks[k: n - 4 + k])
        uniq, cnt = np.unique(g, return_counts=True)
        out_id.append(np.full(uniq.size, did, dtype=np.int64))
        out_g.append(uniq)
        out_occ.append(cnt.astype(np.int64))
    if not out_id:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "g": pa.array([], pa.string()),
                         "occ": pa.array([], pa.int64())})
    return pa.table({"doc_id": pa.array(np.concatenate(out_id)),
                     "g": pa.array(np.concatenate(out_g)),
                     "occ": pa.array(np.concatenate(out_occ))})


def q_docs_dup_ngrams(sf_dir: str) -> ray.data.Dataset:
    """Fraction of each doc's 5-gram occurrences whose 5-gram appears
    in ≥2 distinct documents corpus-wide."""
    dg = (_read(sf_dir, "documents", ["doc_id", "text"])
          .map_batches(_doc_gram_rows, **_PYA))
    # document frequency per gram: dg has one row per (doc, gram), so
    # Count == number of distinct docs containing the gram.
    gd = dg.groupby("g").aggregate(Count(alias_name="n_docs"))
    joined = dg.join(gd, join_type="inner", num_partitions=4,
                     on=("g",))

    def mark(t: pa.Table) -> pa.Table:
        occ = t.column("occ").to_numpy(zero_copy_only=False)
        nd = t.column("n_docs").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "occ": t.column("occ"),
            "dup_occ": pa.array(np.where(nd >= 2, occ, 0)),
        })

    per_doc = (joined.map_batches(mark, **_PYA)
               .groupby("doc_id")
               .aggregate(Sum("occ", alias_name="n_grams"),
                          Sum("dup_occ", alias_name="dup_occ")))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_grams").to_numpy(zero_copy_only=False).astype(
            np.float64)
        d = t.column("dup_occ").to_numpy(zero_copy_only=False).astype(
            np.float64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_grams": pc.cast(t.column("n_grams"), pa.int64()),
            "dup_frac": pa.array(_round_half_up(d / n, 6)),
        })

    return per_doc.map_batches(finish, **_PYA)


SQL_DOCS_DUP_NGRAMS = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
grams AS (
  SELECT doc_id, array_to_string(ts[i:i+4], ' ') AS g
  FROM toks, UNNEST(generate_series(1, len(ts)-4)) AS t(i)),
dg AS (
  SELECT doc_id, g, COUNT(*) AS occ FROM grams GROUP BY 1, 2),
gd AS (
  SELECT g, COUNT(*) AS n_docs FROM dg GROUP BY g)
SELECT dg.doc_id,
       CAST(SUM(dg.occ) AS BIGINT) AS n_grams,
       ROUND(SUM(CASE WHEN gd.n_docs >= 2 THEN dg.occ ELSE 0 END) * 1.0
             / SUM(dg.occ), 6) AS dup_frac
FROM dg JOIN gd USING (g)
GROUP BY dg.doc_id
"""


# --- temperature language resampling ---------------------------------------

def lang_keep_thresholds(counts: dict[str, int],
                         alpha: float = RESAMPLE_ALPHA) -> dict[str, str]:
    """Per-language 8-hex-char keep threshold; None ⇒ keep all.
    rate_l = (c_min/c_l)^alpha — one correctly-rounded float chain so
    DuckDB's sqrt(cmin/n) lands on the identical bits."""
    cmin = min(counts.values())
    out = {}
    for lang, n in counts.items():
        if n == cmin:
            out[lang] = None
        else:
            rate = math.sqrt(cmin / n) if alpha == 0.5 else (
                (cmin / n) ** alpha)
            out[lang] = format(int(math.floor(rate * 4294967296.0)), "08x")
    return out


def q_docs_lang_resample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic α=0.5 temperature downsampling of the language
    mix: keeps doc iff md5(doc_id)[:8] < per-lang threshold."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    counts = {r["lang"]: int(r["n"])
              for r in docs.groupby("lang").aggregate(
                  Count(alias_name="n")).take_all()}
    thr = lang_keep_thresholds(counts)

    def keep(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        langs = b.column("lang").to_pylist()
        mask = np.empty(len(ids), dtype=bool)
        for i, (did, lang) in enumerate(zip(ids, langs)):
            t = thr[lang]
            mask[i] = (t is None or
                       hashlib.md5(str(did).encode()).hexdigest()[:8] < t)
        return b.filter(pa.array(mask))

    return docs.map_batches(keep, **_PYA)


SQL_DOCS_LANG_RESAMPLE = """
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
m AS (SELECT MIN(n) AS cmin FROM c),
r AS (SELECT lang,
        CASE WHEN n = cmin THEN NULL
             ELSE lpad(lower(hex(CAST(FLOOR(
                    sqrt(cmin / CAST(n AS DOUBLE)) * 4294967296.0)
                  AS BIGINT))), 8, '0')
        END AS thr
      FROM c, m)
SELECT d.doc_id, d.lang
FROM documents d JOIN r USING (lang)
WHERE r.thr IS NULL
   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < r.thr
"""


# --- sequence packing -------------------------------------------------------

def q_docs_pack_blocks(sf_dir: str) -> ray.data.Dataset:
    """Concat-and-chunk sequence packing: block_id =
    floor(exclusive-prefix-sum(n_tokens in doc_id order) / 2048)."""
    def tok_counts(b: pa.Table) -> pa.Table:
        # len(split(' ')) == count(' ')+1, incl. empty-string tokens —
        # exact string_split parity without materializing token lists.
        n = pc.add(pc.count_substring(b.column("text"), " "), 1)
        did = b.column("doc_id")
        return pa.table({
            "doc_id": did,
            "n_tokens": pc.cast(n, pa.int64()),
            "bucket": pc.cast(
                pc.floor(pc.divide(pc.cast(did, pa.float64()),
                                   float(PACK_BUCKET))), pa.int64()),
        })

    counts = (_read(sf_dir, "documents", ["doc_id", "text"])
              .map_batches(tok_counts, **_PYA))
    bucket_sums = (counts.groupby("bucket")
                   .aggregate(Sum("n_tokens", alias_name="s"))
                   .take_all())
    bucket_sums.sort(key=lambda r: r["bucket"])
    carry, acc = {}, 0
    for r in bucket_sums:
        carry[int(r["bucket"])] = acc
        acc += int(r["s"])

    def pack(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g.column("doc_id"))
        g = g.take(order)
        n = g.column("n_tokens").to_numpy(zero_copy_only=False)
        start = carry[int(g.column("bucket")[0].as_py())]
        prev = start + np.concatenate(([0], np.cumsum(n[:-1])))
        return pa.table({
            "doc_id": g.column("doc_id"),
            "n_tokens": g.column("n_tokens"),
            "block_id": pa.array(prev // PACK_CAP),
        })

    return counts.groupby("bucket").map_groups(pack, **_PYA)


SQL_DOCS_PACK_BLOCKS = """
WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, n_tokens,
        COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM t)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(prev // 2048 AS BIGINT) AS block_id
FROM c
"""


def queries_r3p() -> dict:
    return {
        "docs_dup_ngrams": q_docs_dup_ngrams,
        "docs_lang_resample": q_docs_lang_resample,
        "docs_pack_blocks": q_docs_pack_blocks,
    }


def parity_sql_r3p() -> dict:
    return {
        "docs_dup_ngrams": SQL_DOCS_DUP_NGRAMS,
        "docs_lang_resample": SQL_DOCS_LANG_RESAMPLE,
        "docs_pack_blocks": SQL_DOCS_PACK_BLOCKS,
    }
