"""Round-3 continuation batch P: training-corpus curation operators.

Three operators a 100 TB LLM-data pipeline needs between "extracted
text" and "training shards", each with an exact DuckDB twin pinned in
tests/test_queries_r3p.py (registered rows-only — the driver's 50-row
window is already fully allocated to the 48 oracled queries +
extract_pages + pdf_tables; see queries.py:queries() ordering note):

- ``docs_dup_ngrams`` — per-document duplicate-5-gram fraction
  (the RefinedWeb / Gopher "fraction of characters in duplicated
  n-grams" quality signal, token-5-gram variant).  Grams shuffle as
  64-bit polynomial hashes over per-batch-cached token FNV hashes
  (never as strings), map-side combined into per-batch document
  frequency partials — ONE int64-pair shuffle — then the dup set
  (DF ≥ 2) is broadcast and probed in a second scan when it fits
  under DUP_BROADCAST_CAP, else a distributed hash join takes over
  (adaptive bounded-broadcast, same shape as doc_top_terms).  The
  DuckDB twin compares gram STRINGS; parity holds because 64-bit
  collisions are ~n²/2⁶⁵ and deterministic.
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
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..functions.dedup import _fnv1a64_many

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

# polynomial gram-hash multipliers: A^4..A^0 (mod 2^64) for a random odd A
_GRAM_A = np.uint64(0x9E3779B97F4A7C15)
_GRAM_POW = np.array([0x9E3779B97F4A7C15] * 5, dtype=np.uint64)
for _i in range(1, 5):
    _GRAM_POW[: 5 - _i] *= _GRAM_A
_GRAM_POW[4] = np.uint64(1)

DUP_BROADCAST_CAP = 2_000_000  # dup-gram hashes broadcast below this


def _doc_gram_hashes(texts: list[str]):
    """Yield (row_index, uint64 gram-hash array) per doc with ≥5 tokens.
    Tokens are FNV-hashed ONCE per unique token in the batch (Zipf makes
    this ≪ total positions), then 5-gram hashes are a vectorized
    polynomial combine — gram equality ⇔ token-sequence equality up to
    64-bit collisions (~n²/2⁶⁵, negligible and deterministic)."""
    import pandas as pd

    toks_per_doc = [t.split(" ") for t in texts]
    flat: list[str] = []
    for toks in toks_per_doc:
        flat.extend(toks)
    if not flat:
        return
    # hash-based factorize beats sort-based np.unique on object strings
    inv, uniq = pd.factorize(np.array(flat, dtype=object), sort=False)
    th = _fnv1a64_many([t.encode("utf-8") for t in uniq])
    pos = 0
    for i, toks in enumerate(toks_per_doc):
        n = len(toks)
        hv = th[inv[pos: pos + n]]
        pos += n
        if n < 5:
            continue
        g = np.zeros(n - 4, dtype=np.uint64)
        for k in range(5):
            g += hv[k: n - 4 + k] * _GRAM_POW[k]
        # finalize (xorshift) so low bits mix for the hash partitioner
        g ^= g >> np.uint64(33)
        g *= np.uint64(0xFF51AFD7ED558CCD)
        g ^= g >> np.uint64(33)
        # int64 view: Ray's hash aggregate keeps int64 keys native
        # (uint64 falls back to pickled-object columns)
        yield i, g.view(np.int64)


def _gram_df_rows(b: pa.Table) -> pa.Table:
    """Map-side combined document-frequency partials: (gh, cnt) where
    cnt = #docs IN THIS BATCH containing gh (docs never span batches,
    so groupby-sum of cnt == corpus document frequency)."""
    texts = b.column("text").to_pylist()
    per_doc = [np.unique(g) for _, g in _doc_gram_hashes(texts)]
    if not per_doc:
        return pa.table({"gh": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    gh, cnt = np.unique(np.concatenate(per_doc), return_counts=True)
    return pa.table({"gh": pa.array(gh), "cnt": pa.array(cnt.astype(np.int64))})


def q_docs_dup_ngrams(sf_dir: str) -> ray.data.Dataset:
    """Fraction of each doc's 5-gram occurrences whose 5-gram appears in
    ≥2 distinct documents corpus-wide (RefinedWeb/Gopher signal).

    Plan: ONE int64-pair shuffle (map-side combined DF partials) → dup
    set (DF ≥ 2); if the dup set is ≤ DUP_BROADCAST_CAP it is broadcast
    (ray.put, sorted, searchsorted probe — the common case: the dup set
    is the duplicated MINORITY of grams), else the probe runs as a
    distributed hash join of per-doc gram rows against the dup table —
    the same adaptive bounded-broadcast shape as doc_top_terms.  No
    doc-keyed shuffle in the broadcast path: the per-doc result is
    computed inside the second scan."""
    import logging

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    # materialize: the dup table is consumed twice (count + probe side);
    # it is post-aggregation AND post-filter — the duplicated minority
    # of the gram space, already its compact (gh, n_docs) form — so this
    # is a bounded, spillable hold, not a full-input materialization.
    dfreq = (docs.map_batches(_gram_df_rows, **_PYA)
             .groupby("gh").aggregate(Sum("cnt", alias_name="n_docs"))
             .filter(expr="n_docs >= 2")
             .materialize())
    n_dup = dfreq.count()
    if n_dup <= DUP_BROADCAST_CAP:
        dup = np.sort(np.asarray(
            dfreq.to_pandas()["gh"].to_numpy(), dtype=np.int64))
        dup_ref = ray.put(dup)

        def score(b: pa.Table) -> pa.Table:
            dset = ray.get(dup_ref)
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            out_id, out_n, out_f = [], [], []
            for i, g in _doc_gram_hashes(b.column("text").to_pylist()):
                idx = np.searchsorted(dset, g)
                idx[idx == dset.size] = 0
                d = int(np.count_nonzero(dset[idx] == g)) if dset.size \
                    else 0
                out_id.append(ids[i])
                out_n.append(g.size)
                out_f.append(d / g.size)
            return pa.table({
                "doc_id": pa.array(np.array(out_id, dtype=np.int64)),
                "n_grams": pa.array(np.array(out_n, dtype=np.int64)),
                "dup_frac": pa.array(_round_half_up(
                    np.array(out_f, dtype=np.float64), 6)),
            })

        return docs.map_batches(score, **_PYA)

    logging.getLogger(__name__).warning(
        "dup-gram set %d > %d: distributed-join path", n_dup,
        DUP_BROADCAST_CAP)

    def gram_rows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_g, out_occ, tot_id, tot_n = [], [], [], [], []
        for i, g in _doc_gram_hashes(b.column("text").to_pylist()):
            u, c = np.unique(g, return_counts=True)
            out_id.append(np.full(u.size, ids[i], dtype=np.int64))
            out_g.append(u)
            out_occ.append(c.astype(np.int64))
            tot_id.append(ids[i])
            tot_n.append(g.size)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "gh": pa.array([], pa.int64()),
                          "occ": pa.array([], pa.int64())})
        if not out_id:
            return empty
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id)),
            "gh": pa.array(np.concatenate(out_g)),
            "occ": pa.array(np.concatenate(out_occ))})

    def totals(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        rows = [(ids[i], g.size)
                for i, g in _doc_gram_hashes(b.column("text").to_pylist())]
        return pa.table({
            "doc_id": pa.array(np.array([r[0] for r in rows],
                                        dtype=np.int64)),
            "n_grams": pa.array(np.array([r[1] for r in rows],
                                         dtype=np.int64))})

    dup_occ = (docs.map_batches(gram_rows, **_PYA)
               .join(dfreq, join_type="inner", num_partitions=8,
                     on=("gh",))
               .groupby("doc_id")
               .aggregate(Sum("occ", alias_name="dup_occ")))
    both = (docs.map_batches(totals, **_PYA)
            .join(dup_occ, join_type="left_outer", num_partitions=8,
                  on=("doc_id",)))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_grams").to_numpy(zero_copy_only=False).astype(
            np.float64)
        d = np.nan_to_num(t.column("dup_occ").to_numpy(
            zero_copy_only=False).astype(np.float64))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_grams": pc.cast(t.column("n_grams"), pa.int64()),
            "dup_frac": pa.array(_round_half_up(d / n, 6)),
        })

    return both.map_batches(finish, **_PYA)


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
