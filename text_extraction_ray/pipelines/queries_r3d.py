"""Round-3 continuation batch D: corpus-index / sampling operators.

Three training-data-pipeline operators: an inverted-index build with
df counts and CAPPED posting lists (the search-engine core), weighted
sampling without replacement (Efraimidis-Spirakis exponential race with
content-derived randomness — deterministic, parallelism-invariant), and
PMI token co-occurrence over a bounded top-df vocabulary (the
word2vec-style corpus statistic).

Registered rows-only (driver 50-row window frozen); DuckDB parity
twins run in tests/test_queries_r3d.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

_PYA = {"batch_format": "pyarrow"}


def _read(sf_dir: str, table: str, columns: list[str],
          row_filter=None) -> ray.data.Dataset:
    from .queries import read_table

    return read_table(sf_dir, table, columns, row_filter=row_filter)


def _round_half_up(x: np.ndarray, digits: int) -> np.ndarray:
    q = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * q + 0.5) / q


def _doc_tok_pairs(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Per-batch distinct (doc_id, token) pairs, whitespace-split with
    empties dropped — the same convention as the oracled token queries
    (string_split on ' ' in the twins)."""
    ids = b.column("doc_id").to_numpy(zero_copy_only=False)
    docs, toks = [], []
    for did, text in zip(ids, b.column("text").to_pylist()):
        seen = set((text or "").split(" "))
        seen.discard("")
        docs.extend([did] * len(seen))
        toks.extend(seen)
    return np.asarray(docs, dtype=np.int64), np.asarray(toks, dtype=object)


# --- T5: inverted index with capped postings -----------------------------------

_POSTINGS_CAP = 5


def q_inverted_index(sf_dir: str) -> ray.data.Dataset:
    """token -> (df, first-5 posting doc_ids as CSV).  Phase 1 emits
    per-batch DISTINCT (token, doc) pairs with a map-side min-k
    combiner on the postings side (min-k composes, like lang_doc_csv),
    plus a per-batch df partial — so the shuffle carries at most
    (cap + 1) rows per token per batch, never the full posting lists.
    Phase 2 is a 64-bucket token groupby with ONE vectorized
    lexsort/rank per bucket (no per-token Python calls; the per-key
    map_groups trap).  Posting lists stay CAPPED by construction — the
    unbounded-vocabulary lesson from doc_top_terms applied from the
    start."""
    def partial(b: pa.Table) -> pa.Table:
        docs, toks = _doc_tok_pairs(b)
        order = np.lexsort((docs, toks))
        t, d = toks[order], docs[order]
        first = np.r_[0, np.flatnonzero(t[1:] != t[:-1]) + 1] \
            if len(t) else np.array([], dtype=np.int64)
        starts = np.repeat(first, np.diff(np.r_[first, len(t)])) \
            if len(t) else np.array([], dtype=np.int64)
        rank = np.arange(len(t)) - starts
        keep = rank < _POSTINGS_CAP
        df_part = np.diff(np.r_[first, len(t)]) if len(t) else []
        return pa.table({
            "tok": pa.array(
                np.r_[t[keep], t[first]].tolist(), type=pa.string()),
            "doc_id": pa.array(
                np.r_[d[keep], np.full(len(first), -1)], type=pa.int64()),
            "df_part": pa.array(
                np.r_[np.zeros(int(keep.sum()), dtype=np.int64),
                      np.asarray(df_part, dtype=np.int64)],
                type=pa.int64()),
        })

    def add_bucket(b: pa.Table) -> pa.Table:
        toks = b.column("tok")
        h = np.asarray(
            [int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % 64
             for s in toks.to_pylist()], dtype=np.int64)
        return b.append_column("bucket", pa.array(h))

    def finish(g: pa.Table) -> pa.Table:
        t = np.asarray(g.column("tok").to_pylist(), dtype=object)
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        dfp = g.column("df_part").to_numpy(zero_copy_only=False)
        out_t, out_df, out_csv = [], [], []
        order = np.lexsort((d, t))
        t, d, dfp = t[order], d[order], dfp[order]
        first = np.r_[0, np.flatnonzero(t[1:] != t[:-1]) + 1] \
            if len(t) else np.array([], dtype=np.int64)
        bounds = np.r_[first, len(t)]
        for i, s in enumerate(first):
            e = bounds[i + 1]
            docs = d[s:e]
            docs = np.unique(docs[docs >= 0])[:_POSTINGS_CAP]
            out_t.append(t[s])
            out_df.append(int(dfp[s:e].sum()))
            out_csv.append(",".join(str(x) for x in docs))
        return pa.table({
            "tok": pa.array(out_t, type=pa.string()),
            "df": pa.array(out_df, type=pa.int64()),
            "postings": pa.array(out_csv, type=pa.string()),
        })

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(partial, **_PYA)
            .map_batches(add_bucket, **_PYA)
            .groupby("bucket")
            .map_groups(lambda g: finish(g.drop_columns(["bucket"])),
                        batch_format="pyarrow"))


SQL_INVERTED_INDEX = f"""
WITH raw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
toks AS (
  SELECT DISTINCT doc_id, tok FROM raw WHERE tok != ''),
t2 AS (
  SELECT tok, doc_id,
         ROW_NUMBER() OVER (PARTITION BY tok ORDER BY doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY tok) AS df
  FROM toks)
SELECT tok, CAST(ANY_VALUE(df) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         AS postings
FROM t2 WHERE rn <= {_POSTINGS_CAP} GROUP BY tok
"""


# --- K7: weighted sampling without replacement ---------------------------------

_SAMPLE_K = 50


def _race_keys(doc_ids: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Efraimidis-Spirakis keys u^(1/w): u is derived from md5 of the
    doc id (content-keyed — deterministic, independent of parallelism
    and row order, same trick as the seeded sample K3), w is the
    sampling weight.  Top-k by key IS a weighted sample without
    replacement."""
    u = np.array(
        [(int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 0.5)
         / 4294967296.0 for i in doc_ids])
    return u ** (1.0 / weights)


def q_weighted_sample(sf_dir: str) -> ray.data.Dataset:
    """Length-weighted corpus subsample (w = n_chars), k = 50: each
    batch computes race keys vectorized, the distributed top-k keeps
    <= k rows per block — no shuffle of the corpus, no RNG state
    anywhere (rerunning on any partitioning returns the identical
    sample)."""
    from ..functions.topk import topk

    def keys(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        w = b.column("n_chars").to_numpy(zero_copy_only=False).astype(
            np.float64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang": b.column("lang"),
            "n_chars": b.column("n_chars"),
            "race_key": pa.array(_race_keys(ids, w)),
        })

    ds = (_read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
          .map_batches(keys, **_PYA))
    best = topk(ds, ["race_key", "doc_id"], _SAMPLE_K,
                descending=[True, False])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang": b.column("lang"),
            "n_chars": b.column("n_chars"),
            "race_key": pa.array(_round_half_up(
                b.column("race_key").to_numpy(zero_copy_only=False), 6)),
        })

    return best.map_batches(finish, **_PYA)


SQL_WEIGHTED_SAMPLE = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         POWER((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  ::BIGINT + 0.5) / 4294967296.0,
               1.0 / n_chars) AS race_key
  FROM documents)
SELECT doc_id, lang, n_chars, ROUND(race_key, 6) AS race_key
FROM keyed
ORDER BY POWER((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  ::BIGINT + 0.5) / 4294967296.0, 1.0 / n_chars) DESC,
         doc_id
LIMIT {_SAMPLE_K}
"""


# --- T6: PMI token co-occurrence over a bounded vocabulary ---------------------

_PMI_VOCAB = 32
_PMI_MIN_PAIRS = 5


def q_pmi_pairs(sf_dir: str) -> ray.data.Dataset:
    """Pointwise mutual information for co-occurring top-vocabulary
    token pairs — the word2vec-era corpus statistic.  The vocabulary is
    BOUNDED up front (top-32 by document frequency, df-desc/token-asc
    deterministic ties) via a distributed df groupby + driver top-k of
    a vocab-sized table; it broadcasts once.  Each batch then counts
    pair hits with a combined integer key + bincount (vocab^2 cells max
    per batch) and ships only non-zero partial cells; PMI finalizes
    from the tiny (<= vocab^2) aggregated table.  Nothing unbounded
    ever reaches the driver or the shuffle."""
    df_rows = (_read(sf_dir, "documents", ["doc_id", "text"])
               .map_batches(lambda b: _pairs_table(b), **_PYA)
               .groupby("tok")
               .aggregate(Count(alias_name="df"))
               .take_all())
    df_rows.sort(key=lambda r: (-r["df"], r["tok"]))
    vocab = [r["tok"] for r in df_rows[:_PMI_VOCAB]]
    dfmap = {r["tok"]: r["df"] for r in df_rows[:_PMI_VOCAB]}
    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()
    vocab_ref = ray.put(vocab)

    def pair_partial(b: pa.Table) -> pa.Table:
        voc = ray.get(vocab_ref)
        vidx = {t: i for i, t in enumerate(voc)}
        k = len(voc)
        acc = np.zeros(k * k, dtype=np.int64)
        for text in b.column("text").to_pylist():
            present = sorted({vidx[t] for t in (text or "").split(" ")
                              if t in vidx})
            for ai in range(len(present)):
                a = present[ai]
                for bi_ in range(ai + 1, len(present)):
                    acc[a * k + present[bi_]] += 1
        nz = np.flatnonzero(acc)
        return pa.table({
            "a": pa.array(nz // k, type=pa.int64()),
            "b": pa.array(nz % k, type=pa.int64()),
            "n_part": pa.array(acc[nz], type=pa.int64()),
        })

    agg = (_read(sf_dir, "documents", ["doc_id", "text"])
           .map_batches(pair_partial, **_PYA)
           .groupby(["a", "b"])
           .aggregate(Sum("n_part", alias_name="n_ab")))

    def finalize(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy(zero_copy_only=False)
        bb = b.column("b").to_numpy(zero_copy_only=False)
        n_ab = b.column("n_ab").to_numpy(zero_copy_only=False)
        m = n_ab >= _PMI_MIN_PAIRS
        a, bb, n_ab = a[m], bb[m], n_ab[m]
        df_a = np.array([dfmap[vocab[i]] for i in a], dtype=np.float64)
        df_b = np.array([dfmap[vocab[i]] for i in bb], dtype=np.float64)
        pmi = np.log(n_ab.astype(np.float64) * n_docs / (df_a * df_b))
        # pair identity is a SET; the twin labels pairs lexicographically
        # (x.tok < y.tok), while the index key orders by df rank — swap
        # labels where needed so tok_a < tok_b by string.
        ta = [vocab[i] for i in a]
        tb = [vocab[i] for i in bb]
        ta, tb = (list(x) for x in zip(*[
            (p, q) if p < q else (q, p) for p, q in zip(ta, tb)])) \
            if len(ta) else ([], [])
        return pa.table({
            "tok_a": pa.array(ta, type=pa.string()),
            "tok_b": pa.array(tb, type=pa.string()),
            "n_ab": pa.array(n_ab, type=pa.int64()),
            "pmi": pa.array(_round_half_up(pmi, 6)),
        })

    return agg.map_batches(finalize, **_PYA)


def _pairs_table(b: pa.Table) -> pa.Table:
    docs, toks = _doc_tok_pairs(b)
    return pa.table({
        "doc_id": pa.array(docs, type=pa.int64()),
        "tok": pa.array(toks.tolist(), type=pa.string()),
    })


SQL_PMI_PAIRS = f"""
WITH raw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
toks AS (
  SELECT DISTINCT doc_id, tok FROM raw WHERE tok != ''),
vocab AS (
  SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok
  ORDER BY df DESC, tok LIMIT {_PMI_VOCAB}),
vt AS (
  SELECT t.doc_id, t.tok FROM toks t JOIN vocab v USING (tok)),
pairs AS (
  SELECT x.tok AS tok_a, y.tok AS tok_b, COUNT(*) AS n_ab
  FROM vt x JOIN vt y ON x.doc_id = y.doc_id AND x.tok < y.tok
  GROUP BY x.tok, y.tok),
nd AS (SELECT COUNT(*) AS n FROM documents)
SELECT tok_a, tok_b, CAST(n_ab AS BIGINT) AS n_ab,
       ROUND(ln(CAST(n_ab AS DOUBLE) * nd.n / (va.df * vb.df)), 6)
         AS pmi
FROM pairs
JOIN vocab va ON va.tok = tok_a
JOIN vocab vb ON vb.tok = tok_b
CROSS JOIN nd
WHERE n_ab >= {_PMI_MIN_PAIRS}
"""


def queries_r3d() -> dict:
    return {
        "inverted_index": q_inverted_index,
        "weighted_sample": q_weighted_sample,
        "pmi_pairs": q_pmi_pairs,
    }


def parity_sql_r3d() -> dict[str, str]:
    """DuckDB twins for the pytest parity gate (NOT driver oracles)."""
    return {
        "inverted_index": SQL_INVERTED_INDEX,
        "weighted_sample": SQL_WEIGHTED_SAMPLE,
        "pmi_pairs": SQL_PMI_PAIRS,
    }
