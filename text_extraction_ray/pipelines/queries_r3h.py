"""Round-3 continuation batch H: ML-corpus plumbing — deterministic
splits, n-gram LM scoring, rolling distinct-user windows.

Three operators: content-keyed train/val/test assignment (md5 buckets —
reshard-invariant, no RNG state), corpus-trained bigram language-model
log-probability per document (the KenLM-style quality-scoring shape:
count tables stay DISTRIBUTED and attach by hash join, never a
driver-side vocabulary), and rolling 7-day distinct active users (the
window-distinct that cannot be derived from daily distincts — presence
expansion + re-distinct).

Registered rows-only (driver 50-row window frozen); DuckDB parity twins
run in tests/test_queries_r3h.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

_PYA = {"batch_format": "pyarrow"}


def _read(sf_dir: str, table: str, columns: list[str],
          row_filter=None) -> ray.data.Dataset:
    from .queries import read_table

    return read_table(sf_dir, table, columns, row_filter=row_filter)


def _round_half_up(x: np.ndarray, digits: int) -> np.ndarray:
    q = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * q + 0.5) / q


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    return col.combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False)


# --- K8: deterministic train/val/test split ------------------------------------

_SPLIT_EDGES = (98, 99)  # <98 train, <99 val, else test


def q_docs_split(sf_dir: str) -> ray.data.Dataset:
    """98/1/1 split keyed on md5(doc_id) — the property that matters is
    DETERMINISM UNDER RESHARDING: the same document lands in the same
    split on any partitioning, any cluster size, any rerun (same
    content-keyed idiom as the weighted/seeded samples; Python hash()
    is banned across processes).  Row-parallel, shuffle-free."""
    def assign(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        buckets = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
             for i in ids.tolist()], dtype=np.int64)
        split = np.where(
            buckets < _SPLIT_EDGES[0], "train",
            np.where(buckets < _SPLIT_EDGES[1], "val", "test"))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "bucket": pa.array(buckets),
            "split": pa.array(split.tolist(), type=pa.string()),
        })

    return _read(sf_dir, "documents", ["doc_id"]
                 ).map_batches(assign, **_PYA)


SQL_DOCS_SPLIT = f"""
WITH k AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 100 AS bucket
  FROM documents)
SELECT doc_id, bucket,
       CASE WHEN bucket < {_SPLIT_EDGES[0]} THEN 'train'
            WHEN bucket < {_SPLIT_EDGES[1]} THEN 'val'
            ELSE 'test' END AS split
FROM k
"""


# --- T3: bigram language-model scoring -----------------------------------------

def q_docs_lm_score(sf_dir: str) -> ray.data.Dataset:
    """Self-trained bigram LM quality score: mean log2 P(tok | prev)
    per document, with P(b|a) = c(a,b) / c(a,·) counted over the whole
    corpus.  The crawl-scale plan: per-doc bigram rows pre-aggregate to
    (doc, a, b, n) inside the batch, the model is TWO distributed count
    tables ((a,b) and (a)) that attach by native hash join — the
    vocabulary never collects to the driver (the doc_top_terms lesson
    applied up front).  Both count tables pass through repartition()
    to absorb the schema-less empty blocks a small-domain groupby
    emits, which acero's join rejects."""
    def doc_bigrams(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), pattern=" ")
        toks = toks.combine_chunks()
        flat = toks.flatten()
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        enc = flat.dictionary_encode()
        ids = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        doc_ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        same = parent[1:] == parent[:-1] if len(parent) else \
            np.zeros(0, dtype=bool)
        d = parent[:-1][same].astype(np.int64)
        a_id, b_id = ids[:-1][same], ids[1:][same]
        V = len(vocab)
        # (doc, a, b) folds into one int64 key; fits while
        # batch_rows × V² < 2^63 (V is the PER-BATCH vocab)
        assert b.num_rows * V * V < (1 << 62)
        key = (d * V + a_id) * V + b_id
        uniq, cnt = np.unique(key, return_counts=True)
        di = uniq // (V * V)
        return pa.table({
            "doc_id": pa.array(doc_ids[di], type=pa.int64()),
            "a": vocab.take(pa.array((uniq // V) % V)),
            "b": vocab.take(pa.array(uniq % V)),
            "n": pa.array(cnt, type=pa.int64()),
        })

    bg = (_read(sf_dir, "documents", ["doc_id", "text"])
          .map_batches(doc_bigrams, **_PYA))
    bgc = (bg.groupby(["a", "b"])
           .aggregate(Sum("n", alias_name="cab"))
           .repartition(8))
    ac = (bgc.groupby("a")
          .aggregate(Sum("cab", alias_name="ca"))
          .repartition(8))
    # attach ca to the MODEL table first (aggregate-sized join: vocab²
    # rows vs vocab rows), so the per-document rows pay only ONE
    # fact-sized shuffle — the original plan joined bg twice and the
    # second fact shuffle was pure waste
    model = bgc.join(ac, join_type="inner", num_partitions=8,
                     on=("a",))
    joined = bg.join(model, join_type="inner", num_partitions=8,
                     on=("a", "b"))

    def partial_score(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        cab = t.column("cab").to_numpy(zero_copy_only=False).astype(
            np.float64)
        ca = t.column("ca").to_numpy(zero_copy_only=False).astype(
            np.float64)
        logp = np.log2(cab / ca)
        docs = t.column("doc_id").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(docs, return_inverse=True)
        return pa.table({
            "doc_id": pa.array(uniq),
            "n_part": pa.array(np.bincount(inv, weights=n).astype(
                np.int64)),
            "lp_part": pa.array(np.bincount(inv, weights=n * logp)),
        })

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_bigrams").to_numpy(zero_copy_only=False)
        lp = t.column("lp").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bigrams": pa.array(n),
            "avg_logp": pa.array(_round_half_up(lp / n, 6)),
        })

    return (joined.map_batches(partial_score, **_PYA)
            .groupby("doc_id")
            .aggregate(Sum("n_part", alias_name="n_bigrams"),
                       Sum("lp_part", alias_name="lp"))
            .map_batches(finish, **_PYA))


SQL_DOCS_LM_SCORE = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
bg AS (
  SELECT t1.doc_id, t1.tok AS a, t2.tok AS b
  FROM toks t1 JOIN toks t2
    ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1),
bgc AS (SELECT a, b, COUNT(*) AS cab FROM bg GROUP BY 1, 2),
ac AS (SELECT a, SUM(cab) AS ca FROM bgc GROUP BY 1)
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(log2(bgc.cab / ac.ca)), 6) AS avg_logp
FROM bg JOIN bgc ON bg.a = bgc.a AND bg.b = bgc.b
        JOIN ac ON bg.a = ac.a
GROUP BY bg.doc_id
"""


# --- W13: rolling 7-day distinct active users ----------------------------------

def q_events_rolling_dau(sf_dir: str) -> ray.data.Dataset:
    """7-day rolling DAU — the window-distinct you canNOT get by
    summing daily distincts (users repeat across days).  Exact plan:
    distinct (day, user) presence pairs (first shuffle, bounded by
    users × days), each pair EXPANDS to the ≤7 windows it can serve,
    re-distinct, count per window (second shuffle, same bound × 7).
    Events themselves shuffle zero times; no window ever materializes
    its user set in one place."""
    def day_pairs(b: pa.Table) -> pa.Table:
        us = _ts_us(b.column("ts"))
        day = (us // 86_400_000_000).astype(np.int64)
        user = b.column("user_id").to_numpy(zero_copy_only=False)
        key = day * np.int64(1 << 32) + user
        uniq = np.unique(key)
        return pa.table({
            "day_i": pa.array(uniq >> 32),
            "user_id": pa.array(uniq & ((1 << 32) - 1)),
        })

    pairs = (_read(sf_dir, "events", ["ts", "user_id"])
             .map_batches(day_pairs, **_PYA)
             .groupby(["day_i", "user_id"])
             .aggregate(Count(alias_name="_c")))
    bounds = pairs.aggregate(Min("day_i"), Max("day_i"))
    lo, hi = int(bounds["min(day_i)"]), int(bounds["max(day_i)"])

    def expand(b: pa.Table) -> pa.Table:
        day = b.column("day_i").to_numpy(zero_copy_only=False)
        user = b.column("user_id").to_numpy(zero_copy_only=False)
        w = (day[:, None] + np.arange(7)[None, :]).ravel()
        u = np.repeat(user, 7)
        keep = w <= hi
        return pa.table({
            "w": pa.array(w[keep]),
            "user_id": pa.array(u[keep]),
        })

    def finish(b: pa.Table) -> pa.Table:
        w = b.column("w").to_numpy(zero_copy_only=False)
        return pa.table({
            "day": pa.array((w * 86_400_000_000).astype(
                "datetime64[us]")),
            "dau7": pa.array(pc.cast(b.column("dau7"), pa.int64())),
        })

    return (pairs.map_batches(expand, **_PYA)
            .groupby(["w", "user_id"])
            .aggregate(Count(alias_name="_c2"))
            .groupby("w")
            .aggregate(Count(alias_name="dau7"))
            .map_batches(finish, **_PYA))


SQL_EVENTS_ROLLING_DAU = """
WITH days AS (
  SELECT UNNEST(generate_series(
    (SELECT MIN(CAST(ts AS DATE)) FROM events),
    (SELECT MAX(CAST(ts AS DATE)) FROM events),
    INTERVAL 1 DAY)) AS day)
SELECT CAST(d.day AS TIMESTAMP) AS day,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS dau7
FROM days d JOIN events e
  ON CAST(e.ts AS DATE)
     BETWEEN CAST(d.day AS DATE) - 6 AND CAST(d.day AS DATE)
GROUP BY 1
"""


def queries_r3h() -> dict:
    return {
        "docs_split": q_docs_split,
        "docs_lm_score": q_docs_lm_score,
        "events_rolling_dau": q_events_rolling_dau,
    }


def parity_sql_r3h() -> dict[str, str]:
    """DuckDB twins for the pytest parity gate (NOT driver oracles)."""
    return {
        "docs_split": SQL_DOCS_SPLIT,
        "docs_lm_score": SQL_DOCS_LM_SCORE,
        "events_rolling_dau": SQL_EVENTS_ROLLING_DAU,
    }
