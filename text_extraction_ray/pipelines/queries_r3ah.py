"""Round-3 continuation batch AH: the published training-data curation
signals a web-scale pipeline runs before pre-training.

Three registered queries, all with driver-facing DuckDB oracles (merged
into oracle_sql() via the batch-parity block at registry positions
51-105; each also pinned by tests/test_queries_r3ah.py):

- ``docs_gopher`` — the Gopher quality-rule battery (Rae et al. 2021,
  "Scaling Language Models: ... Gopher", §A1.1): word-count band, mean
  word length band, and stop-word presence, each as a per-document
  signal column plus the combined verdict.  The corpus is
  single-space-separated words, so mean word length is the EXACT
  integer rational (n_chars - n_words + 1) / n_words — both engines
  divide identical integers, making the band cutoffs bit-deterministic.
- ``docs_top_bigram_frac`` — the Gopher repetition signal: the most
  frequent adjacent word bigram's share of all bigrams.  High values
  flag template/boilerplate pages that near-dup passes miss.
- ``semdedup_prune`` — SemDeDup-style embedding dedup (Abbas et al.
  2023): coarse-cluster by sign bits of the leading embedding dims,
  then within each cluster drop every vector whose cosine similarity
  to a LOWER-id vector reaches the threshold (keep-min, the same
  deterministic keeper rule as the text near-dup family).

Scale notes (100 TB): all three are scan-shaped per-batch kernels; the
only exchange is semdedup's bucket groupby, whose fan-in is bounded by
choosing SEM_BITS ~ log2(n_vectors / target_bucket) so the in-bucket
O(k^2) cosine stays constant-sized (mirrors the LSH family's banding;
at sf the 4-bit / 500-vector split gives ~31-row buckets).  The corpus
probe showed the nearest in-bucket cosine sits 6e-4 from the 0.4
threshold — far above float64 noise, so the SQL twin's
list_cosine_similarity decision is stable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_PYA = {"batch_format": "pyarrow"}

# Gopher-style stop set restricted to words the synthetic vocabulary can
# contain; the rule is ">= 2 distinct stop words present".
GOPHER_STOPS = ("the", "a", "of", "and", "to", "with")
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 20, 80
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 4.0, 5.2

SEM_BITS = 4          # sign bits of embedding[0:SEM_BITS] -> bucket
SEM_TAU = 0.4         # cosine threshold for "semantic duplicate"


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def _round_half_up(x: np.ndarray, digits: int) -> np.ndarray:
    """DuckDB ROUND() is half-away-from-zero; numpy's is banker's."""
    q = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * q + 0.5) / q


def gopher_batch(b: pa.Table) -> pa.Table:
    """Vectorized Gopher signals: list kernels for the split, bincount
    over list-parent indices for the stop-word hits — no Python rows."""
    text = b.column("text")
    words = pc.split_pattern(text, " ")
    n_words = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    n_words = n_words.astype(np.int64)
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    # single-space-separated corpus: total word chars = n_chars-(n_words-1)
    mwl = (n_chars - n_words + 1).astype(np.float64) / n_words
    flat = words.combine_chunks().flatten()
    parents = pc.list_parent_indices(
        words.combine_chunks()).to_numpy(zero_copy_only=False)
    stop_hits = np.zeros(len(b), dtype=np.int64)
    for sw in GOPHER_STOPS:
        hit = pc.equal(flat, sw).to_numpy(zero_copy_only=False)
        present = np.bincount(parents[hit], minlength=len(b)) > 0
        stop_hits += present
    ok = ((n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
          & (mwl >= GOPHER_MIN_MWL) & (mwl <= GOPHER_MAX_MWL)
          & (stop_hits >= 2))
    return pa.table({
        "doc_id": b.column("doc_id"),
        "n_words": pa.array(n_words),
        "mean_word_len": pa.array(_round_half_up(mwl, 6)),
        "stop_hits": pa.array(stop_hits),
        "gopher_ok": pa.array(ok),
    })


def q_docs_gopher(sf_dir: str) -> ray.data.Dataset:
    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(gopher_batch, **_PYA))


def bigram_batch(b: pa.Table) -> pa.Table:
    """Top adjacent-bigram share per doc.  Words are integer-coded once
    per batch (np.unique), a bigram is the code pair (w[i], w[i+1]) at
    equal parent, and the per-(doc, bigram) counts come from one
    np.unique over the composite key — exact, collision-free."""
    doc_id = b.column("doc_id").to_numpy(zero_copy_only=False)
    words = pc.split_pattern(b.column("text"), " ").combine_chunks()
    n_words = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    enc = words.flatten().dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_vocab = np.int64(len(enc.dictionary))
    parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    adj = parents[1:] == parents[:-1]
    pair_doc = parents[:-1][adj].astype(np.int64)
    pair_key = codes[:-1][adj] * n_vocab + codes[1:][adj]
    combo = pair_doc * n_vocab ** 2 + pair_key
    _, first, counts = np.unique(combo, return_index=True,
                                 return_counts=True)
    grp_doc = pair_doc[first]
    top = np.zeros(len(b), dtype=np.int64)
    np.maximum.at(top, grp_doc, counts)
    n_bigrams = n_words - 1
    # single-word docs have no bigrams; the SQL twin generates no pair
    # rows for them, so they are absent from both results
    has = n_bigrams > 0
    frac = top[has].astype(np.float64) / n_bigrams[has]
    return pa.table({
        "doc_id": pa.array(doc_id[has]),
        "top_bigram_count": pa.array(top[has]),
        "n_bigrams": pa.array(n_bigrams[has]),
        "top_bigram_frac": pa.array(_round_half_up(frac, 6)),
    })


def q_docs_top_bigram_frac(sf_dir: str) -> ray.data.Dataset:
    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(bigram_batch, **_PYA))


def q_semdedup_prune(sf_dir: str) -> ray.data.Dataset:
    """Survivors of SemDeDup keep-min pruning: vec_id + its bucket."""
    from ..functions.similarity import _matrix_from_batch

    def add_bucket(b: pa.Table) -> pa.Table:
        emb = _matrix_from_batch(b, "embedding")
        bits = (emb[:, :SEM_BITS] >= 0).astype(np.int64)
        bucket = bits @ (2 ** np.arange(SEM_BITS, dtype=np.int64))
        return pa.table({
            "vec_id": b.column("vec_id"),
            "embedding": b.column("embedding"),
            "bucket": pa.array(bucket),
        })

    def prune(g: pa.Table) -> pa.Table:
        vid = g.column("vec_id").to_numpy(zero_copy_only=False)
        emb = _matrix_from_batch(g, "embedding").astype(np.float64)
        order = np.argsort(vid, kind="stable")
        vid, emb = vid[order], emb[order]
        norm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sim = norm @ norm.T
        # drop i when ANY earlier (lower-id) j has cos >= tau
        dup = (np.triu(sim, 1) >= SEM_TAU).any(axis=0)
        keep = ~dup
        return pa.table({
            "vec_id": pa.array(vid[keep]),
            "bucket": pa.array(np.repeat(
                g.column("bucket")[0].as_py(), int(keep.sum()))),
        })

    return (_read(sf_dir, "embeddings", ["vec_id", "embedding"])
            .map_batches(add_bucket, **_PYA)
            .groupby("bucket")
            .map_groups(prune, batch_format="pyarrow"))


_STOP_HITS_SQL = " + ".join(
    f"CASE WHEN list_contains(words, '{sw}') THEN 1 ELSE 0 END"
    for sw in GOPHER_STOPS)

SQL_DOCS_GOPHER = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         length(text) AS n_chars
  FROM documents),
s AS (
  SELECT doc_id, len(words) AS n_words,
         CAST(n_chars - len(words) + 1 AS DOUBLE) / len(words) AS mwl,
         CAST({_STOP_HITS_SQL} AS BIGINT) AS stop_hits
  FROM w)
SELECT doc_id, n_words, ROUND(mwl, 6) AS mean_word_len, stop_hits,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
        AND mwl >= {GOPHER_MIN_MWL} AND mwl <= {GOPHER_MAX_MWL}
        AND stop_hits >= 2) AS gopher_ok
FROM s
"""

SQL_DOCS_TOP_BIGRAM_FRAC = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents),
p AS (
  SELECT doc_id,
         words[CAST(i AS BIGINT)] || ' '
           || words[CAST(i AS BIGINT) + 1] AS bigram
  FROM w, UNNEST(generate_series(1, len(words) - 1)) AS t(i)),
c AS (
  SELECT doc_id, bigram, COUNT(*) AS n FROM p GROUP BY doc_id, bigram)
SELECT doc_id, MAX(n) AS top_bigram_count,
       CAST(SUM(n) AS BIGINT) AS n_bigrams,
       ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS top_bigram_frac
FROM c GROUP BY doc_id
"""

_BUCKET_SQL = " + ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
    for i in range(SEM_BITS))

SQL_SEMDEDUP_PRUNE = f"""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         CAST({_BUCKET_SQL} AS BIGINT) AS bucket
  FROM embeddings),
drops AS (
  SELECT DISTINCT a.vec_id
  FROM b a JOIN b c ON a.bucket = c.bucket AND c.vec_id < a.vec_id
  WHERE list_cosine_similarity(a.e, c.e) >= {SEM_TAU})
SELECT vec_id, bucket FROM b
WHERE vec_id NOT IN (SELECT vec_id FROM drops)
"""


def queries_r3ah() -> dict:
    return {
        "docs_gopher": q_docs_gopher,
        "docs_top_bigram_frac": q_docs_top_bigram_frac,
        "semdedup_prune": q_semdedup_prune,
    }


def parity_sql_r3ah() -> dict[str, str]:
    """DuckDB twins — driver oracles via the batch-parity merge AND the
    pytest parity gate in tests/test_queries_r3ah.py."""
    return {
        "docs_gopher": SQL_DOCS_GOPHER,
        "docs_top_bigram_frac": SQL_DOCS_TOP_BIGRAM_FRAC,
        "semdedup_prune": SQL_SEMDEDUP_PRUNE,
    }
