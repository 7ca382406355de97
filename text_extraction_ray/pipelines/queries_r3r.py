"""Round-3 continuation batch R: the end-to-end corpus-curation funnel.

``corpus_curation`` chains the C4/RefinedWeb-style cleanup a
pretraining corpus goes through — quality filter → exact dedup →
benchmark decontamination → temperature language resampling — and
returns the survivor funnel (stage, n_docs), the table every corpus
report leads with.  Every stage reuses the engine's existing oracled
operators (quality_batch, exact-dedup min-id rule, 8-gram
decontamination, batch-P md5 thresholds), so the whole funnel has an
exact DuckDB twin pinned in tests/test_queries_r3r.py (registered
rows-only: driver window full, see queries.py).

Plan shape (scale notes):
- ONE scan computes every per-doc flag that needs no global state
  (quality_ok, text_sha, contaminated-vs-broadcast-benchmark) into a
  compact curation MANIFEST (doc_id, lang, sha, 2 bools ≈ 30 B/row).
  The manifest is materialized because three stages consume it —
  at crawl scale it lands in parquet instead (the persisted keep-list
  pattern of docs_dedup_apply); recomputing the scan twice is the
  no-storage alternative.  The keeper table (one row per unique text)
  is the second, even smaller hold.
- Exact dedup is the oracled aggregate rule (min doc_id per sha
  among quality survivors) with NO join back: the funnel only needs
  the keeper's own (lang, contam), so both are bit-encoded into the
  Min-aggregated value (doc_id carries the highest stride) and decoded
  from the low bits — one shuffle, no second pass over the corpus.
- Resample thresholds derive from the post-decontamination lang
  counts (a tiny aggregate), broadcast into the final flag pass.
- The funnel itself is ONE aggregate of cumulative boolean sums —
  no stage recount re-executes the pipeline.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum

_PYA = {"batch_format": "pyarrow"}

DECONTAM_NGRAM = 8
BENCH_MAX_ID = 20


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def _bench_gram_set(sf_dir: str) -> set:
    """Benchmark-side 8-gram strings (bounded by definition: eval sets
    are thousands of docs; same rule as q_decontaminate)."""
    import pyarrow.parquet as pq

    bench = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"],
                          filters=[("doc_id", "<", BENCH_MAX_ID)])
    grams: set = set()
    for text in bench.column("text").to_pylist():
        toks = (text or "").split()
        for i in range(len(toks) - DECONTAM_NGRAM + 1):
            grams.add(" ".join(toks[i: i + DECONTAM_NGRAM]))
    return grams


def q_corpus_curation(sf_dir: str) -> pa.Table:
    """Survivor funnel of the full curation chain; 5 rows
    (input, quality, exact_dedup, decontaminated, lang_resampled)."""
    from ..functions.textstats import quality_batch
    from .queries_r3p import lang_keep_thresholds

    grams_ref = ray.put(_bench_gram_set(sf_dir))

    def scan(b: pa.Table) -> pa.Table:
        grams = ray.get(grams_ref)
        q = quality_batch(b)
        texts = b.column("text").to_pylist()
        sha, contam = [], []
        for t in texts:
            t = t or ""
            sha.append(hashlib.sha256(t.encode("utf-8")).hexdigest()[:32])
            toks = t.split()
            contam.append(any(
                " ".join(toks[i: i + DECONTAM_NGRAM]) in grams
                for i in range(len(toks) - DECONTAM_NGRAM + 1)))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang": b.column("lang"),
            "text_sha": pa.array(sha),
            "q_ok": q.column("quality_ok"),
            "contam": pa.array(contam, pa.bool_()),
        })

    manifest = (_read(sf_dir, "documents", ["doc_id", "lang", "text"])
                .map_batches(scan, **_PYA)
                .materialize())

    in_q = manifest.aggregate(Count(alias_name="input"),
                              Sum("q_ok", alias_name="quality"))

    # exact dedup WITHOUT a join: the funnel needs only the keeper's
    # own (lang, contam), so encode them into the Min-aggregated value
    # — doc_id has the highest stride, so min(combined) is the min-id
    # doc and its attributes decode from the low bits.
    langs = sorted({r["lang"] for r in manifest.groupby("lang")
                    .aggregate(Count(alias_name="n")).take_all()})
    lang_idx = {l: i for i, l in enumerate(langs)}
    nl = len(langs)

    def encode(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        li = np.array([lang_idx[l] for l in
                       b.column("lang").to_pylist()], dtype=np.int64)
        contam = b.column("contam").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "text_sha": b.column("text_sha"),
            "combined": pa.array((ids * nl + li) * 2 + contam),
        })

    keepers = (manifest.filter(expr="q_ok")
               .map_batches(encode, **_PYA)
               .groupby("text_sha")
               .aggregate(Min("combined", alias_name="v"))
               .materialize())  # the compact dedup keep-list; consumed
    #                            twice (lang counts + final flags)

    def s3_lang_rows(b: pa.Table) -> pa.Table:
        v = b.column("v").to_numpy(zero_copy_only=False)
        clean = (v & 1) == 0
        li = (v >> 1) % nl
        return pa.table({"lang": pa.array(
            [langs[i] for i in li[clean]], pa.string())})

    counts = {r["lang"]: int(r["n"])
              for r in keepers.map_batches(s3_lang_rows, **_PYA)
              .groupby("lang").aggregate(Count(alias_name="n"))
              .take_all()}
    thr = lang_keep_thresholds(counts)

    def final(b: pa.Table) -> pa.Table:
        v = b.column("v").to_numpy(zero_copy_only=False)
        clean = (v & 1) == 0
        li = (v >> 1) % nl
        ids = (v >> 1) // nl
        s4 = np.zeros(len(v), dtype=bool)
        for i in np.nonzero(clean)[0]:
            t = thr.get(langs[li[i]])
            s4[i] = (t is None or hashlib.md5(
                str(ids[i]).encode()).hexdigest()[:8] < t)
        return pa.table({
            "s2": pa.array(np.ones(len(v), dtype=np.int64)),
            "s3": pa.array(clean.astype(np.int64)),
            "s4": pa.array(s4.astype(np.int64)),
        })

    sums = (keepers.map_batches(final, **_PYA)
            .aggregate(Sum("s2", alias_name="exact_dedup"),
                       Sum("s3", alias_name="decontaminated"),
                       Sum("s4", alias_name="lang_resampled")))
    stages = ["input", "quality", "exact_dedup", "decontaminated",
              "lang_resampled"]
    vals = {**in_q, **sums}
    return pa.table({
        "stage": pa.array(stages),
        "n_docs": pa.array([int(vals[s]) for s in stages], pa.int64()),
    })


SQL_CORPUS_CURATION = r"""
WITH q AS (
  SELECT doc_id, lang, text,
         len(regexp_extract_all(text, '\S+')) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
             / GREATEST(length(text), 1) AS alpha_ratio,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
             / GREATEST(length(text), 1) AS digit_ratio
  FROM documents),
s1 AS (SELECT * FROM q
       WHERE n_tokens >= 5 AND alpha_ratio > 0.5 AND digit_ratio < 0.3),
s2 AS (SELECT s1.* FROM s1
       JOIN (SELECT MIN(doc_id) AS keeper FROM s1 GROUP BY text) k
         ON s1.doc_id = k.keeper),
bg AS (
  SELECT DISTINCT array_to_string(ts[i:i+7], ' ') AS g
  FROM (SELECT regexp_extract_all(text, '\S+') AS ts
        FROM documents WHERE doc_id < 20),
       UNNEST(generate_series(1, len(ts)-7)) AS t(i)),
contam AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM s2),
       UNNEST(generate_series(1, len(ts)-7)) AS t(i)
  WHERE array_to_string(ts[i:i+7], ' ') IN (SELECT g FROM bg)),
s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
c AS (SELECT lang, COUNT(*) AS n FROM s3 GROUP BY 1),
m AS (SELECT MIN(n) AS cmin FROM c),
r AS (SELECT lang,
        CASE WHEN n = cmin THEN NULL
             ELSE lpad(lower(hex(CAST(FLOOR(
                    sqrt(cmin / CAST(n AS DOUBLE)) * 4294967296.0)
                  AS BIGINT))), 8, '0')
        END AS thr
      FROM c, m),
s4 AS (SELECT s3.doc_id FROM s3 JOIN r USING (lang)
       WHERE r.thr IS NULL
          OR substr(md5(CAST(s3.doc_id AS VARCHAR)), 1, 8) < r.thr)
SELECT 'input' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
UNION ALL SELECT 'quality', COUNT(*) FROM s1
UNION ALL SELECT 'exact_dedup', COUNT(*) FROM s2
UNION ALL SELECT 'decontaminated', COUNT(*) FROM s3
UNION ALL SELECT 'lang_resampled', COUNT(*) FROM s4
"""


def queries_r3r() -> dict:
    return {
        "corpus_curation": q_corpus_curation,
    }
