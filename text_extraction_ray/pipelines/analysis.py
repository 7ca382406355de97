"""QA / corpus-analysis operators over the extraction OUT table
(SURVEY.md G2, G3, G6, K1, M14).

All take and return Datasets; aggregations pre-reduce inside map_batches
(Arrow kernels) before the tiny groupby — the shuffle only ever carries
(key, partial) rows, never text.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Mean, Sum


def add_text_len(batch: pa.Table) -> pa.Table:
    n = pc.cast(pc.utf8_length(batch.column("extracted_text")), pa.int64())
    return batch.append_column("n_chars", n)


def per_lang_stats(out_ds: ray.data.Dataset) -> ray.data.Dataset:
    """G2: docs + mean extracted length per lang."""
    return (
        out_ds.map_batches(
            lambda b: add_text_len(b).select(["lang", "n_chars"]),
            batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"),
                   Mean("n_chars", alias_name="avg_chars"))
    )


def doc_type_counts(out_ds: ray.data.Dataset) -> ray.data.Dataset:
    """G1-adjacent QA: docs + failures per doc_type."""

    def prep(b: pa.Table) -> pa.Table:
        failed = pc.cast(pc.invert(b.column("parse_ok")), pa.int64())
        return pa.table({
            "doc_type": b.column("doc_type"),
            "failed": failed,
        })

    return (
        out_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("doc_type")
        .aggregate(Count(alias_name="n_docs"),
                   Sum("failed", alias_name="n_failed"))
    )


def length_histogram(out_ds: ray.data.Dataset,
                     bucket: int = 1000) -> ray.data.Dataset:
    """G6: bucketized extracted-length distribution (skew monitoring)."""

    def prep(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.utf8_length(b.column("extracted_text")), pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.divide(n, pa.scalar(bucket, pa.int64())),
                              pa.int64()),
        })

    return (
        out_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="n_docs"))
    )


def topk_largest(out_ds: ray.data.Dataset, k: int = 10) -> ray.data.Dataset:
    """K1: largest extracted documents."""
    return (
        out_ds.map_batches(
            lambda b: add_text_len(b).select(["url", "n_chars"]),
            batch_format="pyarrow")
        .sort(["n_chars", "url"], descending=[True, False])
        .limit(k)
    )


def dedup_keep_latest(pages_ds: ray.data.Dataset) -> ray.data.Dataset:
    """G3 (opt-in): one row per url, max warc_ts wins.

    Hash-partitions by url — the ONLY shuffle in the pages path, which is
    why it is opt-in rather than part of the flagship job.
    """

    def latest(group: pa.Table) -> pa.Table:
        ts = group.column("warc_ts").to_pylist()
        best = max(range(len(ts)), key=lambda i: ts[i])
        return group.slice(best, 1)

    return pages_ds.groupby("url").map_groups(latest, batch_format="pyarrow")


def filter_lang(out_ds: ray.data.Dataset,
                langs: tuple[str, ...]) -> ray.data.Dataset:
    """M14: language whitelist filter."""
    expr = " or ".join(f"lang == '{l}'" for l in langs)
    return out_ds.filter(expr=expr)


def filter_minlen(out_ds: ray.data.Dataset, min_chars: int) -> ray.data.Dataset:
    """M14: minimum extracted length filter (arrow predicate per batch)."""

    def fn(b: pa.Table) -> pa.Table:
        n = pc.utf8_length(b.column("extracted_text"))
        return b.filter(pc.greater_equal(n, min_chars))

    return out_ds.map_batches(fn, batch_format="pyarrow")
