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
    """K1: largest extracted documents (distributed top-k: per-block
    prune, then a tiny sort — never a full-corpus sort for k rows)."""
    from ..functions.topk import topk

    return topk(
        out_ds.map_batches(
            lambda b: add_text_len(b).select(["url", "n_chars"]),
            batch_format="pyarrow"),
        ["n_chars", "url"], k, descending=[True, False])


def dedup_keep_latest(pages_ds: ray.data.Dataset) -> ray.data.Dataset:
    """G3 (opt-in): one row per url, max warc_ts wins.

    Hash-partitions by url — the ONLY shuffle in the pages path, which is
    why it is opt-in rather than part of the flagship job.  Ties on
    warc_ts break by the full serialized row (NOT by group row order,
    which is shuffle-dependent) so the winner is deterministic under any
    physical plan.
    """

    def latest(group: pa.Table) -> pa.Table:
        ts = group.column("warc_ts").to_pylist()
        cols = [group.column(n).to_pylist() for n in group.schema.names]

        def key(i: int):
            return (ts[i], tuple(str(c[i]) for c in cols))

        best = max(range(len(ts)), key=key)
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


class BlockExplainer:
    """Explain/debug stage: one output row per DOM block with the full
    feature vector and final class — SURVEY SS1.3's BLOCK table.  Answers
    "why was this block kept/dropped" per url.  Actor-pool stage (compiled
    heuristics built once); html docs only — pdf/other rows yield no rows.

    Uses the reference (non-fused) featurize so every debug field
    (text_density, n_words) is populated even for blocks the fused hot
    path classifies early.
    """

    def __init__(self) -> None:
        from ..core import html_extract  # state: modules + stoplists warm

        self._hx = html_extract

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.encoding import decode_html, sniff_doc_type
        from ..core.stopwords import STOPWORDS, stoplist_for, vote_lang

        hx = self._hx
        cols: dict[str, list] = {k: [] for k in (
            "url", "warc_ts", "block_id", "tag_path", "text", "n_chars",
            "n_words", "n_link_chars", "link_density", "text_density",
            "stop_density", "cls")}
        for url, warc_ts, payload, crawl_lang in zip(
            batch.column("url").to_pylist(),
            batch.column("warc_ts").to_pylist(),
            batch.column("html").to_pylist(),
            batch.column("lang").to_pylist(),
        ):
            if sniff_doc_type(payload or b"") != "html":
                continue
            text, _ = decode_html(payload)
            blocks = hx.segment_blocks(text)
            lang = crawl_lang if crawl_lang in STOPWORDS else ""
            if not lang:
                words: list[str] = []
                for b in blocks:
                    words.extend(b.text.split(" "))
                lang = vote_lang(words)
            hx.featurize(blocks, stoplist_for(lang))
            hx.classify_context_free(blocks)
            hx.classify_context_sensitive(blocks)
            for b in blocks:
                cols["url"].append(url)
                cols["warc_ts"].append(warc_ts)
                cols["block_id"].append(b.block_id)
                cols["tag_path"].append(b.tag_path)
                cols["text"].append(b.text)
                cols["n_chars"].append(b.n_chars)
                cols["n_words"].append(b.n_words)
                cols["n_link_chars"].append(b.n_link_chars)
                cols["link_density"].append(b.link_density)
                cols["text_density"].append(b.text_density)
                cols["stop_density"].append(b.stop_density)
                cols["cls"].append(b.cls)
        return pa.table({
            "url": pa.array(cols["url"], type=pa.string()),
            "warc_ts": pa.array(cols["warc_ts"],
                                type=pa.timestamp("us")),
            "block_id": pa.array(cols["block_id"], type=pa.int32()),
            "tag_path": pa.array(cols["tag_path"], type=pa.string()),
            "text": pa.array(cols["text"], type=pa.string()),
            "n_chars": pa.array(cols["n_chars"], type=pa.int32()),
            "n_words": pa.array(cols["n_words"], type=pa.int32()),
            "n_link_chars": pa.array(cols["n_link_chars"], type=pa.int32()),
            "link_density": pa.array(cols["link_density"], type=pa.float64()),
            "text_density": pa.array(cols["text_density"], type=pa.float64()),
            "stop_density": pa.array(cols["stop_density"], type=pa.float64()),
            "cls": pa.array(cols["cls"], type=pa.string()),
        })


def explain_blocks(pages_ds: ray.data.Dataset,
                   concurrency=None, batch_size: int = 64
                   ) -> ray.data.Dataset:
    """Per-block debug table over a PAGES dataset (url, html, lang cols)."""
    from .extraction import default_concurrency

    concurrency = concurrency or default_concurrency()
    return pages_ds.map_batches(
        BlockExplainer, concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow", zero_copy_batch=True)
