"""Tests for the QA/analysis operators over the extraction OUT table."""

from __future__ import annotations

import pytest

from text_extraction_ray.pipelines.analysis import (
    dedup_keep_latest,
    doc_type_counts,
    filter_lang,
    filter_minlen,
    length_histogram,
    per_lang_stats,
    topk_largest,
)
from text_extraction_ray.pipelines.extraction import extract_pages, read_pages


@pytest.fixture(scope="module")
def out_ds(ray_session, tiny_corpus_dir):
    ds = extract_pages(read_pages(tiny_corpus_dir), concurrency=2,
                       batch_size=64)
    return ds.materialize()


def test_doc_type_counts(out_ds):
    rows = {r["doc_type"]: r for r in doc_type_counts(out_ds).take_all()}
    assert sum(r["n_docs"] for r in rows.values()) == 200
    assert rows["unknown"]["n_failed"] == rows["unknown"]["n_docs"]
    assert rows["html"]["n_failed"] == 0


def test_per_lang_stats(out_ds):
    rows = per_lang_stats(out_ds).take_all()
    assert sum(r["n_docs"] for r in rows) == 200
    assert all(r["avg_chars"] >= 0 for r in rows)


def test_length_histogram(out_ds):
    rows = length_histogram(out_ds).take_all()
    assert sum(r["n_docs"] for r in rows) == 200
    assert all(r["bucket"] >= 0 for r in rows)


def test_topk_largest(out_ds):
    rows = topk_largest(out_ds, k=5).take_all()
    assert len(rows) == 5
    lens = [r["n_chars"] for r in rows]
    assert lens == sorted(lens, reverse=True)


def test_dedup_keep_latest(ray_session, tiny_corpus_dir):
    pages = read_pages(tiny_corpus_dir)
    n_before = pages.count()
    deduped = dedup_keep_latest(pages)
    n_after = deduped.count()
    # tiny corpus: every 50th row duplicates its predecessor (FIXTURES SS1)
    assert n_before == 200
    assert n_after == 196
    urls = [r["url"] for r in deduped.select_columns(["url"]).take_all()]
    assert len(set(urls)) == len(urls)


def test_filters(out_ds):
    en = filter_lang(out_ds, ("en",)).take_all()
    assert all(r["lang"] == "en" for r in en)
    long_docs = filter_minlen(out_ds, 500).take_all()
    assert all(len(r["extracted_text"]) >= 500 for r in long_docs)
    assert 0 < len(long_docs) < 200


def test_dedup_keep_latest_tie_deterministic(ray_session):
    """warc_ts ties resolve by row content, not shuffle-dependent group
    order: shuffled inputs give the identical winner."""
    import datetime as dt

    import pyarrow as pa

    import ray.data
    from text_extraction_ray.pipelines.analysis import dedup_keep_latest

    ts = dt.datetime(2024, 1, 1)
    rows = [
        {"url": "u", "warc_ts": ts, "html": b"b-version", "lang": "en"},
        {"url": "u", "warc_ts": ts, "html": b"a-version", "lang": "en"},
        {"url": "v", "warc_ts": ts, "html": b"only", "lang": "en"},
    ]
    winners = set()
    for order in (rows, rows[::-1]):
        ds = ray.data.from_arrow(pa.Table.from_pylist(order))
        out = dedup_keep_latest(ds).to_pandas().sort_values("url")
        winners.add(tuple(bytes(h) for h in out["html"]))
    assert len(winners) == 1
    assert winners.pop() == (b"b-version", b"only")
