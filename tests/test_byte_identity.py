"""The correctness gate (SURVEY SS3.3 / BASELINE.json [B:6,15]):

every url's extracted_text from the distributed Ray pipeline must be
byte-identical to the frozen single-process oracle goldens — under both
physical plans (single_pass and routed) and regardless of batching."""

from __future__ import annotations

import hashlib

import pytest

from text_extraction_ray.params import params_hash
from text_extraction_ray.pipelines.extraction import extract_pages, read_pages


def _check_against_golden(out_rows: list[dict], golden) -> None:
    gold = {
        u: (t, s)
        for u, t, s in zip(
            golden.column("url").to_pylist(),
            golden.column("extracted_text").to_pylist(),
            golden.column("sha256").to_pylist(),
        )
    }
    gold_spans = {
        u: sp for u, sp in zip(golden.column("url").to_pylist(),
                               golden.column("spans").to_pylist())
    }
    seen: dict[str, str] = {}
    for row in out_rows:
        url = row["url"]
        text = row["extracted_text"]
        if url in seen:
            assert seen[url] == text, f"duplicate url {url} disagrees"
            continue
        seen[url] = text
        assert url in gold, f"unexpected url {url}"
        want_text, want_sha = gold[url]
        assert text == want_text, (
            f"byte mismatch for {url}:\n got={text[:200]!r}\nwant={want_text[:200]!r}")
        got_sha = hashlib.sha256(text.encode("utf-8")).hexdigest()
        assert got_sha == want_sha
        got_spans = [(s["start"], s["end"]) for s in row["spans"]]
        want_spans = [(s["start"], s["end"]) for s in gold_spans[url]]
        assert got_spans == want_spans, f"span mismatch for {url}"
    assert set(seen) == set(gold), (
        f"url set mismatch: missing={set(gold) - set(seen)}")


def test_golden_params_hash_current(golden_table):
    frozen = golden_table.column("params_hash").to_pylist()[0]
    assert frozen == params_hash(), (
        "params.py changed since goldens were frozen — rerun python -m oracle.freeze")


@pytest.mark.parametrize("mode", ["single_pass", "routed"])
def test_pipeline_matches_golden(ray_session, tiny_corpus_dir, golden_table, mode):
    ds = read_pages(tiny_corpus_dir)
    out = extract_pages(ds, mode=mode, concurrency=(1, 4), batch_size=32)
    rows = out.take_all()
    assert len(rows) == 200
    _check_against_golden(rows, golden_table)


def test_batch_size_invariance(ray_session, tiny_corpus_dir, golden_table):
    """SURVEY SS5.3: identical bytes at batch_size=1 vs 512."""
    for bs in (1, 512):
        ds = read_pages(tiny_corpus_dir)
        out = extract_pages(ds, concurrency=2, batch_size=bs)
        _check_against_golden(out.take_all(), golden_table)


def test_input_order_invariance(ray_session, tiny_corpus_dir, golden_table):
    """SURVEY SS5.3: shuffling input rows must not change per-url bytes."""
    ds = read_pages(tiny_corpus_dir).random_shuffle(seed=7)
    out = extract_pages(ds, concurrency=2, batch_size=64)
    _check_against_golden(out.take_all(), golden_table)


def test_column_pruned_read_identical(ray_session, tiny_corpus_dir, golden_table):
    """Pruning the WET `text` column at the read changes nothing."""
    from text_extraction_ray.pipelines.extraction import EXTRACT_COLUMNS

    ds = read_pages(tiny_corpus_dir, columns=EXTRACT_COLUMNS)
    out = extract_pages(ds, concurrency=2, batch_size=64)
    _check_against_golden(out.take_all(), golden_table)
