"""Pipeline-builder (SURVEY SS2.10) + seeded-sample + native-join tests."""

from __future__ import annotations

import pytest

from text_extraction_ray.pipelines.builder import (
    available_stages,
    build_pipeline,
    register_stage,
)
from text_extraction_ray.pipelines.extraction import read_pages


def test_unknown_stage_rejected():
    with pytest.raises(ValueError, match="unknown stage"):
        build_pipeline([{"stage": "nope"}])


def test_duplicate_registration_rejected():
    with pytest.raises(ValueError, match="already registered"):
        register_stage("extract", lambda ds: ds)


def test_builtins_present():
    names = available_stages()
    for required in ("extract", "dedup_keep_latest", "filter_lang",
                     "per_lang_stats", "limit"):
        assert required in names


def test_composed_pipeline(ray_session, tiny_corpus_dir):
    pipe = build_pipeline([
        {"stage": "dedup_keep_latest"},
        {"stage": "extract", "concurrency": 2, "batch_size": 64},
        {"stage": "filter_lang", "langs": ("en", "de")},
        {"stage": "filter_minlen", "min_chars": 100},
    ])
    rows = pipe(read_pages(tiny_corpus_dir)).take_all()
    assert rows
    assert all(r["lang"] in ("en", "de") for r in rows)
    assert all(len(r["extracted_text"]) >= 100 for r in rows)


def test_custom_stage_roundtrip(ray_session, tiny_corpus_dir):
    register_stage("first_n_urls", lambda ds, n: ds.select_columns(
        ["url"]).limit(n))
    pipe = build_pipeline([{"stage": "first_n_urls", "n": 3}])
    assert len(pipe(read_pages(tiny_corpus_dir)).take_all()) == 3


def test_seeded_sample_deterministic(ray_session):
    """Content-keyed sample: identical SET regardless of parallelism or
    block structure (round 2 — random_sample drew per block, so the row
    count drifted with num_cpus between driver runs)."""
    import hashlib

    import ray.data

    from text_extraction_ray.pipelines.queries import q_sample_docs

    a = sorted(r["doc_id"] for r in q_sample_docs(
        "/root/testdata/sf0.001").take_all())
    b = sorted(r["doc_id"] for r in q_sample_docs(
        "/root/testdata/sf0.001").take_all())
    assert a == b
    # exact expected membership: pure function of the ids
    import pyarrow.parquet as pq

    ids = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_pylist()
    want = sorted(
        i for i in ids
        if int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) < 26)
    assert a == want
    assert len(a) > 0


def test_round2_stages_compose(ray_session):
    """Config-driven media chain: synth → resize → decode via the builder
    (the round-2 stages are first-class registry entries)."""
    import pyarrow as pa

    import ray.data

    from text_extraction_ray.functions.multimodal import synth_media_batch

    tbl = pa.table({
        "doc_id": pa.array(range(12), type=pa.int64()),
        "text": pa.array([""] * 12, type=pa.string()),
    })
    media = ray.data.from_arrow(synth_media_batch(tbl))
    pipe = build_pipeline([
        {"stage": "media_resize", "max_dim": 8, "concurrency": 1},
        {"stage": "media_decode", "concurrency": 1},
    ])
    out = pipe(media).to_pandas()
    assert len(out) == 12
    assert out["decode_ok"].all()
    assert (out["n_pixels"] <= 64).all()


def test_round2_dedup_stage(ray_session):
    import ray.data

    pipe = build_pipeline([{"stage": "exact_dedup"}])
    ds = ray.data.from_items([
        {"doc_id": 1, "text": "same text"},
        {"doc_id": 2, "text": "same text"},
        {"doc_id": 3, "text": "other"},
    ])
    kept = sorted(r["doc_id"] for r in pipe(ds).take_all())
    assert kept == [1, 3]


def test_extraction_plan_has_no_shuffle(ray_session, tiny_corpus_dir):
    """Physical-plan invariant: the flagship extraction pipeline is
    read → actor-pool map — any future change that sneaks an all-to-all
    (sort/aggregate/shuffle) into the hot path must fail loudly."""
    from text_extraction_ray.pipelines.extraction import (
        EXTRACT_COLUMNS,
        extract_pages,
        read_pages,
    )

    out = extract_pages(read_pages(tiny_corpus_dir, columns=EXTRACT_COLUMNS),
                        mode="single_pass", concurrency=(1, 2),
                        batch_size=64).materialize()
    stats = out.stats()
    for op in ("Sort", "Aggregate", "Shuffle", "Repartition"):
        assert op not in stats, f"unexpected {op} operator in:\n{stats[:800]}"
    assert "MapBatches" in stats and "ReadParquet" in stats


def test_training_prep_chain(ray_session, tiny_corpus_dir):
    """The full training-data prep story as ONE builder config: extract →
    quality features → language filter → token counting — each stage a
    registry entry, the whole chain lazy and streaming."""
    import ray.data

    pipe = build_pipeline([
        {"stage": "dedup_keep_latest"},
        {"stage": "extract", "concurrency": 2, "batch_size": 64},
        {"stage": "filter_minlen", "min_chars": 50},
    ])
    out = pipe(read_pages(tiny_corpus_dir))

    # feed the extracted text through the analysis stages (text col name)
    def rename(b):
        import pyarrow as pa

        return pa.table({"doc_id": pa.array(range(b.num_rows)),
                         "text": b.column("extracted_text")})

    analysis = build_pipeline([
        {"stage": "quality"},
        {"stage": "token_count"},
        {"stage": "lang_id"},
    ])
    t = analysis(out.map_batches(rename, batch_format="pyarrow")).to_pandas()
    assert len(t) > 50
    for col in ("quality_ok", "n_tokens", "n_subtokens", "lang_pred",
                "alpha_ratio", "stop_ratio"):
        assert col in t.columns
    assert t["quality_ok"].any()
    assert (t.loc[t["quality_ok"], "n_tokens"] >= 5).all()
