"""Mid-run failure recovery: a crashed extraction actor is restarted
by Ray and the job's output is byte-identical to a clean run — the
"any ray job submit run resumes mid-crawl" contract exercised at the
TASK level (checkpoint/resume covers the job level in
test_checkpoint/test_resume)."""

import os

import ray
import ray.data

from text_extraction_ray.stages.chaos import CrashOnce


def test_actor_crash_mid_run_output_identical(ray_session, tmp_path):
    from text_extraction_ray.pipelines.extraction import read_pages
    from text_extraction_ray.sources.synth import gen_corpus

    corpus = str(tmp_path / "corpus")
    gen_corpus(corpus, 120, seed=7, n_shards=4)

    from text_extraction_ray.stages.extract import Extractor

    want = (read_pages(corpus)
            .map_batches(Extractor, concurrency=(1, 2), batch_size=32,
                         batch_format="pyarrow")
            .to_pandas()
            .sort_values("url").reset_index(drop=True))

    marker = str(tmp_path / "crashed_once")
    got = (read_pages(corpus)
           .map_batches(CrashOnce, concurrency=(1, 2),
                        batch_size=32, batch_format="pyarrow",
                        fn_constructor_kwargs={"marker": marker})
           .to_pandas()
           .sort_values("url").reset_index(drop=True))

    assert os.path.exists(marker), "the crash never fired"
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[["url", "extracted_text", "parse_ok"]],
        want[["url", "extracted_text", "parse_ok"]])


def test_span_dedup_broadcast_path_is_scan_shaped(ray_session):
    """Batch-T scale claim pinned: after the keeper aggregate
    materializes, the rebuild pass is a pure scan — no doc-keyed
    exchange anywhere in its plan."""
    from text_extraction_ray.pipelines.queries_r3t import q_docs_span_dedup

    out = q_docs_span_dedup("/root/testdata/sf0.001").materialize()
    stats = out.stats()
    for op in ("Sort", "Aggregate", "Shuffle", "Repartition", "Join"):
        assert op not in stats, f"unexpected {op} in:\n{stats[:800]}"
    assert "MapBatches" in stats and "ReadParquet" in stats
