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


def test_driver_kill_mid_job_resumes(ray_session, tmp_path):
    """The north-rule contract end-to-end: the flagship CLI is
    SIGKILLed (whole process group — driver AND its private Ray
    cluster) after at least one partition manifest lands; a resume run
    skips every completed partition and the final output is
    byte-identical to a clean run."""
    import signal
    import subprocess
    import sys
    import time

    from text_extraction_ray.pipelines.job import run_extraction_job
    from text_extraction_ray.sources.synth import gen_corpus
    from test_resume import _output_digest

    corpus = str(tmp_path / "corpus")
    gen_corpus(corpus, 300, seed=11, n_shards=12)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def n_manifests() -> int:
        if not os.path.isdir(ckpt):
            return 0
        return sum(len(f) == 10 and f.endswith(".json")
                   and f[:5].isdigit() for f in os.listdir(ckpt))

    log = open(str(tmp_path / "cli.log"), "w")
    p = subprocess.Popen(
        [sys.executable, "-m", "text_extraction_ray.run",
         "--input", corpus, "--output", out, "--ckpt", ckpt,
         "--concurrency", "2"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=log, stderr=log, start_new_session=True)
    try:
        deadline = time.monotonic() + 180
        while (n_manifests() == 0 and p.poll() is None
               and time.monotonic() < deadline):
            time.sleep(0.05)
        assert n_manifests() > 0, (
            f"no manifest before CLI exit rc={p.poll()}; see cli.log")
        if p.poll() is None:
            os.killpg(p.pid, signal.SIGKILL)   # hard driver+cluster kill
        p.wait(timeout=60)
    finally:
        log.close()
        if p.poll() is None:
            os.killpg(p.pid, signal.SIGKILL)
    done_at_kill = n_manifests()
    assert done_at_kill < 12, "job finished before the kill — no resume"

    stats = run_extraction_job(corpus, out, ckpt, concurrency=2)
    assert stats["partitions_skipped"] >= done_at_kill
    assert stats["partitions_run"] == 12 - stats["partitions_skipped"]

    clean_out = str(tmp_path / "clean")
    run_extraction_job(corpus, clean_out, str(tmp_path / "clean_ckpt"),
                       concurrency=2)
    assert _output_digest(out) == _output_digest(clean_out)


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
