"""Resume / determinism tests (SURVEY SS3.3, SS4.4)."""

from __future__ import annotations

import hashlib
import os
import shutil

import pyarrow.parquet as pq

from text_extraction_ray.pipelines.job import run_extraction_job
from text_extraction_ray.state.checkpoint import manifest_file, partition_out_dir


def _output_digest(output_dir: str) -> str:
    h = hashlib.sha256()
    for part in sorted(os.listdir(output_dir)):
        if not part.startswith("part="):
            continue
        t = pq.read_table(os.path.join(output_dir, part, "data.parquet"))
        for url, text in zip(t.column("url").to_pylist(),
                             t.column("extracted_text").to_pylist()):
            h.update(url.encode() + b"\x00" + text.encode() + b"\x1e")
    return h.hexdigest()


def test_job_runs_and_resumes(ray_session, tiny_corpus_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    s1 = run_extraction_job(tiny_corpus_dir, out, ckpt, concurrency=2)
    assert s1["partitions_run"] == 4
    assert s1["cumulative"]["partitions"] == 4
    assert s1["cumulative"]["docs_out"] == 200
    digest1 = _output_digest(out)

    # a second run is a full no-op
    s2 = run_extraction_job(tiny_corpus_dir, out, ckpt, concurrency=2)
    assert s2["partitions_run"] == 0
    assert s2["partitions_skipped"] == 4
    assert _output_digest(out) == digest1

    # sabotage partitions 2 and 3 → only they recompute, bytes unchanged
    for pid in (2, 3):
        os.remove(manifest_file(ckpt, pid))
        shutil.rmtree(partition_out_dir(out, pid))
    s3 = run_extraction_job(tiny_corpus_dir, out, ckpt, concurrency=2)
    assert s3["partitions_run"] == 2
    assert s3["partitions_skipped"] == 2
    assert _output_digest(out) == digest1


def test_job_matches_streaming_pipeline(ray_session, tiny_corpus_dir, tmp_path, golden_table):
    """The checkpointed job and the frozen goldens agree byte-for-byte."""
    out = str(tmp_path / "out2")
    run_extraction_job(tiny_corpus_dir, out, concurrency=2)
    gold = dict(zip(golden_table.column("url").to_pylist(),
                    golden_table.column("extracted_text").to_pylist()))
    seen = {}
    for part in sorted(os.listdir(out)):
        if not part.startswith("part="):
            continue
        t = pq.read_table(os.path.join(out, part, "data.parquet"))
        for url, text in zip(t.column("url").to_pylist(),
                             t.column("extracted_text").to_pylist()):
            assert gold[url] == text
            seen[url] = text
    assert set(seen) == set(gold)
