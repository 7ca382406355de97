"""Streaming-execution evidence: the pipeline completes under an object
store far smaller than the data it moves (backpressure + spill, the
property that lets the same code stream 100 TB through a fixed-size
cluster).  Runs in a SUBPROCESS because the test session's Ray instance
owns different store settings."""

from __future__ import annotations

import subprocess
import sys
import textwrap

_SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, "/root/repo")
    import ray
    # object store ~120 MiB — several times smaller than the raw corpus
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             object_store_memory=120 * 1024 * 1024)
    from text_extraction_ray.pipelines.extraction import (
        EXTRACT_COLUMNS, extract_pages, read_pages)
    from text_extraction_ray.sources.synth import gen_corpus
    corpus = sys.argv[1]
    gen_corpus(corpus, 20000, seed=42, n_shards=64)
    out = extract_pages(read_pages(corpus, columns=EXTRACT_COLUMNS),
                        mode="single_pass", concurrency=(2, 4),
                        batch_size=64)
    # consume as a stream: count() never materializes the dataset
    n = out.count()
    assert n == 20000, n
    print("STREAMED_OK", n)
    ray.shutdown()
""")


def test_pipeline_streams_under_small_object_store(tmp_path):
    corpus = str(tmp_path / "bp_corpus")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, corpus],
        capture_output=True, text=True, timeout=420, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "STREAMED_OK 20000" in proc.stdout
