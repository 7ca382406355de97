"""JSONL pages source: extraction parity with the parquet path."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def jsonl_corpus(tmp_path_factory, ray_session):
    from text_extraction_ray.sources.jsonl import write_jsonl
    from text_extraction_ray.sources.synth import gen_corpus

    pdir = str(tmp_path_factory.mktemp("jl_pages"))
    gen_corpus(pdir, 120, seed=42, n_shards=4)
    jdir = str(tmp_path_factory.mktemp("jl_shards"))
    for shard in sorted(f for f in os.listdir(pdir) if f.endswith(".parquet")):
        t = pq.read_table(os.path.join(pdir, shard))
        rows = t.to_pylist()
        write_jsonl(os.path.join(jdir, shard + ".jsonl"), rows)
    return pdir, jdir


def test_jsonl_extraction_matches_parquet(jsonl_corpus, ray_session):
    from text_extraction_ray.pipelines.extraction import (
        EXTRACT_COLUMNS,
        extract_pages,
        read_pages,
    )
    from text_extraction_ray.sources.jsonl import read_pages_jsonl

    pdir, jdir = jsonl_corpus
    via_pq = extract_pages(read_pages(pdir, columns=EXTRACT_COLUMNS),
                           mode="single_pass", concurrency=(1, 4),
                           batch_size=32).to_pandas()
    via_jl = extract_pages(read_pages_jsonl(jdir), mode="single_pass",
                           concurrency=(1, 4), batch_size=32).to_pandas()
    key = ["url", "warc_ts"]
    a = via_pq.set_index(key).sort_index()
    b = via_jl.set_index(key).sort_index()
    assert len(a) == len(b) == 120
    assert (a["extracted_text"] == b["extracted_text"]).all()
    assert (a["doc_type"] == b["doc_type"]).all()


def test_checkpointed_job_over_jsonl_shards(ray_session, tmp_path):
    """The resumable job consumes .jsonl shards directly (line-streamed,
    bounded memory) and produces the same bytes as the parquet run."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from text_extraction_ray.pipelines.job import run_extraction_job
    from text_extraction_ray.sources.jsonl import write_jsonl
    from text_extraction_ray.sources.synth import gen_corpus

    pdir = str(tmp_path / "pq_in")
    gen_corpus(pdir, 80, seed=9, n_shards=2)
    jdir = str(tmp_path / "jsonl_in")
    os.makedirs(jdir)
    for shard in sorted(os.listdir(pdir)):
        if not shard.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(pdir, shard))
        rows = [
            {"url": u, "warc_ts": ts, "html": h or b"", "text": x or "",
             "lang": lg or ""}
            for u, ts, h, x, lg in zip(
                t.column("url").to_pylist(), t.column("warc_ts").to_pylist(),
                t.column("html").to_pylist(), t.column("text").to_pylist(),
                t.column("lang").to_pylist())]
        write_jsonl(os.path.join(jdir, shard + ".jsonl"), rows)

    out_p, out_j = str(tmp_path / "out_pq"), str(tmp_path / "out_jsonl")
    run_extraction_job(pdir, out_p, concurrency=2)
    s = run_extraction_job(jdir, out_j, concurrency=2)
    assert s["partitions_run"] == 2

    def collect(root):
        parts = []
        for part in sorted(os.listdir(root)):
            p = os.path.join(root, part, "data.parquet")
            if part.startswith("part=") and os.path.exists(p):
                parts.append(pq.read_table(p).to_pandas())
        return pd.concat(parts).set_index(["url", "warc_ts"]).sort_index()

    a, b = collect(out_p), collect(out_j)
    assert len(a) == len(b) == 80
    assert (a["extracted_text"] == b["extracted_text"]).all()

    again = run_extraction_job(jdir, out_j, concurrency=2)
    assert again["partitions_run"] == 0
