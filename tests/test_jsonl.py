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
