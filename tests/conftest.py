"""Shared fixtures: one Ray session per pytest session (driver instruction),
plus the deterministic tiny corpus used by the golden byte-identity gate."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus_dir(tmp_path_factory) -> str:
    from text_extraction_ray.sources.synth import gen_corpus

    d = str(tmp_path_factory.mktemp("pages_tiny"))
    gen_corpus(d, 200, seed=42, n_shards=4)
    return d


@pytest.fixture(scope="session")
def golden_table():
    import pyarrow.parquet as pq

    path = os.path.join(os.path.dirname(__file__), "golden", "golden_tiny.parquet")
    return pq.read_table(path)
