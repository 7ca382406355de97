"""Hashing vectorizer + end-to-end extract→embed→near-dup pipeline."""

from __future__ import annotations

import numpy as np

from text_extraction_ray.functions.embed import embed_text


def test_embed_deterministic_unit_norm():
    a = embed_text("the quick brown fox jumps over the lazy dog")
    b = embed_text("the quick brown fox jumps over the lazy dog")
    assert np.allclose(a, b)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-12
    assert np.allclose(embed_text(""), np.zeros(64))


def test_embed_similarity_ordering():
    base = embed_text("ray data streams arrow batches through actor pools "
                      "with backpressure and object spilling")
    near = embed_text("ray data streams arrow batches through worker pools "
                      "with backpressure and object spilling")
    far = embed_text("chocolate cake recipes require flour sugar butter "
                     "eggs and patience in the oven")
    assert base @ near > 0.8
    assert base @ near > base @ far + 0.3


def test_extract_embed_neardup_finds_recrawls(ray_session):
    from text_extraction_ray.pipelines.queries_ext import (
        q_extract_embed_neardup,
    )

    pairs = q_extract_embed_neardup("/root/testdata/sf0.01").to_pandas()
    assert len(pairs) > 0
    assert (pairs["cos"] >= 0.95).all()
    # re-crawl pairs (same url, different ts) must be recovered; templated
    # cross-url near-dups are also legitimate hits
    same_url = (pairs["id_a"].str.split("@").str[0]
                == pairs["id_b"].str.split("@").str[0])
    assert same_url.sum() >= 3
    assert (pairs.loc[same_url, "cos"] >= 0.99).any()
