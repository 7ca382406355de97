"""Batch-L: dHash invariants, banded near-dup recall on planted
duplicates, incremental aggregate maintenance ≡ full recompute."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.01"


def _to_pandas(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


def test_media_dhash_total_and_deterministic(ray_session):
    from text_extraction_ray.pipelines.queries_r3l import q_media_dhash

    df = _to_pandas(q_media_dhash(SF_DIR))
    assert len(df) == 500
    assert df.decode_ok.all()
    assert df.dhash.notna().all()
    again = _to_pandas(q_media_dhash(SF_DIR))
    a = df.sort_values("media_id").dhash.tolist()
    b = again.sort_values("media_id").dhash.tolist()
    assert a == b


def test_r3l_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3l import queries_r3l

    qs, osql = queries(), oracle_sql()
    for n in queries_r3l():
        assert n in qs and n not in osql, n
    assert list(qs)[49:51] == ["extract_pages_parity", "extract_pages"]


def test_dhash_invariant_to_resize_and_brightness():
    """The properties that make dHash a near-dup key: block-mean
    resizing and monotone brightness shifts keep the hash close;
    unrelated images are far."""
    from text_extraction_ray.core.raster import encode_bmp
    from text_extraction_ray.functions.multimodal import dhash64

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    # smooth it so downsampling is stable (real photos are not white noise)
    smooth = base.astype(np.float64)
    for _ in range(3):
        smooth = (np.roll(smooth, 1, 0) + np.roll(smooth, -1, 0)
                  + np.roll(smooth, 1, 1) + np.roll(smooth, -1, 1)
                  + smooth) / 5.0
    img = smooth.astype(np.uint8)
    h0 = dhash64("image/bmp", encode_bmp(48, 32, img.tobytes()))
    # brightness shift (clipped monotone)
    bright = np.clip(img.astype(np.int64) + 20, 0, 255).astype(np.uint8)
    h1 = dhash64("image/bmp", encode_bmp(48, 32, bright.tobytes()))
    # 2x nearest upscale (same content, different size)
    up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    h2 = dhash64("image/bmp", encode_bmp(96, 64, up.tobytes()))
    other = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    h3 = dhash64("image/bmp", encode_bmp(48, 32, other.tobytes()))

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(h0, h1) <= 6
    assert ham(h0, h2) <= 6
    assert ham(h0, h3) > 12


def test_dhash_pairs_finds_planted_duplicates(ray_session):
    """100 distinct images + 5 planted near-copies: the banded pair
    finder recovers every planted pair and nothing symmetric-dup."""
    import ray as _ray

    from text_extraction_ray.core.raster import encode_bmp
    from text_extraction_ray.functions.multimodal import (
        ImageDHasher,
        dhash_pairs,
    )

    rng = np.random.default_rng(5)
    rows = {"media_id": [], "media_type": [], "media": []}

    def smooth_img():
        s = rng.integers(0, 256, (24, 24)).astype(np.float64)
        for _ in range(3):
            s = (np.roll(s, 1, 0) + np.roll(s, -1, 0)
                 + np.roll(s, 1, 1) + np.roll(s, -1, 1) + s) / 5.0
        return s.astype(np.uint8)

    imgs = [smooth_img() for _ in range(100)]
    for i, img in enumerate(imgs):
        rows["media_id"].append(i)
        rows["media_type"].append("image/bmp")
        rows["media"].append(encode_bmp(24, 24, img.tobytes()))
    planted = []
    for j in range(5):
        src = imgs[j * 7]
        near = np.clip(src.astype(np.int64) + 15, 0, 255).astype(
            np.uint8)
        rows["media_id"].append(1000 + j)
        rows["media_type"].append("image/bmp")
        rows["media"].append(encode_bmp(24, 24, near.tobytes()))
        planted.append((j * 7, 1000 + j))
    t = pa.table({
        "media_id": pa.array(rows["media_id"], type=pa.int64()),
        "media_type": pa.array(rows["media_type"], type=pa.string()),
        "media": pa.array(rows["media"], type=pa.binary()),
    })
    hashed = (_ray.data.from_arrow(t).repartition(4)
              .map_batches(ImageDHasher, concurrency=2,
                           batch_format="pyarrow"))
    pairs = _to_pandas(dhash_pairs(hashed, max_hamming=10))
    got = {(min(a, b), max(a, b))
           for a, b in zip(pairs.id_a, pairs.id_b)}
    for p in planted:
        assert p in got, p
    # each pair appears once
    assert len(pairs) == len(got)


def test_incremental_daily_counts_equals_full(ray_session):
    """prev-half aggregate + delta-half maintenance == one-shot full
    aggregate, bit for bit."""
    import ray as _ray

    from text_extraction_ray.pipelines.incremental import (
        incremental_daily_counts,
    )
    from text_extraction_ray.pipelines.queries import read_table

    import pyarrow.compute as pc

    def parity(rem):
        def f(b):
            ids = b.column("event_id")
            keep = pc.equal(
                pc.bit_wise_and(ids, pa.scalar(1, pa.int64())),
                pa.scalar(rem, pa.int64()))
            return b.filter(keep)
        return f

    full = read_table(SF_DIR, "events", ["event_id", "ts", "event_type"])
    half1 = full.map_batches(parity(0), batch_format="pyarrow")
    half2 = full.map_batches(parity(1), batch_format="pyarrow")
    prev = incremental_daily_counts(half1)
    maintained = incremental_daily_counts(half2, prev=prev)
    oneshot = incremental_daily_counts(full)
    assert maintained.to_pylist() == oneshot.to_pylist()
