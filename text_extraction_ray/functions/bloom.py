"""Bloom-prefiltered joins (round 2): shrink the big side BEFORE the
shuffle.

A semi/inner join whose probe side is huge and whose build side is
moderate wastes its shuffle on rows that can never match.  The classic
fix: build a Bloom filter of the build-side keys (distributed — each
batch folds its keys into a local bitmap, bitmaps OR together), broadcast
the ~100 KB bitmap once via ``ray.put``, and drop probe rows whose key is
definitely absent inside ``map_batches`` (vectorized double-hash test).
False positives only let a few extra rows through to the EXACT join that
follows, so results are bit-identical to the unfiltered join — the filter
is a bandwidth optimization, never a semantics change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

_M_BITS = 1 << 20          # 128 KiB bitmap
_K = 4                     # hash probes per key
_WORDS = _M_BITS // 64


def _hash_pair(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per int64 key (splitmix64 with two
    stream constants) for double hashing h1 + i*h2."""
    h = vals.view(np.uint64).copy()
    out = []
    for c1, c2 in ((0xBF58476D1CE4E5B9, 0x94D049BB133111EB),
                   (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F)):
        x = h.copy()
        x ^= x >> np.uint64(30)
        x *= np.uint64(c1)
        x ^= x >> np.uint64(27)
        x *= np.uint64(c2)
        x ^= x >> np.uint64(31)
        out.append(x)
    return out[0], out[1]


def _fold_bits(vals: np.ndarray, words: np.ndarray) -> None:
    h1, h2 = _hash_pair(vals)
    for i in range(_K):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(_M_BITS)
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))


def _test_bits(vals: np.ndarray, words: np.ndarray) -> np.ndarray:
    h1, h2 = _hash_pair(vals)
    hit = np.ones(len(vals), dtype=bool)
    for i in range(_K):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(_M_BITS)
        bit = (words[(idx >> np.uint64(6)).astype(np.int64)]
               >> (idx & np.uint64(63))) & np.uint64(1)
        hit &= bit.astype(bool)
    return hit


def build_bloom(ds: ray.data.Dataset, key_col: str) -> np.ndarray:
    """Distributed build: each batch folds its keys into a local bitmap
    row; bitmaps OR on the driver (n_batches x 128 KiB, bounded)."""
    def fold(b: pa.Table) -> pa.Table:
        words = np.zeros(_WORDS, dtype=np.uint64)
        vals = b.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        _fold_bits(vals, words)
        return pa.table({"bloom": pa.array([words.tobytes()],
                                           type=pa.binary())})

    merged = np.zeros(_WORDS, dtype=np.uint64)
    for blob in (ds.map_batches(fold, batch_format="pyarrow")
                 .to_pandas()["bloom"]):
        merged |= np.frombuffer(blob, dtype=np.uint64)
    return merged


def bloom_prefilter(ds: ray.data.Dataset, key_col: str,
                    bloom_words: np.ndarray) -> ray.data.Dataset:
    """Drop rows whose key is DEFINITELY not in the filter (vectorized);
    survivors (matches + rare false positives) proceed to the exact join."""
    ref = ray.put(bloom_words)

    def keep(b: pa.Table) -> pa.Table:
        words = ray.get(ref)
        vals = b.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        return b.filter(pa.array(_test_bits(vals, words)))

    return ds.map_batches(keep, batch_format="pyarrow")
