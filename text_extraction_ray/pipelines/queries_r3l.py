"""Round-3 continuation batch L: perceptual image hashing.

One registered query: 64-bit dHash per media payload through the
actor-pool hashing stage (real decode → block-mean luma → gradient
bits; undecodable payloads route to the error column).  The companion
near-dup pair finder (`functions/multimodal.py:dhash_pairs`, banded
like SimHash) and the incremental-aggregate library
(`pipelines/incremental.py`) are fixture-tested in
tests/test_queries_r3l — planted duplicates is the only honest way to
test near-dup recall, and view maintenance needs two inputs.

Registered rows-only; dHash is decode-dependent (no SQL twin by
nature) — determinism + robustness invariants pin it in pytest.
"""

from __future__ import annotations

import ray.data

from .extraction import heavy_concurrency as _conc

_PYA = {"batch_format": "pyarrow"}


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def q_media_dhash(sf_dir: str) -> ray.data.Dataset:
    """dHash every synthetic media payload (fake/BMP/PNG containers).
    Same actor-pool shape as the decoder stage: per-batch totality,
    errors routed, small batches for fat binary rows."""
    from ..functions.multimodal import ImageDHasher, synth_media_batch

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(synth_media_batch, **_PYA)
            .map_batches(ImageDHasher, concurrency=_conc(),
                         batch_size=64, **_PYA))


def queries_r3l() -> dict:
    return {
        "media_dhash": q_media_dhash,
    }
