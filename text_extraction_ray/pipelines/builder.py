"""User-extension surface (SURVEY.md SS2.10): a small config-driven
pipeline builder.

A pipeline config is an ordered list of ``{"stage": name, ...kwargs}``
dicts; ``build_pipeline(cfg)`` returns a ``Dataset -> Dataset`` callable.
Users register custom stages with ``register_stage`` — a stage is any
``(Dataset, **kwargs) -> Dataset`` function, mirroring the reference's
script-step composition [RECON] without hardcoding the wiring.
"""

from __future__ import annotations

from collections.abc import Callable

import ray.data

Stage = Callable[..., ray.data.Dataset]

_REGISTRY: dict[str, Stage] = {}


def register_stage(name: str, fn: Stage) -> None:
    if name in _REGISTRY:
        raise ValueError(f"stage {name!r} already registered")
    _REGISTRY[name] = fn


def available_stages() -> list[str]:
    return sorted(_REGISTRY)


def build_pipeline(cfg: list[dict]) -> Callable[[ray.data.Dataset],
                                                ray.data.Dataset]:
    """Validate the config eagerly, compose lazily."""
    steps: list[tuple[Stage, dict]] = []
    for spec in cfg:
        spec = dict(spec)
        name = spec.pop("stage", None)
        if name not in _REGISTRY:
            raise ValueError(
                f"unknown stage {name!r}; available: {available_stages()}")
        steps.append((_REGISTRY[name], spec))

    def run(ds: ray.data.Dataset) -> ray.data.Dataset:
        for fn, kwargs in steps:
            ds = fn(ds, **kwargs)
        return ds

    return run


def _register_builtins() -> None:
    from ..functions.textstats import (
        fingerprint_batch,
        lang_id_batch,
        quality_batch,
        token_count_batch,
    )
    from .analysis import (
        dedup_keep_latest,
        filter_lang,
        filter_minlen,
        length_histogram,
        per_lang_stats,
        topk_largest,
    )
    from .extraction import extract_pages

    register_stage("extract", extract_pages)
    register_stage("dedup_keep_latest", lambda ds: dedup_keep_latest(ds))
    register_stage("filter_lang", filter_lang)
    register_stage("filter_minlen", filter_minlen)
    register_stage("per_lang_stats", lambda ds: per_lang_stats(ds))
    register_stage("length_histogram", length_histogram)
    register_stage("topk_largest", topk_largest)
    register_stage(
        "token_count",
        lambda ds: ds.map_batches(token_count_batch, batch_format="pyarrow"))
    register_stage(
        "quality",
        lambda ds: ds.map_batches(quality_batch, batch_format="pyarrow"))
    register_stage(
        "lang_id",
        lambda ds: ds.map_batches(lang_id_batch, batch_format="pyarrow"))
    register_stage(
        "fingerprint",
        lambda ds: ds.map_batches(fingerprint_batch, batch_format="pyarrow"))
    register_stage("limit", lambda ds, n: ds.limit(n))

    # round-2 stages: dedup families, LSH near-dup, multimodal actor pools
    from ..functions.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from ..functions.multimodal import (
        FakeImageResizer,
        FakeMediaDecoder,
        FrameSampler,
    )
    from ..functions.similarity import lsh_neardup_pairs
    from .extraction import default_concurrency

    register_stage("exact_dedup", exact_dedup)
    register_stage("minhash_pairs", minhash_lsh_pairs)
    register_stage("simhash_pairs", simhash_pairs)
    register_stage("lsh_neardup", lsh_neardup_pairs)
    register_stage(
        "media_decode",
        lambda ds, concurrency=None, batch_size=16: ds.map_batches(
            FakeMediaDecoder,
            concurrency=concurrency or default_concurrency(),
            batch_size=batch_size,
            batch_format="pyarrow", zero_copy_batch=True))
    register_stage(
        "media_resize",
        lambda ds, max_dim=16, concurrency=None, batch_size=16:
        ds.map_batches(
            FakeImageResizer, fn_constructor_args=(max_dim,),
            concurrency=concurrency or default_concurrency(),
            batch_size=batch_size,
            batch_format="pyarrow", zero_copy_batch=True))
    register_stage(
        "frame_sample",
        lambda ds, stride=4, concurrency=None, batch_size=8:
        ds.map_batches(
            FrameSampler, fn_constructor_args=(stride,),
            concurrency=concurrency or default_concurrency(),
            batch_size=batch_size,
            batch_format="pyarrow", zero_copy_batch=True))


_register_builtins()
