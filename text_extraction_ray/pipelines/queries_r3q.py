"""Round-3 continuation batch Q: WET sink/source + domain-level curation.

Two registered rows-only queries over the engine's own extraction
output (the driver tables carry no raw html / urls — FIXTURES §1; the
extraction-derived queries all use the cached deterministic synthetic
corpus, same as extract_pages):

- ``wet_roundtrip`` — extraction OUT → WET conversion-record shards
  (gzip members, content-named, atomic) → read back through the WET
  source → (url, n_chars, sha16).  Pins the crawl-loop contract:
  what the engine writes as WET it re-reads byte-identically; pytest
  compares the roundtrip sha against the direct extraction output and
  checks gzip-member salvage on a truncated shard.
- ``domain_stats`` — per-registered-host curation table (the CC-style
  domain-level quality pass): docs per host, parse-failure rate,
  mean extracted length.  Host parsing is a vectorized Arrow split —
  the groupby shuffles one short row per PAGE (host, ok, len), and at
  crawl scale would pre-aggregate per batch first (the partial-agg
  combiner pattern from label_centroids); hosts are bounded (~10⁸)
  where pages are not (~10¹²).

Domain blocklist application (`apply_domain_filter`) is the companion
stage: broadcast the bad-host list (ray.put) and filter inside
map_batches — no shuffle; pytest pins it on a planted bad domain.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Mean, Sum

_PYA = {"batch_format": "pyarrow"}


def _extract_out(sf_dir: str):
    """The shared deterministic extraction output (cached corpus)."""
    from ..sources.synth import gen_corpus
    from .extraction import EXTRACT_COLUMNS, extract_pages, read_pages

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    corpus = os.path.join(tempfile.gettempdir(), f"tx_pages_{tag}")
    gen_corpus(corpus, 500, seed=42, n_shards=8)
    return extract_pages(read_pages(corpus, columns=EXTRACT_COLUMNS),
                         mode="single_pass",
                         batch_size=32)


def q_wet_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """Write extraction output as WET shards, read it back, fingerprint."""
    from ..sources.wet import read_wet_dir, wet_writer_factory

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = os.path.join(tempfile.gettempdir(), f"tx_wet_{tag}")
    # fresh sink dir: stale shards from an earlier corpus version would
    # otherwise survive the content-named writes (same reason run.py
    # --fresh clears part=* dirs)
    if os.path.isdir(out_dir):
        for f in os.listdir(out_dir):
            if f.startswith("wet-"):
                os.unlink(os.path.join(out_dir, f))
    manifest = (_extract_out(sf_dir)
                .select_columns(["url", "warc_ts", "extracted_text"])
                .map_batches(wet_writer_factory(out_dir), **_PYA))
    n_shards = manifest.count()  # barrier: all shards written
    assert n_shards > 0

    def fingerprint(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        return pa.table({
            "url": b.column("url"),
            "n_chars": pc.cast(pc.utf8_length(b.column("text")),
                               pa.int64()),
            "sha16": pa.array([
                hashlib.sha256(t.encode("utf-8")).hexdigest()[:16]
                for t in texts]),
        })

    return read_wet_dir(out_dir).map_batches(fingerprint, **_PYA)


def _host_rows(b: pa.Table) -> pa.Table:
    """(host, ok, n_chars) per page — vectorized split on '/': element 2
    of scheme://host/path is the registered host."""
    parts = pc.split_pattern(b.column("url"), "/")
    host = pc.list_element(parts, 2)
    return pa.table({
        "host": host,
        "ok": pc.cast(b.column("parse_ok"), pa.int64()),
        "n_chars": pc.cast(pc.utf8_length(b.column("extracted_text")),
                           pa.int64()),
    })


def q_domain_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-host curation table: n_pages, parse-failure rate, mean length."""
    agg = (_extract_out(sf_dir)
           .select_columns(["url", "parse_ok", "extracted_text"])
           .map_batches(_host_rows, **_PYA)
           .groupby("host")
           .aggregate(Count(alias_name="n_pages"),
                      Sum("ok", alias_name="n_ok"),
                      Mean("n_chars", alias_name="mean_chars")))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_pages").to_numpy(zero_copy_only=False).astype(
            np.float64)
        ok = t.column("n_ok").to_numpy(zero_copy_only=False).astype(
            np.float64)
        mc = t.column("mean_chars").to_numpy(zero_copy_only=False)
        q = 10.0 ** 6
        return pa.table({
            "host": t.column("host"),
            "n_pages": pc.cast(t.column("n_pages"), pa.int64()),
            "fail_rate": pa.array(np.floor((1.0 - ok / n) * q + 0.5) / q),
            "mean_chars": pa.array(np.floor(np.abs(mc) * q + 0.5) / q),
        })

    return agg.map_batches(finish, **_PYA)


def apply_domain_filter(ds: ray.data.Dataset,
                        bad_hosts: list[str]) -> ray.data.Dataset:
    """Drop every page whose host is blocklisted: the list is broadcast
    once (ray.put) and probed vectorized inside map_batches — zero
    shuffle, the standard small-side-lookup shape."""
    ref = ray.put(np.sort(np.array(bad_hosts, dtype=object)))

    def keep(b: pa.Table) -> pa.Table:
        bad = ray.get(ref)
        host = pc.list_element(
            pc.split_pattern(b.column("url"), "/"), 2)
        h = host.to_numpy(zero_copy_only=False)
        if bad.size == 0:
            return b
        idx = np.searchsorted(bad, h)
        idx[idx == bad.size] = 0
        mask = bad[idx] != h
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, **_PYA)


def queries_r3q() -> dict:
    return {
        "wet_roundtrip": q_wet_roundtrip,
        "domain_stats": q_domain_stats,
    }
