"""Round-3 continuation batch W: bucketed-layout join + deflate
compressibility signal.

- ``bucketed_join_revenue`` — revenue per market segment computed
  over a HASH-BUCKETED parquet layout (functions/bucketed.py): both
  orders and customer are written once into ``bucket =
  splitmix64(custkey) % 16`` directories (the shuffle paid at write
  time), then the join runs as 16 independent map tasks each reading
  bucket k of BOTH sides and joining locally — zero exchange in the
  join itself, the repeated-join amortization strategy at crawl
  scale.  Result is pinned equal to the engine's own native
  shuffle hash join AND to a DuckDB twin in pytest.
- ``docs_deflate_ratio`` — per-language DEFLATE compressibility of
  the documents table (zlib level 6): highly repetitive machine text
  compresses far below natural text, making the ratio a cheap
  Gopher/RefinedWeb-style quality signal.  Scan-shaped map_batches +
  one tiny per-lang aggregate; exact parity with a single-process
  recompute plus a planted repeated-vs-varied invariant in pytest.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zlib

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from ..functions.bucketed import bucketed_join, write_bucketed

_PYA = {"batch_format": "pyarrow"}

N_BUCKETS = 16


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def _bucketed_dirs(sf_dir: str) -> tuple[str, str]:
    """Idempotent bucketed layout for (orders, customer) keyed on
    custkey; the write-side shuffle runs once per corpus."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = os.path.join(tempfile.gettempdir(), f"tx_bucketed_{tag}")
    stamp = os.path.join(root, "_STAMP")
    want = f"v=1 b={N_BUCKETS} sf={tag}"
    od, cd = os.path.join(root, "orders"), os.path.join(root, "customer")
    if os.path.exists(stamp) and open(stamp).read() == want:
        return od, cd
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    write_bucketed(_read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
                   od, "o_custkey", N_BUCKETS)
    write_bucketed(_read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
                   cd, "c_custkey", N_BUCKETS)
    with open(stamp, "w") as f:
        f.write(want)
    return od, cd


def q_bucketed_join_revenue(sf_dir: str) -> ray.data.Dataset:
    od, cd = _bucketed_dirs(sf_dir)
    joined = bucketed_join(od, cd, "o_custkey", "c_custkey",
                           n_buckets=N_BUCKETS)

    def to_cents(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "c_mktsegment": b.column("c_mktsegment"),
            "cents": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
        })

    agg = (joined.map_batches(to_cents, **_PYA)
           .groupby("c_mktsegment")
           .aggregate(Sum("cents", alias_name="cents"),
                      Count(alias_name="n_orders")))

    def finish(b: pa.Table) -> pa.Table:
        cents = b.column("cents").to_numpy(zero_copy_only=False)
        return pa.table({
            "c_mktsegment": b.column("c_mktsegment"),
            "revenue": pa.array(cents / 100.0),
            "n_orders": b.column("n_orders"),
        })

    return agg.map_batches(finish, **_PYA)


def deflate_rows(b: pa.Table) -> pa.Table:
    """(lang, n_docs, n_bytes, n_deflate) map-side partials."""
    agg: dict[str, list[int]] = {}
    for text, lang in zip(b.column("text").to_pylist(),
                          b.column("lang").to_pylist()):
        raw = text.encode("utf-8")
        d = agg.setdefault(lang, [0, 0, 0])
        d[0] += 1
        d[1] += len(raw)
        d[2] += len(zlib.compress(raw, 6))
    langs = sorted(agg)
    return pa.table({
        "lang": pa.array(langs, pa.string()),
        "n_docs": pa.array([agg[l][0] for l in langs], pa.int64()),
        "n_bytes": pa.array([agg[l][1] for l in langs], pa.int64()),
        "n_deflate": pa.array([agg[l][2] for l in langs], pa.int64()),
    })


def q_docs_deflate_ratio(sf_dir: str) -> ray.data.Dataset:
    docs = _read(sf_dir, "documents", ["text", "lang"])
    agg = (docs.map_batches(deflate_rows, **_PYA)
           .groupby("lang")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_bytes", alias_name="n_bytes"),
                      Sum("n_deflate", alias_name="n_deflate")))

    def finish(b: pa.Table) -> pa.Table:
        nb = b.column("n_bytes").to_numpy(zero_copy_only=False).astype(
            np.float64)
        nd = b.column("n_deflate").to_numpy(zero_copy_only=False).astype(
            np.float64)
        r = nd / nb
        q = 10.0 ** 6
        return b.append_column(
            "deflate_ratio", pa.array(np.floor(r * q + 0.5) / q))

    return agg.map_batches(finish, **_PYA)


def queries_r3w() -> dict:
    return {
        "bucketed_join_revenue": q_bucketed_join_revenue,
        "docs_deflate_ratio": q_docs_deflate_ratio,
    }
