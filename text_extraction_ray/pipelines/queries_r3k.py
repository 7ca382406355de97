"""Round-3 continuation batch K: data-quality profiling + storage
maintenance (zone maps, compaction — tested path-based, see
sources/zonemap.py and state/compact.py).

One registered query: a per-column table profile (row count, null
count, EXACT distinct count) in long format — the first thing any
data-quality pass computes over a new drop.  Each column profiles in
one pass: batch-level pre-dedup + counter rows share a single keyed
aggregate, so the shuffle carries batch-distinct values (never raw
rows) and two counter cells per batch.

Registered rows-only (driver 50-row window frozen); DuckDB parity twin
runs in tests/test_queries_r3k.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

_PYA = {"batch_format": "pyarrow"}

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"]


def _read(sf_dir: str, table: str, columns: list[str],
          row_filter=None) -> ray.data.Dataset:
    from .queries import read_table

    return read_table(sf_dir, table, columns, row_filter=row_filter)


def profile_columns(ds: ray.data.Dataset, cols: list[str]) -> dict:
    """{col: {n_rows, n_nulls, n_distinct}} for every column, exactly,
    in ONE pass + ONE keyed aggregate (the first version ran a pipeline
    per column — 6× the stage startups for the same answer; BENCH
    showed 13 s where one pass does ~2 s).  Keys are "col\\x00v:value"
    for batch-distinct values (str() is injective on distinct
    doubles/timestamps/ints) plus two counter cells per (batch, col);
    the shuffle is bounded by per-batch cardinality, never raw row
    count."""
    def fold(b: pa.Table) -> pa.Table:
        parts_k: list = []
        parts_c: list = []
        n = b.num_rows
        for col in cols:
            c = b.column(col).combine_chunks()
            nulls = int(pc.sum(pc.is_null(c)).as_py() or 0)
            vals = c.drop_null().unique()
            # vectorized stringify: Arrow's shortest-roundtrip repr is
            # injective on distinct values, which is all dedup needs
            vkeys = pc.binary_join_element_wise(
                pa.array([f"{col}\x00v:"] * len(vals)),
                pc.cast(vals, pa.string()), "")
            parts_k.append(vkeys)
            parts_c.append(pa.array(np.zeros(len(vals), dtype=np.int64)))
            parts_k.append(pa.array([f"{col}\x00#rows",
                                     f"{col}\x00#nulls"]))
            parts_c.append(pa.array([n, nulls], type=pa.int64()))
        return pa.table({
            "k": pa.concat_arrays(
                [a.cast(pa.string()) for a in parts_k]),
            "c": pa.concat_arrays(parts_c),
        })

    rows = (ds.map_batches(fold, **_PYA)
            .groupby("k")
            .aggregate(Sum("c", alias_name="c"))
            .take_all())
    out = {c: {"n_rows": 0, "n_nulls": 0, "n_distinct": 0}
           for c in cols}
    for r in rows:
        col, key = r["k"].split("\x00", 1)
        if key == "#rows":
            out[col]["n_rows"] = int(r["c"])
        elif key == "#nulls":
            out[col]["n_nulls"] = int(r["c"])
        else:
            out[col]["n_distinct"] += 1
    return out


def profile_column(ds: ray.data.Dataset, col: str) -> dict:
    """Single-column convenience wrapper over profile_columns."""
    return profile_columns(ds, [col])[col]


def q_orders_profile(sf_dir: str) -> pa.Table:
    """Long-format profile of every orders column — one read, one
    shuffle for all six."""
    prof = profile_columns(_read(sf_dir, "orders", _PROFILE_COLS),
                           _PROFILE_COLS)
    return pa.table({
        "column": pa.array(_PROFILE_COLS, type=pa.string()),
        "n_rows": pa.array(
            [prof[c]["n_rows"] for c in _PROFILE_COLS],
            type=pa.int64()),
        "n_nulls": pa.array(
            [prof[c]["n_nulls"] for c in _PROFILE_COLS],
            type=pa.int64()),
        "n_distinct": pa.array(
            [prof[c]["n_distinct"] for c in _PROFILE_COLS],
            type=pa.int64()),
    })


SQL_ORDERS_PROFILE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct FROM orders"""
    for c in _PROFILE_COLS)


def queries_r3k() -> dict:
    return {
        "orders_profile": q_orders_profile,
    }


def parity_sql_r3k() -> dict[str, str]:
    """DuckDB twins for the pytest parity gate (NOT driver oracles)."""
    return {
        "orders_profile": SQL_ORDERS_PROFILE,
    }
