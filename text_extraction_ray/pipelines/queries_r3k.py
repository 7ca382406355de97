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


def profile_column(ds: ray.data.Dataset, col: str) -> dict:
    """{n_rows, n_nulls, n_distinct} for one column, exactly, in one
    pass + one keyed aggregate.  Values stringify for the dedup key
    (str() is injective on distinct doubles/timestamps/ints); the
    shuffle moves batch-DISTINCT value rows plus two counter rows per
    batch — bounded by per-batch cardinality, never raw row count."""
    def fold(b: pa.Table) -> pa.Table:
        c = b.column(col)
        n = b.num_rows
        nulls = int(pc.sum(pc.is_null(c)).as_py() or 0)
        vals = c.drop_null().unique().to_pylist()
        keys = [f"v:{v}" for v in vals] + ["#rows", "#nulls"]
        cnts = [0] * len(vals) + [n, nulls]
        return pa.table({
            "k": pa.array(keys, type=pa.string()),
            "c": pa.array(cnts, type=pa.int64()),
        })

    rows = (ds.map_batches(fold, **_PYA)
            .groupby("k")
            .aggregate(Sum("c", alias_name="c"))
            .take_all())
    n_rows = n_nulls = n_distinct = 0
    for r in rows:
        if r["k"] == "#rows":
            n_rows = int(r["c"])
        elif r["k"] == "#nulls":
            n_nulls = int(r["c"])
        else:
            n_distinct += 1
    return {"n_rows": n_rows, "n_nulls": n_nulls,
            "n_distinct": n_distinct}


def q_orders_profile(sf_dir: str) -> pa.Table:
    """Long-format profile of every orders column."""
    out = {"column": [], "n_rows": [], "n_nulls": [], "n_distinct": []}
    for col in _PROFILE_COLS:
        p = profile_column(_read(sf_dir, "orders", [col]), col)
        out["column"].append(col)
        out["n_rows"].append(p["n_rows"])
        out["n_nulls"].append(p["n_nulls"])
        out["n_distinct"].append(p["n_distinct"])
    return pa.table({
        "column": pa.array(out["column"], type=pa.string()),
        "n_rows": pa.array(out["n_rows"], type=pa.int64()),
        "n_nulls": pa.array(out["n_nulls"], type=pa.int64()),
        "n_distinct": pa.array(out["n_distinct"], type=pa.int64()),
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
