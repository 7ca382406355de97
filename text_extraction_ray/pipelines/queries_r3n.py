"""Round-3 continuation batch N: ingestion-side windowed dedup (plus,
tested alongside: the CSV input shard format in pipelines/job.py and
the --materialize-query CTAS mode in run.py).

One registered query: tumbling-window deduplication — keep the FIRST
event per (user, type, hour), the idempotent-ingestion guard that
collapses at-least-once delivery retries.  Same bucketed-lexsort
machinery as the rank family; first-occurrence per composite key is a
boundary diff, no per-group Python.

Registered rows-only (driver 50-row window frozen); DuckDB parity twin
runs in tests/test_queries_r3n.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

_PYA = {"batch_format": "pyarrow"}


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    return col.combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False)


def q_events_dedup_hourly(sf_dir: str) -> ray.data.Dataset:
    """First event per (user_id, event_type, hour) in (ts, event_id)
    order.  Keys hash-bucket once; within a bucket the winner per
    composite key is the row after each lexsort boundary."""
    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array((ids % 64).astype(np.int64)))

    def first_per_window(g: pa.Table) -> pa.Table:
        user = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = _ts_us(g.column("ts"))
        types, tinv = np.unique(
            np.asarray(g.column("event_type").to_pylist(), dtype=object),
            return_inverse=True)
        hour = ts // 3_600_000_000
        order = np.lexsort((eid, ts, hour, tinv, user))
        u, t, h = user[order], tinv[order], hour[order]
        new = np.concatenate(([True],
                              (u[1:] != u[:-1]) | (t[1:] != t[:-1])
                              | (h[1:] != h[:-1])))
        keep = order[new]
        return pa.table({
            "event_id": pa.array(eid[keep]),
            "user_id": pa.array(user[keep]),
            "event_type": pa.array(
                types[tinv[keep]].tolist(), type=pa.string()),
            "hour": pa.array((hour[keep] * 3_600_000_000).astype(
                "datetime64[us]")),
        })

    return (_read(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type"])
            .map_batches(add_bucket, **_PYA)
            .groupby("bucket")
            .map_groups(first_per_window, batch_format="pyarrow"))


SQL_EVENTS_DEDUP_HOURLY = """
WITH r AS (
  SELECT event_id, user_id, event_type,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id) AS rn
  FROM events)
SELECT event_id, user_id, event_type, hour FROM r WHERE rn = 1
"""


def queries_r3n() -> dict:
    return {
        "events_dedup_hourly": q_events_dedup_hourly,
    }


def parity_sql_r3n() -> dict[str, str]:
    """DuckDB twins for the pytest parity gate (NOT driver oracles)."""
    return {
        "events_dedup_hourly": SQL_EVENTS_DEDUP_HOURLY,
    }
