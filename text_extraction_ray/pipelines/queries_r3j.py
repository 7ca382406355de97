"""Round-3 continuation batch J: skew-aware joins + streaming-window
semantics done batch-side.

Two queries: a hybrid hot-key/broadcast join of events against a
per-user dimension (the celebrity-key survival plan — see
``functions/skew.py:skew_broadcast_join``), and tumbling windows with
WATERMARK lateness accounting (arrival = event time + deterministic
md5 jitter; an event is late when the event-time high-water-mark of
everything that ARRIVED before it had already passed its timestamp by
more than the allowed lateness).  The high-water-mark is a global
running max over arrival order — computed as a DISTRIBUTED PREFIX SCAN:
arrival-range buckets, per-bucket maxes, a driver-side exclusive
cumulative over the bounded bucket list broadcast back as carry-ins.

Registered rows-only (driver 50-row window frozen); DuckDB parity twins
run in tests/test_queries_r3j.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

_PYA = {"batch_format": "pyarrow"}


def _read(sf_dir: str, table: str, columns: list[str],
          row_filter=None) -> ray.data.Dataset:
    from .queries import read_table

    return read_table(sf_dir, table, columns, row_filter=row_filter)


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    return col.combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False)


# --- J14: skew-aware hybrid join -----------------------------------------------

def q_events_skew_join(sf_dir: str) -> ray.data.Dataset:
    """Every event enriched with its user's first-seen time and total
    event count (a per-user dimension DERIVED distributed from the same
    table), through the hybrid skew join: hot users (detected from a
    bounded sample) broadcast, cold users hash-join.  On this corpus the
    user distribution is uniform so the cold path carries everything —
    the hot path is exercised by the skewed-fixture pytest; either route
    returns exactly the inner join's rows."""
    from ..functions.skew import skew_broadcast_join

    def prep_dim(b: pa.Table) -> pa.Table:
        return pa.table({
            "d_user": b.column("user_id"),
            "ts_us": pa.array(_ts_us(b.column("ts"))),
        })

    dim = (_read(sf_dir, "events", ["user_id", "ts"])
           .map_batches(prep_dim, **_PYA)
           .groupby("d_user")
           .aggregate(Min("ts_us", alias_name="first_us"),
                      Count(alias_name="n_user"))
           .repartition(8))
    fact = _read(sf_dir, "events", ["event_id", "user_id"])
    joined = skew_broadcast_join(fact, dim, "user_id", "d_user",
                                 hot_share=0.05)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "first_us": pc.cast(b.column("first_us"), pa.int64()),
            "n_user": pc.cast(b.column("n_user"), pa.int64()),
        })

    return joined.map_batches(finish, **_PYA)


SQL_EVENTS_SKEW_JOIN = """
WITH d AS (
  SELECT user_id AS d_user,
         MIN(epoch_us(ts)) AS first_us,
         CAST(COUNT(*) AS BIGINT) AS n_user
  FROM events GROUP BY 1)
SELECT event_id, user_id, first_us, n_user
FROM events JOIN d ON user_id = d_user
"""


# --- W15: tumbling windows with watermark lateness -----------------------------

_JITTER_S = 600          # arrival = ts + md5(event_id) % 600 seconds
_LATENESS_US = 300_000_000   # 5-minute allowed lateness
_N_BUCKETS = 256


def _arrival_us(event_ids: np.ndarray, ts_us: np.ndarray) -> np.ndarray:
    jit = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
         % _JITTER_S for i in event_ids.tolist()], dtype=np.int64)
    return ts_us + jit * 1_000_000


def q_events_late_windows(sf_dir: str) -> ray.data.Dataset:
    """Hourly tumbling windows split into on-time vs late arrivals under
    a 5-minute watermark, with arrival simulated as event time + ≤10 min
    deterministic jitter.  The lateness test needs the EVENT-TIME
    high-water-mark of every earlier ARRIVAL — a global exclusive
    running max, computed as a distributed prefix scan:

      pass 1  bucket by arrival range; per-bucket Max (tiny aggregate)
      driver  exclusive cumulative max over the ≤256 bucket maxes
      pass 2  per bucket: carry-in ∨ local exclusive prefix max
              (vectorized), flag late, pre-aggregate per window

    Raw events shuffle once (into scan buckets); everything after is
    window-sized."""
    def prep(b: pa.Table) -> pa.Table:
        us = _ts_us(b.column("ts"))
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": pa.array(eid),
            "ts_us": pa.array(us),
            "arr_us": pa.array(_arrival_us(eid, us)),
        })

    rows = _read(sf_dir, "events", ["event_id", "ts"]
                 ).map_batches(prep, **_PYA)
    bounds = rows.aggregate(Min("arr_us"), Max("arr_us"))
    lo, hi = int(bounds["min(arr_us)"]), int(bounds["max(arr_us)"])
    span = max(hi - lo + 1, 1)

    def add_bucket(b: pa.Table) -> pa.Table:
        arr = b.column("arr_us").to_numpy(zero_copy_only=False)
        bk = ((arr - lo) * _N_BUCKETS // span).astype(np.int64)
        return b.append_column("bucket", pa.array(bk))

    bucketed = rows.map_batches(add_bucket, **_PYA)
    maxes = (bucketed.groupby("bucket")
             .aggregate(Max("ts_us", alias_name="mx"))
             .take_all())
    carry = np.full(_N_BUCKETS, np.iinfo(np.int64).min, dtype=np.int64)
    mx_by_bucket = {r["bucket"]: r["mx"] for r in maxes}
    running = np.iinfo(np.int64).min
    for bk in range(_N_BUCKETS):
        carry[bk] = running
        running = max(running, mx_by_bucket.get(bk, running))
    carry_ref = ray.put(carry)

    def flag(g: pa.Table) -> pa.Table:
        cin = ray.get(carry_ref)
        arr = g.column("arr_us").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        bk = int(g.column("bucket")[0].as_py())
        order = np.lexsort((eid, arr))
        ts_o = ts[order]
        # exclusive running max within the bucket, seeded by the carry
        hwm = np.empty(len(ts_o), dtype=np.int64)
        if len(ts_o):
            hwm[0] = cin[bk]
            run = np.maximum.accumulate(ts_o)
            hwm[1:] = np.maximum(run[:-1], cin[bk])
        # compare without subtraction: hwm may be the int64.min sentinel
        # (no preceding arrival) and hwm - ts would wrap
        late = hwm > ts_o + _LATENESS_US
        win = (ts_o // 3_600_000_000) * 3_600_000_000
        key, inv = np.unique(win * 2 + late.astype(np.int64),
                             return_inverse=True)
        cnt = np.bincount(inv)
        return pa.table({
            "win_us": pa.array(key // 2),
            "is_late": pa.array((key % 2).astype(np.bool_)),
            "n_part": pa.array(cnt.astype(np.int64)),
        })

    def finish(b: pa.Table) -> pa.Table:
        win = b.column("win_us").to_numpy(zero_copy_only=False)
        ont = b.column("n_ontime").to_numpy(zero_copy_only=False)
        late = b.column("n_late").to_numpy(zero_copy_only=False)
        return pa.table({
            "window_start": pa.array(win.astype("datetime64[us]")),
            "n_ontime": pa.array(ont.astype(np.int64)),
            "n_late": pa.array(late.astype(np.int64)),
        })

    def pivot_late(b: pa.Table) -> pa.Table:
        win = b.column("win_us").to_numpy(zero_copy_only=False)
        islate = b.column("is_late").to_numpy(zero_copy_only=False)
        n = b.column("n_part").to_numpy(zero_copy_only=False)
        return pa.table({
            "win_us": pa.array(win),
            "ontime_part": pa.array(np.where(islate, 0, n)),
            "late_part": pa.array(np.where(islate, n, 0)),
        })

    return (bucketed.groupby("bucket")
            .map_groups(flag, batch_format="pyarrow")
            .map_batches(pivot_late, **_PYA)
            .groupby("win_us")
            .aggregate(Sum("ontime_part", alias_name="n_ontime"),
                       Sum("late_part", alias_name="n_late"))
            .map_batches(finish, **_PYA))


SQL_EVENTS_LATE_WINDOWS = f"""
WITH a AS (
  SELECT event_id, ts,
         ts + to_seconds(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                         1, 8))::BIGINT % {_JITTER_S})
           AS arr
  FROM events),
w AS (
  SELECT event_id, ts,
         MAX(ts) OVER (ORDER BY arr, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS hwm
  FROM a)
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       CAST(COUNT(*) FILTER (hwm IS NULL OR
            epoch_us(hwm) - epoch_us(ts) <= {_LATENESS_US}) AS BIGINT)
         AS n_ontime,
       CAST(COUNT(*) FILTER (hwm IS NOT NULL AND
            epoch_us(hwm) - epoch_us(ts) > {_LATENESS_US}) AS BIGINT)
         AS n_late
FROM w GROUP BY 1
"""


def queries_r3j() -> dict:
    return {
        "events_skew_join": q_events_skew_join,
        "events_late_windows": q_events_late_windows,
    }


def parity_sql_r3j() -> dict[str, str]:
    """DuckDB twins for the pytest parity gate (NOT driver oracles)."""
    return {
        "events_skew_join": SQL_EVENTS_SKEW_JOIN,
        "events_late_windows": SQL_EVENTS_LATE_WINDOWS,
    }
