"""Hot-KEY handling for ORDERED window operators (round 3).

``sessionize`` and the as-of join hash-shuffle every row of a key to one
reducer and scan the key's stream inside a single group — the right plan
while one key's stream fits one group (the PARTITIONING ASSUMPTION both
queries document).  A hot key (one user owning half the event stream)
breaks that: its group is the job, and at crawl scale it is the OOM.

This module implements the documented fallback: TIME-BUCKETED SUB-KEYS,
mirroring ``skew.adaptive_salted_count_sum``'s detect-then-split shape —
detect hot keys from a bounded sample, sub-key ONLY those by
``floor(ts / bucket_width)``, and merge per-bucket partial results with an
exact cross-boundary correction.  Unlike salting a commutative aggregate,
ordered windows can't use a round-robin salt: the sub-key must preserve
time locality, which is exactly what a ts-derived bucket does (buckets of
one key are disjoint, ordered time ranges).

Both operators return results EXACTLY equal to the single-group plan:

* sessions: a session boundary is a >gap jump between consecutive events;
  splitting the stream at bucket edges and subtracting one session per
  boundary whose inter-bucket gap is <= gap is an identity, not an
  approximation.
* as-of: a click resolves to the last purchase at-or-before it; the last
  purchase of every earlier bucket is a sufficient statistic, forward-
  filled over the (tiny) per-key bucket-summary table and re-joined as
  each bucket's incoming carry.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_PYA = {"batch_format": "pyarrow"}
DAY_US = 86_400 * 1_000_000


def _detect_hot(ds: ray.data.Dataset, key_col: str, sample_rows: int,
                hot_share: float) -> set:
    """Bounded-sample hot-key detection — same contract as
    skew.adaptive_salted_count_sum: the sample only decides WHICH keys get
    sub-keyed, never the numbers."""
    sample = ds.limit(sample_rows).take_batch(sample_rows, **_PYA)
    keys = sample.column(key_col).to_pylist()
    n = max(len(keys), 1)
    freq: dict = {}
    for k in keys:
        freq[k] = freq.get(k, 0) + 1
    return {k for k, c in freq.items() if c / n >= hot_share}


def _with_time_bucket(ds: ray.data.Dataset, key_col: str, ts_col: str,
                      hot: set, bucket_us: int) -> ray.data.Dataset:
    """Append ``bucket`` = floor(epoch_us / bucket_us) for hot keys,
    0 for cold keys (cold keys keep the single-group plan unchanged)."""
    hot_ref = ray.put(hot)

    def add_bucket(b: pa.Table) -> pa.Table:
        hset = ray.get(hot_ref)
        col = b.column(key_col)
        epoch = pc.cast(b.column(ts_col), pa.int64())  # microseconds
        buck = pc.divide(epoch, pa.scalar(bucket_us, pa.int64()))
        if hset:
            is_hot = pc.is_in(col, value_set=pa.array(list(hset),
                                                      type=col.type))
            buck = pc.if_else(is_hot, buck, pa.scalar(0, pa.int64()))
        else:
            buck = pa.array(np.zeros(b.num_rows, dtype=np.int64))
        return b.append_column("bucket", pc.cast(buck, pa.int64()))

    return ds.map_batches(add_bucket, **_PYA)


def sessionize_bucketed(ds: ray.data.Dataset, key_col: str, ts_col: str,
                        gap: _dt.timedelta, bucket_us: int = DAY_US,
                        sample_rows: int = 50_000,
                        hot_share: float = 0.05) -> ray.data.Dataset:
    """Gap-sessionization with hot-key time-bucketing.

    phase 1  groupby (key, bucket): per-bucket n_events, n_sessions,
             first/last event ts — group size bounded by bucket width,
             not by the key's total volume.
    phase 2  groupby key over BUCKET SUMMARIES (a handful of rows per key
             however hot it is): sort by bucket, subtract one session per
             adjacent-bucket boundary whose gap is <= the threshold.

    Returns (key_col, n_sessions, n_events) — exactly the single-group
    plan's output.
    """
    gap_us = int(gap.total_seconds() * 1_000_000)
    hot = _detect_hot(ds, key_col, sample_rows, hot_share)

    if not hot:
        # COLD fast path (the common case): no key is hot, so the
        # single-group plan is both safe and one groupby cheaper than
        # running everything through bucket 0 + merge.
        def whole_stream(g: pa.Table) -> pa.Table:
            ts = np.sort(pc.cast(g.column(ts_col), pa.int64())
                         .to_numpy(zero_copy_only=False))
            n_sessions = 1 + int((np.diff(ts) > gap_us).sum())
            return pa.table({
                key_col: g.column(key_col).slice(0, 1),
                "n_sessions": pa.array([n_sessions], type=pa.int64()),
                "n_events": pa.array([len(ts)], type=pa.int64()),
            })

        return ds.groupby(key_col).map_groups(whole_stream, **_PYA)

    def bucket_summary(g: pa.Table) -> pa.Table:
        ts = np.sort(pc.cast(g.column(ts_col), pa.int64())
                     .to_numpy(zero_copy_only=False))
        n_sessions = 1 + int((np.diff(ts) > gap_us).sum())
        return pa.table({
            key_col: g.column(key_col).slice(0, 1),
            "bucket": g.column("bucket").slice(0, 1),
            "ps_sessions": pa.array([n_sessions], type=pa.int64()),
            "ps_events": pa.array([len(ts)], type=pa.int64()),
            "first_ts": pa.array([int(ts[0])], type=pa.int64()),
            "last_ts": pa.array([int(ts[-1])], type=pa.int64()),
        })

    def merge(g: pa.Table) -> pa.Table:
        order = np.argsort(g.column("bucket").to_numpy(zero_copy_only=False))
        first = g.column("first_ts").to_numpy(zero_copy_only=False)[order]
        last = g.column("last_ts").to_numpy(zero_copy_only=False)[order]
        sess = g.column("ps_sessions").to_numpy(zero_copy_only=False)[order]
        nev = g.column("ps_events").to_numpy(zero_copy_only=False)[order]
        merged = int((first[1:] - last[:-1] <= gap_us).sum())
        return pa.table({
            key_col: g.column(key_col).slice(0, 1),
            "n_sessions": pa.array([int(sess.sum()) - merged],
                                   type=pa.int64()),
            "n_events": pa.array([int(nev.sum())], type=pa.int64()),
        })

    return (_with_time_bucket(ds, key_col, ts_col, hot, bucket_us)
            .groupby([key_col, "bucket"])
            .map_groups(bucket_summary, **_PYA)
            .groupby(key_col)
            .map_groups(merge, **_PYA))


def asof_join_bucketed(ds: ray.data.Dataset, key_col: str, ts_col: str,
                       id_col: str, type_col: str, value_col: str,
                       left_type: str, right_type: str,
                       bucket_us: int = DAY_US, sample_rows: int = 50_000,
                       hot_share: float = 0.05, num_partitions: int = 8,
                       out_col: str | None = None) -> ray.data.Dataset:
    """As-of join (each ``left_type`` row takes the same key's most recent
    ``right_type`` value at-or-before it, ordering key (ts, id)) with
    hot-key time-bucketing.

    phase 1  groupby (key, bucket): each bucket's OUTGOING carry — the
             value of its last right-typed row, if any (one summary row
             per non-empty bucket).
    phase 2  groupby key over carries: forward-fill along the bucket axis
             → each bucket's INCOMING carry (still a tiny table).
    phase 3  left-outer join events to incoming carries on (key, bucket),
             then groupby (key, bucket): vectorized in-group scan seeded
             with the carry.  Group size is bounded by the bucket, and a
             left row never needs any individual right row from another
             bucket — the carry is a sufficient statistic.

    Returns (id_col, key_col, last_<value_col>) rows for every left-typed
    row that resolves — exactly the single-group plan's output.
    """
    hot = _detect_hot(ds, key_col, sample_rows, hot_share)
    out_val = out_col or f"last_{value_col}"

    def resolve(g: pa.Table) -> pa.Table:
        ts = pc.cast(g.column(ts_col), pa.int64()
                     ).to_numpy(zero_copy_only=False)
        eid = g.column(id_col).to_numpy(zero_copy_only=False)
        et = np.asarray(g.column(type_col).to_pylist())
        val = g.column(value_col).to_numpy(zero_copy_only=False)
        key = g.column(key_col)[0].as_py()
        seed_valid = False
        seed = 0.0
        if "in_carry" in g.schema.names:
            ic = g.column("in_carry").to_numpy(zero_copy_only=False)
            seed_valid = not np.isnan(ic).all()
            if seed_valid:
                seed = float(ic[~np.isnan(ic)][0])
        order = np.lexsort((eid, ts))
        eid, et, val = eid[order], et[order], val[order]
        pidx = np.where(et == right_type, np.arange(len(et)), -1)
        pidx = np.maximum.accumulate(pidx)
        keep = (et == left_type) & ((pidx >= 0) | seed_valid)
        resolved = np.where(pidx[keep] >= 0,
                            val[np.maximum(pidx[keep], 0)], seed)
        return pa.table({
            id_col: pa.array(eid[keep], type=pa.int64()),
            key_col: pa.array(
                np.full(int(keep.sum()), key, dtype=np.int64)),
            out_val: pa.array(resolved, type=pa.float64()),
        })

    if not hot:
        # COLD fast path: skip bucketing, carries and the join entirely —
        # the single-group scan (seedless resolve) is exact when no key
        # is hot.
        return ds.groupby(key_col).map_groups(resolve, **_PYA)

    bucketed = _with_time_bucket(ds, key_col, ts_col, hot, bucket_us)

    def out_carry(g: pa.Table) -> pa.Table:
        """One summary row per NON-EMPTY bucket — carry is null when the
        bucket has no right-typed row, so a click-only bucket still gets
        an in_carry row from earlier buckets' forward-fill."""
        et = np.asarray(g.column(type_col).to_pylist())
        rmask = et == right_type
        if not rmask.any():
            return pa.table({
                key_col: g.column(key_col).slice(0, 1),
                "bucket": g.column("bucket").slice(0, 1),
                "carry": pa.nulls(1, type=pa.float64()),
            })
        ts = pc.cast(g.column(ts_col), pa.int64()
                     ).to_numpy(zero_copy_only=False)
        eid = g.column(id_col).to_numpy(zero_copy_only=False)
        val = g.column(value_col).to_numpy(zero_copy_only=False)
        ridx = np.flatnonzero(rmask)
        best = ridx[np.lexsort((eid[ridx], ts[ridx]))[-1]]
        return pa.table({
            key_col: g.column(key_col).slice(0, 1),
            "bucket": g.column("bucket").slice(0, 1),
            "carry": pa.array([float(val[best])], type=pa.float64()),
        })

    def in_carry(g: pa.Table) -> pa.Table:
        """bucket b's incoming carry = last NON-NULL outgoing carry of any
        bucket strictly before it (forward-fill over the sorted bucket
        axis); emit only buckets whose incoming carry exists."""
        buck = g.column("bucket").to_numpy(zero_copy_only=False)
        order = np.argsort(buck)
        carry = g.column("carry").to_numpy(zero_copy_only=False)[order]
        # shift, then ffill nans with the last seen value
        shifted = np.concatenate(([np.nan], carry[:-1]))
        valid = ~np.isnan(shifted)
        idx = np.maximum.accumulate(np.where(valid,
                                             np.arange(len(shifted)), -1))
        filled = np.where(idx >= 0, shifted[np.maximum(idx, 0)], np.nan)
        keep = ~np.isnan(filled)
        return pa.table({
            key_col: pc.take(g.column(key_col),
                             pa.array(order[keep], type=pa.int64())),
            "bucket": pa.array(buck[order][keep], type=pa.int64()),
            "in_carry": pa.array(filled[keep], type=pa.float64()),
        })

    carries = (bucketed
               .groupby([key_col, "bucket"])
               .map_groups(out_carry, **_PYA)
               .groupby(key_col)
               .map_groups(in_carry, **_PYA)
               # absorb schema-less empty reduce blocks before the join
               # (acero rejects them; map UDFs never see 0-column blocks)
               .repartition(4)
               # bounded by construction: <= one row per (hot key, bucket)
               .materialize())

    if carries.count() == 0:
        # no key spans multiple buckets (the all-cold common case):
        # skip the join, seed nothing
        def null_carry(b: pa.Table) -> pa.Table:
            return b.append_column(
                "in_carry", pa.nulls(b.num_rows, type=pa.float64()))

        joined = bucketed.map_batches(null_carry, **_PYA)
    else:
        joined = bucketed.join(carries, join_type="left_outer",
                               num_partitions=num_partitions,
                               on=(key_col, "bucket"))

    return (joined.groupby([key_col, "bucket"])
            .map_groups(resolve, **_PYA))
