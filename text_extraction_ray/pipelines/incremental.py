"""Incremental aggregate maintenance: the materialized-view half of the
re-crawl loop (pipelines/refresh.py is the extraction half).

A daily dashboard over 100 TB cannot re-aggregate history every time a
new shard lands.  Because the engine's aggregates are MERGEABLE
partials (counts/sums are associative), yesterday's aggregate + the
delta's aggregate combine by one keyed sum — cost proportional to the
DELTA, never to history.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum


def merge_aggregates(prev: pa.Table | None, delta: pa.Table,
                     keys: list[str], sums: list[str]) -> pa.Table:
    """Combine two aggregate tables by summing ``sums`` per ``keys``.
    Both inputs are AGGREGATES (key-domain sized) — driver-side concat +
    group is bounded no matter how much raw data produced them."""
    parts = [t for t in (prev, delta) if t is not None and t.num_rows]
    if not parts:
        return delta
    both = pa.concat_tables(parts, promote_options="default")
    return pa.TableGroupBy(both, keys).aggregate(
        [(c, "sum") for c in sums]).rename_columns(keys + sums)


def incremental_daily_counts(delta: ray.data.Dataset,
                             prev: pa.Table | None = None) -> pa.Table:
    """Maintained (day, event_type) → n over an event stream: aggregate
    ONLY the delta distributed, then merge with the previous state.
    Equal to a full recompute over prev's input ∪ delta by
    associativity (pinned in pytest)."""
    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.floor_temporal(b.column("ts"), unit="day"),
            "event_type": b.column("event_type"),
        })

    delta_agg = (delta.map_batches(prep, batch_format="pyarrow")
                 .map_batches(lambda b: b.append_column(
                     "n", pa.array([1] * b.num_rows, type=pa.int64())),
                     batch_format="pyarrow")
                 .groupby(["day", "event_type"])
                 .aggregate(Sum("n", alias_name="n")))
    delta_table = pa.concat_tables(
        [b for b in delta_agg.iter_batches(batch_format="pyarrow")])
    merged = merge_aggregates(prev, delta_table,
                              ["day", "event_type"], ["n"])
    return merged.sort_by([("day", "ascending"),
                           ("event_type", "ascending")])
