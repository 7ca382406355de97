"""Schema-evolution parquet reads: crawl archives accumulate shards
written by different pipeline versions — columns appear, disappear, and
widen over time.  ``read_parquet_evolving`` unifies them against one
target schema so downstream operators see a single stable shape:

  * missing columns materialize as typed nulls
  * extra columns are dropped (never read off disk at all — pruning
    happens per shard against that shard's OWN schema)
  * compatible types (int widths, float widths) cast to the target

Only parquet FOOTERS are read on the driver (one metadata fetch per
shard); row data streams through the normal pruned `read_parquet` path
per shard group, then unions.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def _conform_factory(target: pa.Schema):
    def conform(b: pa.Table) -> pa.Table:
        cols = {}
        for field in target:
            if field.name in b.schema.names:
                col = b.column(field.name)
                if col.type != field.type:
                    col = col.cast(field.type)
                cols[field.name] = col
            else:
                cols[field.name] = pa.nulls(b.num_rows, field.type)
        return pa.table(cols)

    return conform


def read_parquet_evolving(paths: list[str], target: pa.Schema,
                          **read_kwargs) -> ray.data.Dataset:
    """One Dataset over shards with heterogeneous schemas.  Shards are
    grouped by their (footer-derived) usable column set so each group is
    ONE pruned read_parquet call — per-shard datasets would serialize
    the read layer at 10^5 shards; groups are bounded by the number of
    distinct historical schemas (a handful in practice)."""
    groups: dict[tuple, list[str]] = {}
    for p in paths:
        names = set(pq.read_schema(p).names)
        usable = tuple(f.name for f in target if f.name in names)
        groups.setdefault(usable, []).append(p)
    parts = []
    conform = _conform_factory(target)
    for usable, group_paths in sorted(groups.items()):
        ds = ray.data.read_parquet(group_paths,
                                   columns=list(usable) or None,
                                   **read_kwargs)
        parts.append(ds.map_batches(conform, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
