"""Zone maps: file-level min/max statistics harvested from parquet
FOOTERS, used to skip whole files before any row leaves storage.

`read_parquet` already pushes row-group predicates, but the scheduler
still opens every file; at 10^5 crawl shards the open+footer round
trips dominate selective scans.  A zone map turns that into a
driver-side pruning decision over a tiny stats table — the same idea
as Iceberg/Delta file statistics, rebuilt from plain parquet.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.dataset as pds
import pyarrow.parquet as pq

import ray.data


def build_zone_map(paths: list[str], col: str) -> pa.Table:
    """(path, min, max, n_rows) per file from footer metadata only —
    no row data is read.  Files lacking statistics get null bounds and
    are never pruned (safe default)."""
    rows = {"path": [], "lo": [], "hi": [], "n_rows": []}
    for p in paths:
        md = pq.ParquetFile(p).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema != col:
                    continue
                st = c.statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            else:
                continue
            break
        rows["path"].append(p)
        rows["lo"].append(lo)
        rows["hi"].append(hi)
        rows["n_rows"].append(md.num_rows)
    return pa.table(rows)


def prune_paths(zone_map: pa.Table, lo, hi) -> list[str]:
    """Files whose [min, max] interval overlaps [lo, hi] (null bounds
    always kept)."""
    keep = []
    for r in zone_map.to_pylist():
        if r["lo"] is None or r["hi"] is None:
            keep.append(r["path"])
        elif not (r["hi"] < lo or r["lo"] > hi):
            keep.append(r["path"])
    return keep


def read_parquet_zoned(paths: list[str], col: str, lo, hi,
                       columns: list[str] | None = None,
                       **read_kwargs) -> tuple[ray.data.Dataset, int]:
    """Range read `lo <= col <= hi`: zone-map file pruning first, then
    the exact row-group predicate on the survivors.  Returns (dataset,
    files_read) so callers/tests can assert the skip actually
    happened."""
    zmap = build_zone_map(paths, col)
    keep = prune_paths(zmap, lo, hi)
    if not keep:
        empty = pa.table({c: [] for c in (columns or [col])})
        return ray.data.from_arrow(empty), 0
    flt = (pds.field(col) >= lo) & (pds.field(col) <= hi)
    kwargs = dict(read_kwargs)
    if columns:
        kwargs["columns"] = columns
    return ray.data.read_parquet(keep, filter=flt, **kwargs), len(keep)
