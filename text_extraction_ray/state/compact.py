"""Small-file compaction: long-running crawl jobs accumulate thousands
of tiny parquet shards (one per retry / per incremental refresh / per
straggler partition); read planning and footer fetches then dominate
every downstream scan.  Compaction rewrites a directory into
≈ target-row-count files without changing a single row.

Streaming and atomic: rows pass through the object store block-wise
(never a driver-side table), the new fileset lands in a `.compact-tmp`
sibling first, and the swap is two renames — a crash before the swap
leaves the original directory untouched."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

import ray.data


def compact_parquet_dir(src_dir: str,
                        target_rows_per_file: int = 1_000_000
                        ) -> dict:
    """Rewrite every `*.parquet` under ``src_dir`` into
    ceil(total_rows / target_rows_per_file) files.  Returns
    {files_before, files_after, n_rows}.  Row count is read from
    footers (cheap) to size the output without an extra data pass."""
    paths = sorted(
        os.path.join(src_dir, f) for f in os.listdir(src_dir)
        if f.endswith(".parquet"))
    if not paths:
        return {"files_before": 0, "files_after": 0, "n_rows": 0}
    n_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    n_out = max(1, -(-n_rows // target_rows_per_file))
    tmp_dir = src_dir.rstrip("/") + ".compact-tmp"
    old_dir = src_dir.rstrip("/") + ".compact-old"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    (ray.data.read_parquet(paths)
     .repartition(n_out)
     .write_parquet(tmp_dir))
    # atomic-enough swap: two renames; a crash in between leaves
    # `.compact-old` for manual recovery, never a half-written mix
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(src_dir, old_dir)
    os.rename(tmp_dir, src_dir)
    shutil.rmtree(old_dir)
    files_after = len([f for f in os.listdir(src_dir)
                       if f.endswith(".parquet")])
    return {"files_before": len(paths), "files_after": files_after,
            "n_rows": n_rows}
