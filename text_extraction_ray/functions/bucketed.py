"""Hash-bucketed parquet layout: write once, join forever without a
shuffle.

At 100 TB the dominant cost of a repeated join is re-shuffling the
same fact table every run.  The classic fix is to PAY THE SHUFFLE
ONCE at write time: partition the table into ``bucket =
splitmix64(key) % B`` directories, and co-bucketed tables then join
bucket-by-bucket in independent map tasks — each task reads bucket k
of both sides and joins locally; no exchange, no driver
materialization, and B controls task granularity ("pick ONE
partitioning key and reuse it across stages").

``write_bucketed`` appends the bucket column inside ``map_batches``
and lets ``write_parquet(partition_cols=["bucket"])`` lay the
directories out.  ``bucketed_join`` fans one Ray task per bucket via
``from_items(range(B)) → flat ``map_batches`` (batch_size=1); the
bucket reads happen INSIDE the tasks (pruned to the join+carry
columns), so the driver never touches row data.  The same splitmix64
mix on both sides guarantees co-location; pyarrow's local hash join
does the per-bucket work.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data


def bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """splitmix64 finalizer % B — patterned int keys (sequential ids)
    spread uniformly instead of striping."""
    x = keys.astype(np.int64).view(np.uint64).copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x % np.uint64(n_buckets)).astype(np.int64)


def write_bucketed(ds: ray.data.Dataset, out_dir: str, key_col: str,
                   n_buckets: int = 16) -> str:
    def tag(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array(bucket_of(keys, n_buckets)))

    (ds.map_batches(tag, batch_format="pyarrow")
       .write_parquet(out_dir, partition_cols=["bucket"]))
    return out_dir


def bucketed_join(dir_a: str, dir_b: str, key_a: str, key_b: str,
                  n_buckets: int = 16,
                  columns_a: list[str] | None = None,
                  columns_b: list[str] | None = None) -> ray.data.Dataset:
    """Co-bucketed equi-join: one task per bucket, zero shuffle.

    Both directories must have been written by ``write_bucketed`` with
    the SAME ``n_buckets`` (asserted against the on-disk layout)."""
    for d in (dir_a, dir_b):
        seen = {p for p in os.listdir(d) if p.startswith("bucket=")}
        want = {f"bucket={k}" for k in range(n_buckets)}
        if not seen <= want:
            raise ValueError(
                f"{d}: on-disk buckets {sorted(seen - want)[:3]}… do not "
                f"match n_buckets={n_buckets}")

    def join_bucket(b: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = []
        for k in b.column("k").to_pylist():
            parts = []
            for d, cols, key in ((dir_a, columns_a, key_a),
                                 (dir_b, columns_b, key_b)):
                p = os.path.join(d, f"bucket={k}")
                if not os.path.isdir(p):
                    parts.append(None)
                    continue
                want = None
                if cols is not None:
                    want = list(dict.fromkeys([key] + cols))
                parts.append(pq.read_table(p, columns=want))
            ta, tb = parts
            if ta is None or tb is None or not ta.num_rows \
                    or not tb.num_rows:
                continue
            out.append(ta.join(tb, keys=[key_a], right_keys=[key_b],
                               join_type="inner"))
        if not out:
            # schema-stable empty result (inner join of empty buckets)
            import pyarrow.parquet as pq2

            def first_schema(d, cols, key):
                for root, _dirs, files in os.walk(d):
                    for f in sorted(files):
                        if f.endswith(".parquet"):
                            s = pq2.read_schema(os.path.join(root, f))
                            names = (list(dict.fromkeys([key] + cols))
                                     if cols is not None else
                                     [n for n in s.names
                                      if n != "bucket"])
                            return [(n, s.field(n).type) for n in names]
                return []

            fa = first_schema(dir_a, columns_a, key_a)
            fb = [x for x in first_schema(dir_b, columns_b, key_b)
                  if x[0] != key_b]
            return pa.table(
                {n: pa.array([], t) for n, t in fa + fb})
        return pa.concat_tables(out, promote_options="default")

    items = [{"k": k} for k in range(n_buckets)]
    return (ray.data.from_items(items)
            .map_batches(join_bucket, batch_size=1,
                         batch_format="pyarrow"))
