"""Distributed top-k without a full sort (SURVEY K1).

``Dataset.sort().limit(k)`` range-shuffles EVERY row to order the whole
dataset, then throws away all but k — at 100 TB that is the single most
expensive way to get 10 rows.  The canonical plan instead:

  map_batches: per-block local top-k  (k rows survive per block)
  sort+limit over the survivors        (<= k x n_blocks rows move)

Identical result for any total ordering (ties must be broken by the key
columns themselves — pass a unique tiebreaker column, as all callers here
do), with the shuffle reduced from O(N) to O(k x blocks).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def topk(ds: ray.data.Dataset, keys: list[str], k: int,
         descending: list[bool] | None = None) -> ray.data.Dataset:
    """Top-k rows by ``keys`` (ties broken by the trailing keys; make the
    last key unique for a deterministic result)."""
    desc = descending or [True] * len(keys)
    order = [(c, "descending" if d else "ascending")
             for c, d in zip(keys, desc)]

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        return b.sort_by(order).slice(0, k)

    pruned = ds.map_batches(local, batch_format="pyarrow")
    return pruned.sort(keys, descending=desc).limit(k)
