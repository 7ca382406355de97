"""Sharded SHARED MUTABLE dedup index — the one shape the Dataset API
genuinely cannot express (SURVEY §2.0 S12, round 3).

Cross-RUN incremental exact dedup: shard K of today's crawl must know
what every earlier run already inserted.  A broadcast set can't do it
(the index MUTATES as the run progresses) and a groupby can't either
(state must persist across independent Dataset executions), so this is the
documented escape hatch: raw ``@ray.remote`` actors holding hash-
partitioned fingerprint dicts, called from inside ``map_batches`` tasks.

Partitioning assumption (same story as every shuffle in this repo): the
fingerprint space hash-partitions uniformly over ``n_shards`` actors, so
each actor holds ~|corpus|/n_shards entries and receives ~1/n_shards of
every batch's probe traffic.  At 100 TB you size ``n_shards`` to the
cluster and give each actor a spill dict / plasma-backed store; the
call pattern (ONE batched RPC per (map task, shard) pair, never per row)
is what keeps this from becoming an RPC storm.

Winner semantics: for fingerprints arriving in MULTIPLE concurrent
batches, exactly one doc wins (the actor's dict insert is atomic within
the actor); which one is scheduling-dependent — the same guarantee a
concurrent unique-index gives, asserted as set-semantics in tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray

_PYA = {"batch_format": "pyarrow"}


@ray.remote(num_cpus=0.25)
class DedupIndexShard:
    """One hash-partition of the fingerprint → first-doc index."""

    def __init__(self) -> None:
        self._index: dict[bytes, int] = {}

    def check_and_insert(self, fps: list[bytes],
                         doc_ids: list[int]) -> list[int]:
        """For each fingerprint: the already-registered owner doc_id, or
        -1 if this call inserted it (the caller's doc is the new owner).
        One message per (task, shard), amortized over the whole batch."""
        out = []
        idx = self._index
        for fp, doc_id in zip(fps, doc_ids):
            prev = idx.get(fp)
            if prev is None:
                idx[fp] = doc_id
                out.append(-1)
            else:
                out.append(prev)
        return out

    def size(self) -> int:
        return len(self._index)


def start_index(n_shards: int = 4) -> list:
    """Spawn the shard actors (hold the returned handles for the life of
    the multi-run session; re-created handles mean a fresh index)."""
    return [DedupIndexShard.remote() for _ in range(n_shards)]


def dedup_against_index(ds, shards: list, id_col: str = "doc_id",
                        text_col: str = "text"):
    """Mark every row as first-seen or duplicate AGAINST THE SHARED INDEX,
    inserting new fingerprints as it goes.  Returns Dataset[(id_col,
    is_first, owner_doc_id)] where owner == the row's own id for winners.

    Inside each map task: md5 fingerprints are computed vectorized-ish,
    partitioned by fp hash across shards, and each shard gets ONE
    ``check_and_insert`` RPC for its slice — results scatter back into
    row order.
    """
    n = len(shards)

    def probe(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        fps = [hashlib.md5((t or "").encode("utf-8")).digest()
               for t in b.column(text_col).to_pylist()]
        shard_of = [fp[0] % n for fp in fps]
        owner = np.empty(len(ids), dtype=np.int64)
        futures = []
        positions = []
        for s in range(n):
            pos = [i for i, sh in enumerate(shard_of) if sh == s]
            if not pos:
                continue
            futures.append(shards[s].check_and_insert.remote(
                [fps[i] for i in pos], [ids[i] for i in pos]))
            positions.append(pos)
        for pos, res in zip(positions, ray.get(futures)):
            for i, r in zip(pos, res):
                owner[i] = r
        is_first = owner == -1
        owner = np.where(is_first, np.asarray(ids, dtype=np.int64), owner)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "is_first": pa.array(is_first),
            "owner_doc_id": pa.array(owner, type=pa.int64()),
        })

    return ds.map_batches(probe, **_PYA)
