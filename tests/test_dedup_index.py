"""Shared mutable dedup index (state/dedup_index.py): cross-run exact
dedup through sharded raw actors — the documented Dataset-API escape
hatch.  Winner semantics are set-based (exactly one owner per
fingerprint group; which doc wins under concurrency is scheduling-
dependent, like any concurrent unique index)."""

import pyarrow as pa

import ray
import ray.data

from text_extraction_ray.state.dedup_index import (
    dedup_against_index,
    start_index,
)


def _tbl(ids, texts):
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })


def test_cross_run_dedup_persists_across_dataset_executions(ray_session):
    shards = start_index(n_shards=3)
    run1 = ray.data.from_arrow(_tbl(
        [1, 2, 3, 4], ["alpha", "beta", "alpha", "gamma"]))
    out1 = (dedup_against_index(run1, shards)
            .to_pandas().set_index("doc_id"))
    # within run 1: 'alpha' has exactly one owner shared by docs 1 and 3
    assert set(out1.index) == {1, 2, 3, 4}
    owners_alpha = {out1.loc[1, "owner_doc_id"], out1.loc[3, "owner_doc_id"]}
    assert len(owners_alpha) == 1 and owners_alpha <= {1, 3}
    assert int(out1["is_first"].sum()) == 3  # alpha once, beta, gamma

    # run 2 (a SEPARATE Dataset execution): previously-seen texts are
    # duplicates, new text is first — state genuinely persisted
    run2 = ray.data.from_arrow(_tbl(
        [10, 11, 12], ["beta", "delta", "gamma"]))
    out2 = (dedup_against_index(run2, shards)
            .to_pandas().set_index("doc_id"))
    assert not out2.loc[10, "is_first"]
    assert out2.loc[10, "owner_doc_id"] == 2
    assert out2.loc[11, "is_first"]
    assert out2.loc[11, "owner_doc_id"] == 11
    assert not out2.loc[12, "is_first"]
    assert out2.loc[12, "owner_doc_id"] == 4

    # index size across shards == distinct fingerprints ever seen
    total = sum(ray.get([s.size.remote() for s in shards]))
    assert total == 4  # alpha beta gamma delta, nothing double-counted


def test_concurrent_batches_elect_exactly_one_owner(ray_session):
    """Many concurrent tasks inserting the same fingerprints: every
    fingerprint group ends with exactly ONE is_first winner and every
    member agrees on the owner."""
    shards = start_index(n_shards=2)
    ids = list(range(1000))
    texts = [f"text-{i % 37}" for i in ids]  # 37 groups, heavy contention
    ds = ray.data.from_arrow(_tbl(ids, texts)).repartition(16)
    out = dedup_against_index(ds, shards).to_pandas()
    out["grp"] = out["doc_id"] % 37
    for _, g in out.groupby("grp"):
        assert int(g["is_first"].sum()) == 1
        winners = set(g["owner_doc_id"])
        assert len(winners) == 1
        assert winners.pop() == g[g["is_first"]]["doc_id"].iloc[0]
    total = sum(ray.get([s.size.remote() for s in shards]))
    assert total == 37
