"""Batch-X: snapshot diff + KMV distinct sketch."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_snapshot_diff_matches_oracle_recompute():
    """(status, n_urls) equals a single-process recompute that uses the
    INDEPENDENT oracle extractor + a dict keep-latest — and every diff
    class is non-empty on the planted fixture."""
    from oracle.extract import extract_one

    from text_extraction_ray.pipelines.queries_r3x import (_snapshot_pages,
                                                           q_snapshot_diff)

    got = q_snapshot_diff(SF_DIR)

    def snap_shas(tbl):
        rows = tbl.to_pylist()
        # duplicate urls inside a generation must differ in warc_ts,
        # otherwise the max-ts rule here wouldn't mirror the engine's
        # serialized-row tie-break
        seen = {}
        for r in rows:
            k = r["url"]
            assert k not in seen or seen[k]["warc_ts"] != r["warc_ts"]
            if k not in seen or r["warc_ts"] > seen[k]["warc_ts"]:
                seen[k] = r
        return {
            u: hashlib.sha256(
                (extract_one(u, r["html"] or b"", r["lang"] or "")
                 ["extracted_text"] or "").encode("utf-8")).hexdigest()[:16]
            for u, r in seen.items()}

    old_pages, new_pages = _snapshot_pages(SF_DIR)
    old, new = snap_shas(old_pages), snap_shas(new_pages)
    counts = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
    for u in set(old) | set(new):
        if u not in old:
            counts["added"] += 1
        elif u not in new:
            counts["removed"] += 1
        elif old[u] == new[u]:
            counts["unchanged"] += 1
        else:
            counts["changed"] += 1
    want = (pd.DataFrame(sorted(counts.items()),
                         columns=["status", "n_urls"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (want.n_urls > 0).all()


def test_kmv_exact_below_k_and_accuracy_above():
    """Groups with < k distinct keys report the EXACT count; a planted
    50 000-key group estimates within 4σ of truth (k=256 → σ≈6.3%)."""
    import ray.data

    from text_extraction_ray.pipelines.queries_r3x import (
        KMV_K, q_events_kmv_distinct)

    got = (q_events_kmv_distinct(SF_DIR).to_pandas()
           .set_index("event_type"))
    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    exact = ev.groupby("event_type").user_id.nunique()
    for t, n in exact.items():
        if n < KMV_K:
            assert got.loc[t, "n_distinct_est"] == n, t

    import pyarrow as pa

    from text_extraction_ray.pipelines.queries_r3x import kmv_partials

    n_true = 50_000
    big = pa.table({
        "user_id": pa.array(np.arange(n_true, dtype=np.int64)),
        "event_type": pa.array(["big"] * n_true),
    })
    ds = ray.data.from_arrow(big).repartition(8)
    parts = ds.map_batches(kmv_partials, batch_format="pyarrow")
    hv = np.unique(np.concatenate(
        [b["hv"].to_numpy() for b in parts.iter_batches(
            batch_format="pandas")]).view(np.uint64))
    u_k = (float(hv[KMV_K - 1]) + 1.0) / 2.0 ** 64
    est = (KMV_K - 1) / u_k
    assert abs(est - n_true) / n_true < 4 / np.sqrt(KMV_K)


def test_kmv_partition_invariant():
    """The estimate is a pure function of the key set — identical under
    different physical partitionings."""
    import ray.data

    import pyarrow as pa

    from ray.data.aggregate import Count

    from text_extraction_ray.pipelines.queries_r3x import kmv_partials

    t = pa.table({
        "user_id": pa.array((np.arange(5000, dtype=np.int64) * 7) % 1250),
        "event_type": pa.array((["a"] * 2500) + (["b"] * 2500)),
    })

    def run(n_parts):
        ds = ray.data.from_arrow(t).repartition(n_parts)
        parts = ds.map_batches(kmv_partials, batch_format="pyarrow")
        out = {}
        for b in parts.iter_batches(batch_format="pandas"):
            for g, v in zip(b["event_type"], b["hv"]):
                out.setdefault(g, set()).add(int(v))
        # global bottom-k in UNSIGNED order is the partition-invariant
        # part (the raw candidate union is a partitioning-dependent
        # superset of it)
        return {g: sorted(x & (2 ** 64 - 1) for x in vs)[:256]
                for g, vs in out.items()}

    assert run(2) == run(16)
