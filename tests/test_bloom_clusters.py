"""Bloom prefilter, adaptive salting, and pair-cluster tests (round 2)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def test_bloom_no_false_negatives_and_low_fp(ray_session):
    """Every build-side key passes (no false negatives — the correctness
    property); absent keys pass at roughly the designed fp rate."""
    from text_extraction_ray.functions.bloom import (
        _test_bits,
        build_bloom,
    )

    keys = list(range(0, 20000, 2))  # 10k even keys
    ds = ray.data.from_items([{"k": k} for k in keys],
                             override_num_blocks=8)
    bloom = build_bloom(ds, "k")
    present = _test_bits(np.asarray(keys, dtype=np.int64), bloom)
    assert present.all()  # zero false negatives
    absent = np.arange(1, 20000, 2, dtype=np.int64)  # odd keys
    fp_rate = _test_bits(absent, bloom).mean()
    # m=2^20 bits, n=10k, k=4 → theoretical fp ≈ 2e-6; allow slack
    assert fp_rate < 0.01, fp_rate


def test_bloom_prefilter_keeps_join_result(ray_session):
    from text_extraction_ray.functions.bloom import (
        bloom_prefilter,
        build_bloom,
    )

    probe = ray.data.from_items(
        [{"k": i, "v": i * 10} for i in range(5000)], override_num_blocks=4)
    build = ray.data.from_items(
        [{"k": i} for i in range(0, 5000, 50)], override_num_blocks=2)
    bloom = build_bloom(build, "k")
    kept = bloom_prefilter(probe, "k", bloom).to_pandas()
    assert set(range(0, 5000, 50)) <= set(kept["k"])  # all matches survive
    assert len(kept) < 5000  # and the probe side actually shrank


def test_adaptive_salting_matches_plain_groupby(ray_session):
    from text_extraction_ray.functions.skew import adaptive_salted_count_sum

    rs = np.random.RandomState(2)
    # one very hot key + a cold tail
    keys = ["hot"] * 5000 + [f"cold{i}" for i in range(200)]
    vals = rs.randint(0, 100, size=len(keys))
    ds = ray.data.from_items(
        [{"k": k, "v": int(v)} for k, v in zip(keys, vals)],
        override_num_blocks=8)
    out = adaptive_salted_count_sum(ds, "k", "v").to_pandas()
    got = dict(zip(out["k"], zip(out["n_rows"], out["sum_v"])))
    assert got["hot"] == (5000, int(vals[:5000].sum()))
    assert got["cold0"] == (1, int(vals[5000]))
    assert len(got) == 201


def test_neardup_clusters_union_find(ray_session):
    from text_extraction_ray.functions.dedup import neardup_clusters

    pairs = ray.data.from_items([
        {"id_a": 1, "id_b": 2}, {"id_a": 2, "id_b": 3},   # chain 1-2-3
        {"id_a": 10, "id_b": 11},                          # pair
        {"id_a": 3, "id_b": 1},                            # redundant edge
        {"id_a": 20, "id_b": 21}, {"id_a": 21, "id_b": 22},
        {"id_a": 22, "id_b": 20},                          # triangle
    ])
    out = neardup_clusters(pairs).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_distributed_clusters_match_union_find(ray_session):
    """Min-label propagation (no driver-side pairs) converges to exactly
    the union-find clusters, including a chain longer than one round's
    reach and an isolated pair."""
    import numpy as np

    from text_extraction_ray.functions.dedup import (
        neardup_clusters,
        neardup_clusters_distributed,
    )

    rs = np.random.RandomState(3)
    edges = [{"id_a": i, "id_b": i + 1} for i in range(100, 106)]  # chain
    edges += [{"id_a": 500, "id_b": 501}]
    # a small random cluster (path diameter bounds the round count)
    nodes = rs.choice(range(1000, 1012), size=8).tolist()
    edges += [{"id_a": int(a), "id_b": int(b)}
              for a, b in zip(nodes, nodes[1:]) if a != b]
    pairs = ray.data.from_items(edges)
    uf = neardup_clusters(pairs).to_pandas()
    lp = (neardup_clusters_distributed(ray.data.from_items(edges))
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    uf = uf.sort_values("doc_id").reset_index(drop=True)
    assert lp["doc_id"].tolist() == uf["doc_id"].tolist()
    assert lp["cluster_id"].tolist() == uf["cluster_id"].tolist()
