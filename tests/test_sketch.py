"""Sketch operators (round 2): heavy hitters + quantile histogram."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

SF_DIR = "/root/testdata/sf0.01"


def test_heavy_tokens_candidate_superset(ray_session):
    """The two-pass design's core invariant: the per-batch candidate union
    contains EVERY token whose global share >= 1/ratio — checked against a
    brute-force count on an adversarial split (heavy token spread thinly
    across batches)."""
    from text_extraction_ray.functions.sketch import (
        count_tokens,
        heavy_tokens,
    )

    # 'pepper' is heavy globally (1/8 of tokens) but only one occurrence
    # per row, so no row-local majority; batches must still surface it.
    rows = [f"pepper w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g"
            for i in range(256)]
    ds = ray.data.from_items([{"text": t} for t in rows],
                             override_num_blocks=16)
    n = count_tokens(ds)
    assert n == 256 * 8
    out = heavy_tokens(ds, n, ratio=16).to_pandas()
    assert set(out["token"]) == {"pepper"}
    assert int(out["n_occurrences"].iloc[0]) == 256  # exact count


def test_heavy_tokens_counts_are_exact(ray_session):
    """Final counts equal a brute-force vocabulary count (the sketch only
    bounds the CANDIDATE set, never the reported numbers)."""
    import collections

    from text_extraction_ray.functions.sketch import (
        count_tokens,
        heavy_tokens,
    )

    rs = np.random.RandomState(5)
    vocab = [f"tok{i}" for i in range(50)]
    weights = np.array([50, 30, 20] + [1] * 47, dtype=np.float64)
    weights /= weights.sum()
    rows = [" ".join(rs.choice(vocab, size=20, p=weights)) for _ in range(200)]
    truth = collections.Counter(w for r in rows for w in r.split())
    total = sum(truth.values())
    ds = ray.data.from_items([{"text": t} for t in rows],
                             override_num_blocks=8)
    out = heavy_tokens(ds, count_tokens(ds), ratio=50).to_pandas()
    import math

    threshold = math.ceil(total / 50)
    want = {t: c for t, c in truth.items() if c >= threshold}
    got = dict(zip(out["token"], out["n_occurrences"]))
    assert got == want


def test_quantile_sketch_tracks_exact(ray_session):
    """Estimates stay within the log-bin resolution (~3.2%) of the exact
    per-group-sort quantiles on the documents table."""
    from text_extraction_ray.pipelines.queries_ext import (
        q_length_quantiles,
        q_length_quantiles_sketch,
    )

    exact = q_length_quantiles(SF_DIR).to_pandas().set_index("lang")
    approx = q_length_quantiles_sketch(SF_DIR).to_pandas()
    colmap = {0.5: "p50", 0.9: "p90", 0.99: "p99"}
    for _, row in approx.iterrows():
        want = float(exact.loc[row["lang"], colmap[row["quantile"]]])
        got = float(row["estimate"])
        assert abs(got - want) / want < 0.04, (
            row["lang"], row["quantile"], got, want)


def test_quantile_sketch_deterministic(ray_session):
    from text_extraction_ray.pipelines.queries_ext import (
        q_length_quantiles_sketch,
    )

    a = q_length_quantiles_sketch(SF_DIR).to_pandas()
    b = q_length_quantiles_sketch(SF_DIR).to_pandas()
    assert a.equals(b)


def test_hll_distinct_accuracy(ray_session):
    """HLL estimate within 5% of the exact distinct count on events, and
    on synthetic sets spanning two orders of magnitude."""
    from text_extraction_ray.functions.sketch import approx_distinct

    events = ray.data.read_parquet(f"{SF_DIR}/events.parquet",
                                   columns=["user_id"])
    exact = events.unique("user_id")
    est = approx_distinct(events, "user_id")
    assert abs(est - len(exact)) / len(exact) < 0.05

    for n in (100, 5000, 50000):
        ds = ray.data.from_items(
            [{"v": i * 7919 + 13} for i in range(n)],
            override_num_blocks=8)
        est = approx_distinct(ds, "v")
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_deterministic_and_merge_invariant(ray_session):
    """Same data, different block structure → identical estimate (the
    register merge is order/partition independent)."""
    from text_extraction_ray.functions.sketch import approx_distinct

    items = [{"v": i} for i in range(4000)]
    a = approx_distinct(ray.data.from_items(items, override_num_blocks=2), "v")
    b = approx_distinct(ray.data.from_items(items[::-1],
                                            override_num_blocks=16), "v")
    assert a == b


def test_hll_string_column(ray_session):
    from text_extraction_ray.functions.sketch import approx_distinct

    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                 columns=["source"])
    exact = len(docs.unique("source"))
    est = approx_distinct(docs, "source")
    assert abs(est - exact) <= max(1, 0.05 * exact)

    n = 3000
    ds = ray.data.from_items([{"s": f"url-{i}/page"} for i in range(n)],
                             override_num_blocks=6)
    est = approx_distinct(ds, "s")
    assert abs(est - n) / n < 0.05


def test_heavy_tokens_partition_invariant(ray_session):
    """Hypothesis-style sweep: the heavy-hitter result is identical under
    different block structures and row orders (the candidate superset
    guarantee must hold however batches split)."""
    import numpy as np

    from text_extraction_ray.functions.sketch import heavy_tokens

    rs = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(30)]
    weights = np.array([40, 25] + [1] * 28, dtype=np.float64)
    weights /= weights.sum()
    rows = [" ".join(rs.choice(vocab, size=15, p=weights))
            for _ in range(300)]
    results = []
    for blocks, order in ((2, 1), (16, 1), (5, -1), (11, -1)):
        ds = ray.data.from_items(
            [{"text": t} for t in rows[::order]],
            override_num_blocks=blocks)
        out = heavy_tokens(ds, ratio=30).to_pandas()
        results.append(sorted(zip(out["token"], out["n_occurrences"])))
    assert all(r == results[0] for r in results[1:])
    assert len(results[0]) >= 2  # the two heavy tokens are found
