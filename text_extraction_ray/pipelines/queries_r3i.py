"""Round-3 continuation batch I: outer-join breadth, robust feature
clipping, DENSE_RANK, and iterative k-means.

Four operators: LEFT OUTER join with genuine unmatched rows (customers
against their big-order aggregate, null-filled), per-group
winsorization (clip at exact p01/p99 — the standard feature-prep
robustifier), DENSE_RANK (the tie-collapsing rank the ROW_NUMBER /
PERCENT_RANK family still lacked), and Lloyd's k-means over the
embedding column with deterministic init — the one genuinely ITERATIVE
operator: every pass is a broadcast-assign + mergeable partial-sum
reduction, centroids bounded by k × dim.

Registered rows-only (driver 50-row window frozen); DuckDB parity twins
run in tests/test_queries_r3i (k-means is iterative/non-SQL — pinned by
structural invariants instead)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

_PYA = {"batch_format": "pyarrow"}


def _read(sf_dir: str, table: str, columns: list[str],
          row_filter=None) -> ray.data.Dataset:
    from .queries import read_table

    return read_table(sf_dir, table, columns, row_filter=row_filter)


def _round_half_up(x: np.ndarray, digits: int) -> np.ndarray:
    q = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * q + 0.5) / q


# --- J13: LEFT OUTER join with null-fill ---------------------------------------

_BIG_ORDER = 400_000.0


def q_cust_big_orders_left(sf_dir: str) -> ray.data.Dataset:
    """Every customer with their big-order (> $400k) count and total —
    zero-filled for the many customers that have none, which is the
    whole point of LEFT OUTER.  The right side AGGREGATES BEFORE the
    join (per-customer totals are strictly smaller than raw orders), so
    the outer join moves two key-sized tables; the groupby output passes
    through repartition() to absorb acero-hostile empty blocks."""
    import pyarrow.dataset as pds

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    big = (_read(sf_dir, "orders", ["o_custkey", "o_totalprice"],
                 row_filter=pds.field("o_totalprice") > _BIG_ORDER)
           .groupby("o_custkey")
           .aggregate(Count(alias_name="n_big"),
                      Sum("o_totalprice", alias_name="big_total"))
           .repartition(8))
    joined = cust.join(big, join_type="left_outer", num_partitions=8,
                       on=("c_custkey",), right_on=("o_custkey",))

    def fill(b: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(b.column("n_big"), pa.int64()), 0)
        s = pc.fill_null(b.column("big_total"), 0.0)
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "c_nationkey": b.column("c_nationkey"),
            "n_big": n,
            "big_total": pa.array(_round_half_up(
                s.to_numpy(zero_copy_only=False), 2)),
        })

    return joined.map_batches(fill, **_PYA)


SQL_CUST_BIG_ORDERS_LEFT = f"""
SELECT c_custkey, c_nationkey,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_big,
       ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS big_total
FROM customer LEFT JOIN (
  SELECT * FROM orders WHERE o_totalprice > {_BIG_ORDER}
) ON c_custkey = o_custkey
GROUP BY 1, 2
"""


# --- X13: per-group winsorization ----------------------------------------------

def q_events_winsorize(sf_dir: str) -> ray.data.Dataset:
    """Clip value to its type's exact [p01, p99] — the robust
    alternative to dropping outliers.  Bounds come from the same
    bounded-domain cents histogram as median/MAD (one histogram-sized
    shuffle), broadcast once, then a vectorized per-row min/max; the
    fact rows never shuffle."""
    from .queries_r3g import _interp_quantile, _value_histogram

    hist = _value_histogram(sf_dir).take_all()
    bounds: dict = {}
    by_type: dict = {}
    for r in hist:
        by_type.setdefault(r["event_type"], []).append(
            (r["cents"], r["c"]))
    for t, rows in by_type.items():
        rows.sort()
        vals = np.array([v for v, _ in rows], dtype=np.int64) / 100.0
        cnts = np.array([c for _, c in rows], dtype=np.int64)
        bounds[t] = (_interp_quantile(vals, cnts, 0.01),
                     _interp_quantile(vals, cnts, 0.99))
    bref = ray.put(bounds)

    def clip(b: pa.Table) -> pa.Table:
        bmap = ray.get(bref)
        types = np.asarray(b.column("event_type").to_pylist(),
                           dtype=object)
        v = b.column("value").to_numpy(zero_copy_only=False).copy()
        for t in np.unique(types):
            lo, hi = bmap[t]
            m = types == t
            v[m] = np.minimum(np.maximum(v[m], lo), hi)
        return pa.table({
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
            "value_w": pa.array(_round_half_up(v, 6)),
        })

    return (_read(sf_dir, "events", ["event_id", "event_type", "value"])
            .map_batches(clip, **_PYA))


SQL_EVENTS_WINSORIZE = """
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS lo,
         quantile_cont(value, 0.99) AS hi
  FROM events GROUP BY 1)
SELECT event_id, e.event_type,
       ROUND(LEAST(GREATEST(value, lo), hi), 6) AS value_w
FROM events e JOIN b ON e.event_type = b.event_type
"""


# --- W14: DENSE_RANK ------------------------------------------------------------

def q_orders_dense_rank(sf_dir: str) -> ray.data.Dataset:
    """DENSE_RANK of order dates within each customer — equal dates
    share a rank and the next distinct date continues without a gap
    (the tie-collapsing member of the rank family; ROW_NUMBER and
    PERCENT_RANK shipped earlier).  Bucketed lexsort; the rank is a
    cumulative sum over new-(key or value) boundaries."""
    def add_bucket(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array((ck % 64).astype(np.int64)))

    def ranks(g: pa.Table) -> pa.Table:
        ck = g.column("o_custkey").to_numpy(zero_copy_only=False)
        ok = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        d = g.column("o_orderdate").combine_chunks().cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((d, ck))
        cks, oks, ds_ = ck[order], ok[order], d[order]
        n = len(cks)
        new_cust = np.concatenate(([True], cks[1:] != cks[:-1]))
        new_val = np.concatenate(([True], ds_[1:] != ds_[:-1])) | new_cust
        # dense rank = running count of distinct values since the
        # partition start: cumsum of new_val, rebased per partition
        cum = np.cumsum(new_val)
        base = np.repeat(cum[new_cust] - 1, np.diff(
            np.concatenate((np.flatnonzero(new_cust), [n]))))
        return pa.table({
            "o_orderkey": pa.array(oks),
            "o_custkey": pa.array(cks),
            "dr": pa.array((cum - base).astype(np.int64)),
        })

    return (_read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"])
            .map_batches(add_bucket, **_PYA)
            .groupby("bucket")
            .map_groups(ranks, batch_format="pyarrow"))


SQL_ORDERS_DENSE_RANK = """
SELECT o_orderkey, o_custkey,
       CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate) AS BIGINT) AS dr
FROM orders
"""


# --- E5: Lloyd's k-means over the embedding column -----------------------------

_KM_K = 8
_KM_ITERS = 5


def _km_centroids(sf_dir: str) -> tuple[np.ndarray, list[float]]:
    """Run the iterations; return (final centroids, per-iter inertia).
    Each iteration: broadcast centroids → per-batch partial
    (k × dim sums, k counts, batch inertia) → driver combine (bounded
    by k × dim × batches).  The embeddings themselves never shuffle and
    never materialize — the canonical iterative-ML shape on Ray Data."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    first = ds.filter(expr=f"vec_id < {_KM_K}").take_all()
    first.sort(key=lambda r: r["vec_id"])
    cents = np.array([r["embedding"] for r in first], dtype=np.float64)
    inertia: list[float] = []
    for _ in range(_KM_ITERS):
        cref = ray.put(cents)

        def partial(b: pa.Table) -> pa.Table:
            C = ray.get(cref)
            X = np.array(b.column("embedding").to_pylist(),
                         dtype=np.float64)
            d2 = ((X * X).sum(1)[:, None] - 2.0 * X @ C.T
                  + (C * C).sum(1)[None, :])
            a = d2.argmin(1)
            k, dim = C.shape
            sums = np.zeros((k, dim))
            np.add.at(sums, a, X)
            cnt = np.bincount(a, minlength=k).astype(np.float64)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "vec_sum": pa.array(list(sums)),
                "cnt": pa.array(cnt),
                "inertia": pa.array(
                    [float(d2[np.arange(len(a)), a].sum())] + [0.0]
                    * (k - 1)),
            })

        rows = ds.map_batches(partial, **_PYA).take_all()
        k, dim = cents.shape
        sums = np.zeros((k, dim))
        cnt = np.zeros(k)
        it_inertia = 0.0
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["vec_sum"])
            cnt[r["cluster"]] += r["cnt"]
            it_inertia += r["inertia"]
        nonzero = cnt > 0
        cents = np.where(nonzero[:, None], sums / np.maximum(
            cnt, 1.0)[:, None], cents)
        inertia.append(it_inertia)
    return cents, inertia


def q_embeddings_kmeans(sf_dir: str) -> ray.data.Dataset:
    """Final assignments after _KM_ITERS Lloyd iterations (deterministic
    init: the k smallest vec_ids).  Iterative and RNG-free, so the
    result is reproducible on any partitioning; no SQL twin exists —
    structural invariants (monotone inertia, argmin consistency, k
    clusters) pin it in pytest."""
    cents, _ = _km_centroids(sf_dir)
    cref = ray.put(cents)

    def assign(b: pa.Table) -> pa.Table:
        C = ray.get(cref)
        X = np.array(b.column("embedding").to_pylist(), dtype=np.float64)
        d2 = ((X * X).sum(1)[:, None] - 2.0 * X @ C.T
              + (C * C).sum(1)[None, :])
        a = d2.argmin(1)
        return pa.table({
            "vec_id": b.column("vec_id"),
            "cluster": pa.array(a.astype(np.int64)),
            "dist": pa.array(_round_half_up(np.sqrt(
                np.maximum(d2[np.arange(len(a)), a], 0.0)), 6)),
        })

    return (_read(sf_dir, "embeddings", ["vec_id", "embedding"])
            .map_batches(assign, **_PYA))


def queries_r3i() -> dict:
    return {
        "cust_big_orders_left": q_cust_big_orders_left,
        "events_winsorize": q_events_winsorize,
        "orders_dense_rank": q_orders_dense_rank,
        "embeddings_kmeans": q_embeddings_kmeans,
    }


def parity_sql_r3i() -> dict[str, str]:
    """DuckDB twins for the pytest parity gate (NOT driver oracles).
    embeddings_kmeans is iterative — structural pins instead."""
    return {
        "cust_big_orders_left": SQL_CUST_BIG_ORDERS_LEFT,
        "events_winsorize": SQL_EVENTS_WINSORIZE,
        "orders_dense_rank": SQL_ORDERS_DENSE_RANK,
    }
