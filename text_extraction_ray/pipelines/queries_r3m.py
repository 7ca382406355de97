"""Round-3 continuation batch M: referential integrity, GLOBAL NTILE by
distributed selection, ratio-to-report.

Three operators: an FK-edge orphan checker (the data-quality gate every
warehouse load runs — left-anti counts per edge), exact global
NTILE(10) deciles WITHOUT a global sort (select the 9 boundary
elements by histogram-bracketed rank, broadcast, assign per row by
lexicographic comparison — the only all-to-all is a ≤4096-cell
histogram), and percent-of-total revenue share (window over an
aggregate, total folded on the driver over the key-domain-bounded
result).

Registered rows-only (driver 50-row window frozen); DuckDB parity
twins run in tests/test_queries_r3m.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

_PYA = {"batch_format": "pyarrow"}


def _read(sf_dir: str, table: str, columns: list[str],
          row_filter=None) -> ray.data.Dataset:
    from .queries import read_table

    return read_table(sf_dir, table, columns, row_filter=row_filter)


def _round_half_up(x: np.ndarray, digits: int) -> np.ndarray:
    q = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * q + 0.5) / q


# --- R4: referential-integrity checker -----------------------------------------

_FK_EDGES = [
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders",
     "o_orderkey"),
    ("customer->nation", "customer", "c_nationkey", "nation",
     "n_nationkey"),
]


def orphan_count(fact: ray.data.Dataset, fact_key: str,
                 dim: ray.data.Dataset, dim_key: str) -> tuple[int, int]:
    """(n_orphans, n_rows): fact rows whose key has no dim match, via
    the native left-anti join (both sides shuffle keys only — the fact
    projects to its key column before moving)."""
    keys_only = fact.select_columns([fact_key])
    n_rows = keys_only.count()
    orphans = keys_only.join(
        dim.select_columns([dim_key]).repartition(4),
        join_type="left_anti", num_partitions=4,
        on=(fact_key,), right_on=(dim_key,))
    return orphans.count(), n_rows


def q_integrity_check(sf_dir: str) -> pa.Table:
    """Orphan counts for every FK edge of the schema — the load-time
    contract check (all zeros on consistent data; the violation path is
    pinned by a corrupted fixture in pytest).  The three edges run
    sequentially ON PURPOSE: concurrent streaming executors from driver
    threads contend for the same CPU pool and measured 4× SLOWER than
    back-to-back runs (43 s vs 11 s at sf0.1) — the per-edge cost is
    join startup, which threading multiplies instead of hiding."""
    out = {"edge": [], "n_orphans": [], "n_rows": []}
    for edge, ft, fk, dt, dk in _FK_EDGES:
        n_orph, n_rows = orphan_count(
            _read(sf_dir, ft, [fk]), fk, _read(sf_dir, dt, [dk]), dk)
        out["edge"].append(edge)
        out["n_orphans"].append(n_orph)
        out["n_rows"].append(n_rows)
    return pa.table({
        "edge": pa.array(out["edge"], type=pa.string()),
        "n_orphans": pa.array(out["n_orphans"], type=pa.int64()),
        "n_rows": pa.array(out["n_rows"], type=pa.int64()),
    })


SQL_INTEGRITY_CHECK = """
SELECT 'orders->customer' AS edge,
       CAST(COUNT(*) FILTER (c_custkey IS NULL) AS BIGINT) AS n_orphans,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
UNION ALL
SELECT 'lineitem->orders',
       CAST(COUNT(*) FILTER (o_orderkey IS NULL) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
UNION ALL
SELECT 'customer->nation',
       CAST(COUNT(*) FILTER (n_nationkey IS NULL) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
"""


# --- K9: exact GLOBAL NTILE(10) by distributed selection -----------------------

_N_BINS = 4096
_DECILES = 10


def q_orders_decile(sf_dir: str) -> ray.data.Dataset:
    """Every order's global price decile — NTILE(10) over the TOTAL
    order (o_totalprice, o_orderkey) without ever sorting globally:

      pass 1  Min/Max/Count (constant size)
      pass 2  4096-bin price histogram (non-empty bins per batch)
      driver  bracket the 9 NTILE cut positions to bins
      pass 3  re-scan ONLY bracketed bins, sort (price, key) in-bin,
              pick the 9 exact boundary ELEMENTS (pairs)
      assign  boundaries broadcast; each row's decile = 1 + #boundaries
              strictly below it (9 vectorized comparisons per batch)

    Same three-cheap-passes shape as the exact global quantiles, but
    returning a PER-ROW window value, which a quantile can't."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    g = ds.aggregate(Min("o_totalprice"), Max("o_totalprice"), Count())
    vmin, vmax = g["min(o_totalprice)"], g["max(o_totalprice)"]
    n = g["count()"]
    span = max(vmax - vmin, 1e-300)

    def binify(x: np.ndarray) -> np.ndarray:
        b = ((x - vmin) / span * _N_BINS).astype(np.int64)
        return np.clip(b, 0, _N_BINS - 1)

    def hist(b: pa.Table) -> pa.Table:
        x = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(binify(x), return_inverse=True)
        return pa.table({
            "bin": pa.array(uniq, type=pa.int64()),
            "cnt": pa.array(np.bincount(inv), type=pa.int64()),
        })

    rows = (ds.map_batches(hist, **_PYA)
            .groupby("bin").aggregate(Sum("cnt", alias_name="c"))
            .take_all())
    counts = np.zeros(_N_BINS, dtype=np.int64)
    for r in rows:
        counts[r["bin"]] = r["c"]
    cum = np.cumsum(counts)
    base, rem = divmod(int(n), _DECILES)
    sizes = np.array([base + 1 if t < rem else base
                      for t in range(_DECILES)], dtype=np.int64)
    cut_ranks = np.cumsum(sizes)[:-1]         # 1-indexed ranks of the
    targets: dict = {}                        # last element of tiles 1..9
    for k in cut_ranks.tolist():
        b = int(np.searchsorted(cum, k))
        below = int(cum[b - 1]) if b else 0
        targets.setdefault(b, []).append(k - below)
    want_bins = np.array(sorted(targets), dtype=np.int64)
    refine = int(counts[want_bins].sum())
    if refine > 2_000_000:
        logging.getLogger(__name__).warning(
            "decile refine pass collects %d rows (skewed bins)", refine)

    def in_bins(b: pa.Table) -> pa.Table:
        x = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        k = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        bb = binify(x)
        m = np.isin(bb, want_bins)
        return pa.table({"v": pa.array(x[m]), "k": pa.array(k[m]),
                         "b": pa.array(bb[m])})

    picked = ds.map_batches(in_bins, **_PYA).take_all()
    byb: dict = {}
    for r in picked:
        byb.setdefault(r["b"], []).append((r["v"], r["k"]))
    bounds = []
    for b, ranks in targets.items():
        pairs = sorted(byb[b])
        for r in ranks:
            bounds.append(pairs[r - 1])
    bounds.sort()
    bv = np.array([p[0] for p in bounds])
    bk = np.array([p[1] for p in bounds], dtype=np.int64)

    def assign(b: pa.Table) -> pa.Table:
        x = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        k = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        tile = np.ones(len(x), dtype=np.int64)
        for i in range(len(bv)):
            tile += ((bv[i] < x) | ((bv[i] == x) & (bk[i] < k)))
        return pa.table({
            "o_orderkey": pa.array(k),
            "decile": pa.array(tile),
        })

    return ds.map_batches(assign, **_PYA)


SQL_ORDERS_DECILE = """
SELECT o_orderkey,
       CAST(NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey)
            AS BIGINT) AS decile
FROM orders
"""


# --- W16: ratio-to-report ------------------------------------------------------

def q_nation_revenue_share(sf_dir: str) -> pa.Table:
    """Each nation's % share of total order revenue: the SUM() OVER ()
    window — distributed per-nation aggregate (broadcast customer→
    nation lookup keeps the fact shuffle key-only), total folded on the
    driver over the key-domain-bounded result.  Shares ratio the
    UNROUNDED sums, like SQL."""
    from .queries import broadcast_attach_factory, read_table

    cust = pa.concat_tables(
        [b for b in _read(sf_dir, "customer",
                          ["c_custkey", "c_nationkey"]
                          ).iter_batches(batch_format="pyarrow")])
    attach = broadcast_attach_factory(
        cust.column("c_custkey"), cust.column("c_nationkey"),
        "o_custkey", "c_nationkey", default=-1)
    rows = (_read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(attach, **_PYA)
            .groupby("c_nationkey")
            .aggregate(Sum("o_totalprice", alias_name="rev"))
            .take_all())
    keys = np.array([r["c_nationkey"] for r in rows], dtype=np.int64)
    rev = np.array([r["rev"] for r in rows], dtype=np.float64)
    order = np.argsort(keys)
    keys, rev = keys[order], rev[order]
    total = rev.sum()
    return pa.table({
        "c_nationkey": pa.array(keys),
        "revenue": pa.array(_round_half_up(rev, 2)),
        "pct_share": pa.array(_round_half_up(100.0 * rev / total, 6)),
    })


SQL_NATION_REVENUE_SHARE = """
WITH r AS (
  SELECT c_nationkey, SUM(o_totalprice) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1)
SELECT c_nationkey, ROUND(rev, 2) AS revenue,
       ROUND(100.0 * rev / SUM(rev) OVER (), 6) AS pct_share
FROM r
"""


def queries_r3m() -> dict:
    return {
        "integrity_check": q_integrity_check,
        "orders_decile": q_orders_decile,
        "nation_revenue_share": q_nation_revenue_share,
    }


def parity_sql_r3m() -> dict[str, str]:
    """DuckDB twins for the pytest parity gate (NOT driver oracles)."""
    return {
        "integrity_check": SQL_INTEGRITY_CHECK,
        "orders_decile": SQL_ORDERS_DECILE,
        "nation_revenue_share": SQL_NATION_REVENUE_SHARE,
    }
