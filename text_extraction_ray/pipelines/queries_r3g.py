"""Round-3 continuation batch G: multi-dim aggregates + robust stats +
a six-table join composite + info-theoretic and sketch signals.

Six operators: CUBE over (status, priority), exact per-group
median + MAD via a bounded-domain value histogram, interpolated
quantile_cont on the same histogram, TPC-H-Q5-shaped local-supplier
revenue (two native hash joins over the fact tables, every dimension
broadcast, region/date predicates pushed below the shuffles), Shannon
entropy of the per-type user distribution, and count-min-sketch
estimates checked against the exact heavy hitters.

Registered rows-only (driver 50-row window frozen); DuckDB parity
twins run in tests/test_queries_r3g (the CMS query is sketch-valued —
structural bounds instead of a twin).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pds

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


# --- G23: CUBE ------------------------------------------------------------------

def q_orders_cube(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE (o_orderstatus, o_orderpriority): all four grouping
    sets.  One distributed aggregate computes the finest level; the
    three coarser levels fold from it on the driver, bounded by the
    |status| × |priority| domain (≤ tens of rows at any input size) —
    the same derive-from-base shape as ROLLUP (batch C), extended to
    the full lattice.  Subtotals sum the UNROUNDED base sums; rounding
    happens once per emitted row, like SQL's ROUND over each set."""
    base = (_read(sf_dir, "orders",
                  ["o_orderstatus", "o_orderpriority", "o_totalprice"])
            .groupby(["o_orderstatus", "o_orderpriority"])
            .aggregate(Count(alias_name="n"),
                       Sum("o_totalprice", alias_name="s"))
            .take_all())
    out_s, out_p, out_n, out_sum = [], [], [], []

    def emit(rows, key_fn):
        acc: dict = {}
        for r in rows:
            k = key_fn(r)
            n, s = acc.get(k, (0, 0.0))
            acc[k] = (n + r["n"], s + r["s"])
        for (ks, kp), (n, s) in acc.items():
            out_s.append(ks)
            out_p.append(kp)
            out_n.append(n)
            out_sum.append(s)

    emit(base, lambda r: (r["o_orderstatus"], r["o_orderpriority"]))
    emit(base, lambda r: (r["o_orderstatus"], None))
    emit(base, lambda r: (None, r["o_orderpriority"]))
    emit(base, lambda r: (None, None))
    return pa.table({
        "o_orderstatus": pa.array(out_s, type=pa.string()),
        "o_orderpriority": pa.array(out_p, type=pa.string()),
        "n": pa.array(out_n, type=pa.int64()),
        "sum_price": pa.array(_round_half_up(
            np.array(out_sum, dtype=np.float64), 2)),
    })


SQL_ORDERS_CUBE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- X10/X11: bounded-domain value histogram → median/MAD + quantile_cont ------

def _value_histogram(sf_dir: str) -> ray.data.Dataset:
    """Distributed (event_type, cents) → count.  events.value is a 2dp
    decimal, so integer cents is an EXACT bounded key domain (≤ a few
    tens of thousands of distinct cells regardless of event count) —
    the shuffle moves the histogram, never the events."""
    def to_cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b.column("event_type"),
            "cents": pa.array(np.round(v * 100.0).astype(np.int64)),
        })

    return (_read(sf_dir, "events", ["event_type", "value"])
            .map_batches(to_cents, **_PYA)
            .groupby(["event_type", "cents"])
            .aggregate(Count(alias_name="c")))


def _interp_quantile(vals: np.ndarray, cnts: np.ndarray,
                     q: float) -> float:
    """quantile_cont over a weighted sorted histogram: position
    p = q·(n−1), linear interpolation between the two order
    statistics — DuckDB/PostgreSQL percentile_cont semantics."""
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    p = q * (n - 1)
    lo_i = int(np.floor(p))
    hi_i = int(np.ceil(p))
    lo = vals[np.searchsorted(cum, lo_i, side="right")]
    hi = vals[np.searchsorted(cum, hi_i, side="right")]
    return float(lo + (hi - lo) * (p - lo_i))


def q_events_robust(sf_dir: str) -> ray.data.Dataset:
    """Robust per-type location/spread: exact interpolated MEDIAN and
    MAD (median absolute deviation, itself interpolated) from the
    bounded-domain histogram — outlier-resistant stats the mean/std pair
    (value_stats) can't give.  Per-type work runs in map_groups over
    histogram rows, vectorized."""
    def stats(g: pa.Table) -> pa.Table:
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(cents)
        vals = cents[order] / 100.0
        cnts = c[order]
        med = _interp_quantile(vals, cnts, 0.5)
        dev = np.abs(vals - med)
        dorder = np.argsort(dev)
        mad = _interp_quantile(dev[dorder], cnts[dorder], 0.5)
        return pa.table({
            "event_type": g.column("event_type").slice(0, 1),
            "med": pa.array(_round_half_up(np.array([med]), 6)),
            "mad": pa.array(_round_half_up(np.array([mad]), 6)),
        })

    return (_value_histogram(sf_dir)
            .groupby("event_type")
            .map_groups(stats, batch_format="pyarrow"))


SQL_EVENTS_ROBUST = """
SELECT event_type,
       ROUND(median(value), 6) AS med,
       ROUND(mad(value), 6) AS mad
FROM events GROUP BY event_type
"""


def q_events_percentile_cont(sf_dir: str) -> ray.data.Dataset:
    """Exact interpolated p50/p90/p99 per type from the same histogram —
    the continuous complement of the discrete global quantiles
    (orders_quantile_disc) and the approximate log-bin sketch."""
    def stats(g: pa.Table) -> pa.Table:
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(cents)
        vals = cents[order] / 100.0
        cnts = c[order]
        qs = [0.5, 0.9, 0.99]
        est = np.array([_interp_quantile(vals, cnts, q) for q in qs])
        return pa.table({
            "event_type": g.column("event_type").slice(0, 1),
            "p50": pa.array(_round_half_up(est[:1], 6)),
            "p90": pa.array(_round_half_up(est[1:2], 6)),
            "p99": pa.array(_round_half_up(est[2:], 6)),
        })

    return (_value_histogram(sf_dir)
            .groupby("event_type")
            .map_groups(stats, batch_format="pyarrow"))


SQL_EVENTS_PERCENTILE_CONT = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


# --- J12: TPC-H-Q5-shaped six-table composite ----------------------------------

_Q5_REGION = "ASIA"
_Q5_FROM = np.datetime64("1996-01-01", "us")
_Q5_TO = np.datetime64("1997-01-01", "us")


def q_local_supplier_volume(sf_dir: str) -> ray.data.Dataset:
    """Q5 shape: revenue per nation from lineitems whose customer AND
    supplier sit in that nation, one region, one order year.  The scale
    plan: region→nation resolves to a key SET broadcast into the
    CUSTOMER read (the filter runs below both shuffles), orders carry
    the date predicate into the parquet scan, the two fact-fact edges
    (orders⋈customer on custkey, lineitem⋈that on orderkey) are native
    hash joins, and supplier/nation are broadcast lookups — so the only
    all-to-all traffic is two key-pruned fact shuffles."""
    import datetime as _dt

    nation = pa.concat_tables(
        [b for b in _read(sf_dir, "nation",
                          ["n_nationkey", "n_name", "n_regionkey"]
                          ).iter_batches(batch_format="pyarrow")])
    region = pa.concat_tables(
        [b for b in _read(sf_dir, "region", ["r_regionkey", "r_name"]
                          ).iter_batches(batch_format="pyarrow")])
    rkey = region.column("r_regionkey").to_numpy(zero_copy_only=False)[
        np.asarray(region.column("r_name").to_pylist(), dtype=object)
        == _Q5_REGION][0]
    nk = nation.column("n_nationkey").to_numpy(zero_copy_only=False)
    in_region = nk[nation.column("n_regionkey").to_numpy(
        zero_copy_only=False) == rkey]
    names = np.asarray(nation.column("n_name").to_pylist(), dtype=object)
    name_of = dict(zip(nk.tolist(), names.tolist()))
    supplier = pa.concat_tables(
        [b for b in _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
                          ).iter_batches(batch_format="pyarrow")])
    supp_nation = dict(zip(
        supplier.column("s_suppkey").to_numpy(zero_copy_only=False)
        .tolist(),
        supplier.column("s_nationkey").to_numpy(zero_copy_only=False)
        .tolist()))
    in_region_ref = ray.put(set(in_region.tolist()))
    supp_ref = ray.put(supp_nation)

    def cust_filter(b: pa.Table) -> pa.Table:
        keep_set = ray.get(in_region_ref)
        nkc = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        mask = np.isin(nkc, np.fromiter(keep_set, dtype=np.int64))
        return b.filter(pa.array(mask))

    cust = (_read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
            .map_batches(cust_filter, **_PYA))
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey"],
        row_filter=(
            (pds.field("o_orderdate") >= _dt.datetime(1996, 1, 1))
            & (pds.field("o_orderdate") < _dt.datetime(1997, 1, 1))))
    oc = orders.join(cust, join_type="inner", num_partitions=8,
                     on=("o_custkey",), right_on=("c_custkey",))

    def line_rev(b: pa.Table) -> pa.Table:
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_suppkey": b.column("l_suppkey"),
            "rev": pa.array(price * (1.0 - disc)),
        })

    line = (_read(sf_dir, "lineitem",
                  ["l_orderkey", "l_suppkey", "l_extendedprice",
                   "l_discount"])
            .map_batches(line_rev, **_PYA))
    joined = line.join(oc, join_type="inner", num_partitions=8,
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def local_only(b: pa.Table) -> pa.Table:
        sn = ray.get(supp_ref)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        cn = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        s_nat = np.array([sn[k] for k in sk.tolist()], dtype=np.int64) \
            if len(sk) else np.zeros(0, dtype=np.int64)
        keep = s_nat == cn
        return pa.table({
            "n_nationkey": pa.array(cn[keep]),
            "rev": pa.array(
                b.column("rev").to_numpy(zero_copy_only=False)[keep]),
        })

    def finish(b: pa.Table) -> pa.Table:
        nmap = name_of
        keys = b.column("n_nationkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array([nmap[k] for k in keys.tolist()],
                               type=pa.string()),
            "revenue": pa.array(_round_half_up(
                b.column("revenue").to_numpy(zero_copy_only=False), 2)),
        })

    return (joined.map_batches(local_only, **_PYA)
            .groupby("n_nationkey")
            .aggregate(Sum("rev", alias_name="revenue"))
            .map_batches(finish, **_PYA))


SQL_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{_Q5_REGION}'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
"""


# --- X12: Shannon entropy of the per-type user distribution --------------------

def q_events_entropy(sf_dir: str) -> ray.data.Dataset:
    """H(user | event_type) in bits — the spread-of-attention signal
    data-curation uses to spot bot-dominated slices (low entropy = few
    users own the traffic).  Identity H = log2(N) − Σ c·log2(c) / N
    turns it into two associative aggregates: user counts (one shuffle
    of (type, user) keys), then per-type Σ c·log2 c — nothing ever
    materializes the distribution."""
    counts = (_read(sf_dir, "events", ["event_type", "user_id"])
              .groupby(["event_type", "user_id"])
              .aggregate(Count(alias_name="c")))

    def partial(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False).astype(
            np.float64)
        types = np.asarray(b.column("event_type").to_pylist(),
                           dtype=object)
        uniq, inv = np.unique(types, return_inverse=True)
        return pa.table({
            "event_type": pa.array(uniq.tolist(), type=pa.string()),
            "clogc": pa.array(np.bincount(inv, weights=c * np.log2(
                np.maximum(c, 1.0)))),
            "n": pa.array(np.bincount(inv, weights=c)),
        })

    def finish(b: pa.Table) -> pa.Table:
        s = b.column("clogc").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        h = np.where(n > 0, np.log2(np.maximum(n, 1.0)) - s / n, 0.0)
        return pa.table({
            "event_type": b.column("event_type"),
            "entropy_bits": pa.array(_round_half_up(h, 6)),
        })

    return (counts.map_batches(partial, **_PYA)
            .groupby("event_type")
            .aggregate(Sum("clogc", alias_name="clogc"),
                       Sum("n", alias_name="n"))
            .map_batches(finish, **_PYA))


SQL_EVENTS_ENTROPY = """
SELECT event_type, ROUND(entropy(user_id), 6) AS entropy_bits
FROM events GROUP BY event_type
"""


# --- X9 query: count-min estimates vs exact heavy hitters ----------------------

def q_heavy_tokens_cms(sf_dir: str) -> pa.Table:
    """Count-min-sketch point estimates for the exact heavy-hitter
    tokens, side by side with their true counts.  The sketch is the
    constant-memory path for UNBOUNDED vocabularies (the exact two-pass
    heavy_tokens carries a candidate set; CMS carries 256 KiB, full
    stop) — this query pins its one-sided error against the exact op.
    Sketch-valued: no SQL twin; bounds are asserted in pytest."""
    from ..functions.sketch import cms_estimate, count_min_table, \
        heavy_tokens

    docs = _read(sf_dir, "documents", ["text"])
    M = count_min_table(docs)
    exact = pa.concat_tables(
        [b for b in heavy_tokens(docs, ratio=200).iter_batches(
            batch_format="pyarrow")])
    toks = exact.column("token").to_pylist()
    est = cms_estimate(M, toks)
    order = np.argsort(np.asarray(toks, dtype=object))
    return pa.table({
        "token": pa.array(np.asarray(toks, dtype=object)[order].tolist(),
                          type=pa.string()),
        "n_exact": pa.array(exact.column("n_occurrences").to_numpy(
            zero_copy_only=False)[order]),
        "n_cms": pa.array(est[order]),
    })


def queries_r3g() -> dict:
    return {
        "orders_cube": q_orders_cube,
        "events_robust": q_events_robust,
        "events_percentile_cont": q_events_percentile_cont,
        "local_supplier_volume": q_local_supplier_volume,
        "events_entropy": q_events_entropy,
        "heavy_tokens_cms": q_heavy_tokens_cms,
    }


def parity_sql_r3g() -> dict[str, str]:
    """DuckDB twins for the pytest parity gate (NOT driver oracles).
    heavy_tokens_cms is sketch-valued — structural bounds in pytest."""
    return {
        "orders_cube": SQL_ORDERS_CUBE,
        "events_robust": SQL_EVENTS_ROBUST,
        "events_percentile_cont": SQL_EVENTS_PERCENTILE_CONT,
        "local_supplier_volume": SQL_LOCAL_SUPPLIER_VOLUME,
        "events_entropy": SQL_EVENTS_ENTROPY,
    }
