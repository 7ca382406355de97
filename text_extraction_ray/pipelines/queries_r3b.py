"""Round-3 continuation batch: relational-completeness + pipeline ops.

Ten operators closing the remaining relational-algebra and
training-pipeline gaps (set ops, ROLLUP, LAG, exact grouped
COUNT(DISTINCT), corr/covar, grouped mode, cohort retention, funnel,
document chunking).  Registered rows-only in the driver registry (the
50-row CORRECTNESS window stays 48 oracled + extract_pages +
pdf_tables, see queries.py), with DuckDB-parity SQL twins exercised by
tests/test_queries_r3b — the same rows+schema+values gate, run in
pytest.

Scale notes are per-operator docstrings; the common theme is that every
shuffle here carries AGGREGATED rows (distinct pairs, per-group
partials, per-batch candidate maxima), never the raw fact table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

_PYA = {"batch_format": "pyarrow"}

# Naive-UTC epoch of 2024-01-01 in microseconds — the corpus' own time
# origin; centering timestamps here before moment sums kills the
# catastrophic cancellation that raw epoch-microsecond moments (~1.7e18)
# would suffer in n*sxx - sx^2.
_EPOCH0_US = 1_704_067_200_000_000


def _read(sf_dir: str, table: str, columns: list[str],
          row_filter=None) -> ray.data.Dataset:
    from .queries import read_table

    return read_table(sf_dir, table, columns, row_filter=row_filter)


def _round_half_up(x: np.ndarray, digits: int) -> np.ndarray:
    """DuckDB ROUND() is half-away-from-zero; numpy's is banker's.  Match
    DuckDB so the parity twins can compare rounded floats exactly."""
    q = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * q + 0.5) / q


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    """timestamp[us] column -> int64 microseconds (zero-copy view)."""
    return col.combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False)


# --- R2a/R2b: set operators (INTERSECT / EXCEPT) ------------------------------

_HI_VALUE = 150.0


def _user_type_presence(sf_dir: str) -> ray.data.Dataset:
    """Shared plan for the set ops: per-user presence flags for clicks
    vs HIGH-VALUE purchases (value > 150 — the full-coverage synthetic
    corpus makes unfiltered set differences trivially empty at every
    sf).  The scan is pruned to the relevant rows AT THE READ (compound
    row-group predicate pushdown); each batch locally dedups to one
    (user, flags) row per user before the shuffle, so the groupby
    carries <= distinct-users-per-batch rows — never raw events."""
    import pyarrow.dataset as pads

    f = pads.field
    ds = _read(sf_dir, "events", ["user_id", "event_type"],
               row_filter=(f("event_type") == "click")
               | ((f("event_type") == "purchase")
                  & (f("value") > _HI_VALUE)))

    def flags(b: pa.Table) -> pa.Table:
        users = b.column("user_id").to_numpy(zero_copy_only=False)
        is_click = pc.equal(b.column("event_type"), "click").to_numpy(
            zero_copy_only=False)
        uniq, inv = np.unique(users, return_inverse=True)
        clk = np.zeros(len(uniq), dtype=np.int64)
        pur = np.zeros(len(uniq), dtype=np.int64)
        np.maximum.at(clk, inv, is_click.astype(np.int64))
        np.maximum.at(pur, inv, (~is_click).astype(np.int64))
        return pa.table({
            "user_id": pa.array(uniq, type=pa.int64()),
            "clk": pa.array(clk), "pur": pa.array(pur),
        })

    return (ds.map_batches(flags, **_PYA)
            .groupby("user_id")
            .aggregate(Max("clk", alias_name="has_click"),
                       Max("pur", alias_name="has_purchase")))


def _schema_anchor() -> ray.data.Dataset:
    """Zero-row, schema-bearing dataset unioned onto set-op outputs so
    an EMPTY result still reports its schema (Ray's sort-based groupby
    emits schema-less empty blocks and a fully-filtered dataset loses
    its column list — the documented empty-block gotcha)."""
    return ray.data.from_arrow(
        pa.table({"user_id": pa.array([], type=pa.int64())}))


def q_users_click_and_purchase(sf_dir: str) -> ray.data.Dataset:
    """INTERSECT: users present in both the click stream and the
    high-value purchase stream."""
    def keep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(b.column("has_click"), 1),
                    pc.equal(b.column("has_purchase"), 1))
        return b.filter(m).select(["user_id"])

    return (_user_type_presence(sf_dir).map_batches(keep, **_PYA)
            .union(_schema_anchor()))


SQL_USERS_CLICK_AND_PURCHASE = f"""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events
WHERE event_type = 'purchase' AND value > {_HI_VALUE}
"""


def q_users_click_not_purchase(sf_dir: str) -> ray.data.Dataset:
    """EXCEPT: users who clicked but never made a high-value purchase."""
    def keep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(b.column("has_click"), 1),
                    pc.equal(b.column("has_purchase"), 0))
        return b.filter(m).select(["user_id"])

    return (_user_type_presence(sf_dir).map_batches(keep, **_PYA)
            .union(_schema_anchor()))


SQL_USERS_CLICK_NOT_PURCHASE = f"""
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'purchase' AND value > {_HI_VALUE}
"""


# --- G15: ROLLUP hierarchy aggregate ------------------------------------------

def q_orders_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus): the distributed
    work is ONE finest-level groupby (priority x status — bounded by the
    attribute domains, ~15 rows at any data scale); the subtotal and
    grand-total levels are derived from that tiny mergeable result on
    the driver.  This is how a rollup should run at 100 TB: one shuffle
    at the finest grain, zero extra passes over the fact table."""
    finest = (_read(sf_dir, "orders",
                    ["o_orderpriority", "o_orderstatus", "o_totalprice"])
              .groupby(["o_orderpriority", "o_orderstatus"])
              .aggregate(Sum("o_totalprice", alias_name="s"),
                         Count(alias_name="n"))
              .take_all())
    rows = [(r["o_orderpriority"], r["o_orderstatus"], r["s"], r["n"])
            for r in finest]
    out_p, out_s, out_sum, out_n = [], [], [], []
    for p, s, sm, n in rows:                       # finest level
        out_p.append(p); out_s.append(s); out_sum.append(sm); out_n.append(n)
    sub: dict = {}
    for p, _, sm, n in rows:                       # per-priority subtotal
        a = sub.setdefault(p, [0.0, 0])
        a[0] += sm; a[1] += n
    for p in sorted(sub):
        out_p.append(p); out_s.append(None)
        out_sum.append(sub[p][0]); out_n.append(sub[p][1])
    out_p.append(None); out_s.append(None)         # grand total
    out_sum.append(sum(a[0] for a in sub.values()))
    out_n.append(sum(a[1] for a in sub.values()))
    return pa.table({
        "o_orderpriority": pa.array(out_p, type=pa.string()),
        "o_orderstatus": pa.array(out_s, type=pa.string()),
        "sum_price": pa.array(
            _round_half_up(np.asarray(out_sum, dtype=np.float64), 2)),
        "n_orders": pa.array(out_n, type=pa.int64()),
    })


SQL_ORDERS_ROLLUP = """
SELECT o_orderpriority, o_orderstatus,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


# --- W5: LAG window (per-key previous-row delta) ------------------------------

def q_events_lag(sf_dir: str) -> ray.data.Dataset:
    """value - LAG(value) and microsecond gap per user, ordered by
    (ts, event_id).  Same machinery as orders_rank: 64 coarse hash
    buckets, ONE vectorized lexsort + boundary-masked diff per bucket —
    not a Python call per user.  Differences of IEEE doubles are exact
    and order-free, so the twin matches bit-for-bit."""
    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array((ids % 64).astype(np.int64)))

    def lag(g: pa.Table) -> pa.Table:
        user = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = _ts_us(g.column("ts"))
        val = g.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, user))
        u, e, t, v = user[order], eid[order], ts[order], val[order]
        first = np.zeros(len(u), dtype=bool)
        if len(u):
            first[0] = True
            first[1:] = u[1:] != u[:-1]
        dv = np.empty(len(v)); dv[0:] = np.nan
        gap = np.zeros(len(t), dtype=np.int64)
        if len(u) > 1:
            dv[1:] = v[1:] - v[:-1]
            gap[1:] = t[1:] - t[:-1]
        return pa.table({
            "event_id": pa.array(e, type=pa.int64()),
            "user_id": pa.array(u, type=pa.int64()),
            "delta_value": pa.array(
                np.where(first, np.nan, dv), mask=first),
            "gap_us": pa.array(gap, mask=first, type=pa.int64()),
        })

    return (_read(sf_dir, "events",
                  ["event_id", "user_id", "ts", "value"])
            .map_batches(add_bucket, **_PYA)
            .groupby("bucket")
            .map_groups(lag, batch_format="pyarrow"))


SQL_EVENTS_LAG = """
SELECT event_id, user_id,
       value - LAG(value) OVER w AS delta_value,
       CAST(date_diff('microsecond', LAG(ts) OVER w, ts) AS BIGINT)
         AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- G16: exact grouped COUNT(DISTINCT) ---------------------------------------

def q_users_by_type_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT user_id) per event_type — the two-phase
    plan: phase 1 dedups (type, user) pairs (map-side local unique, so
    the shuffle carries distinct pairs per batch, not raw events);
    phase 2 counts rows per type.  The oracled twin of the HLL variant
    (users_by_type_hll) — together they demonstrate the exact/approx
    trade the engine offers."""
    def local_pairs(b: pa.Table) -> pa.Table:
        t = np.asarray(b.column("event_type").to_pylist(), dtype=object)
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, t))
        ts_, us_ = t[order], u[order]
        keep = np.zeros(len(ts_), dtype=bool)
        if len(ts_):
            keep[0] = True
            keep[1:] = (ts_[1:] != ts_[:-1]) | (us_[1:] != us_[:-1])
        return pa.table({
            "event_type": pa.array(ts_[keep].tolist(), type=pa.string()),
            "user_id": pa.array(us_[keep], type=pa.int64()),
        })

    return (_read(sf_dir, "events", ["event_type", "user_id"])
            .map_batches(local_pairs, **_PYA)
            .groupby(["event_type", "user_id"])
            .aggregate(Count(alias_name="c"))
            .select_columns(["event_type"])
            .groupby("event_type")
            .aggregate(Count(alias_name="n_users")))


SQL_USERS_BY_TYPE_EXACT = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


# --- G17: correlation / covariance aggregate ----------------------------------

def q_events_corr(sf_dir: str) -> ray.data.Dataset:
    """Per-type corr/covar_samp(value, seconds-since-2024-01-01) via
    distributed moment sums: each batch emits (n, sx, sy, sxx, syy,
    sxy) partials — six doubles per (type, batch) — merged by a tiny
    groupby Sum and finalized vectorized.  Centering the time axis at
    the corpus epoch keeps the n*sxx - sx^2 cancellation benign; both
    sides round (6dp corr, 2dp covar) so summation-order noise below
    1e-9 can't flip the comparison."""
    def partial(b: pa.Table) -> pa.Table:
        t = np.asarray(b.column("event_type").to_pylist(), dtype=object)
        y = b.column("value").to_numpy(zero_copy_only=False)
        x = (_ts_us(b.column("ts")) - _EPOCH0_US) / 1e6
        uniq, inv = np.unique(t, return_inverse=True)
        k = len(uniq)
        n = np.bincount(inv, minlength=k).astype(np.float64)
        sx = np.bincount(inv, weights=x, minlength=k)
        sy = np.bincount(inv, weights=y, minlength=k)
        sxx = np.bincount(inv, weights=x * x, minlength=k)
        syy = np.bincount(inv, weights=y * y, minlength=k)
        sxy = np.bincount(inv, weights=x * y, minlength=k)
        return pa.table({
            "event_type": pa.array(uniq.tolist(), type=pa.string()),
            "n": pa.array(n), "sx": pa.array(sx), "sy": pa.array(sy),
            "sxx": pa.array(sxx), "syy": pa.array(syy),
            "sxy": pa.array(sxy),
        })

    def finalize(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False)
        sx = b.column("sx").to_numpy(zero_copy_only=False)
        sy = b.column("sy").to_numpy(zero_copy_only=False)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False)
        syy = b.column("syy").to_numpy(zero_copy_only=False)
        sxy = b.column("sxy").to_numpy(zero_copy_only=False)
        cov = (sxy - sx * sy / n) / (n - 1)
        denom = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        corr = np.where(denom > 0, (n * sxy - sx * sy) / denom, np.nan)
        return pa.table({
            "event_type": b.column("event_type"),
            "n": pa.array(n.astype(np.int64)),
            "corr_vt": pa.array(_round_half_up(corr, 6)),
            "covar_vt": pa.array(_round_half_up(cov, 2)),
        })

    return (_read(sf_dir, "events", ["event_type", "ts", "value"])
            .map_batches(partial, **_PYA)
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sx", alias_name="sx"),
                       Sum("sy", alias_name="sy"),
                       Sum("sxx", alias_name="sxx"),
                       Sum("syy", alias_name="syy"),
                       Sum("sxy", alias_name="sxy"))
            .map_batches(finalize, **_PYA))


SQL_EVENTS_CORR = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(corr(value,
             (epoch_us(ts) - 1704067200000000) / 1e6), 6) AS corr_vt,
       ROUND(covar_samp(value,
             (epoch_us(ts) - 1704067200000000) / 1e6), 2) AS covar_vt
FROM events GROUP BY event_type
"""


# --- G18: grouped mode (most frequent value) ----------------------------------

def q_events_mode(sf_dir: str) -> ray.data.Dataset:
    """Most frequent user per event_type (ties -> smallest user_id).
    Phase 1: distributed (type, user) counts.  Phase 2: argmax by
    (count DESC, user ASC) — an associative reduction, so each batch
    emits only its per-type best candidate and the final merge sees
    <= types x batches rows.  The full per-user count table never
    reaches the driver."""
    counts = (_read(sf_dir, "events", ["event_type", "user_id"])
              .groupby(["event_type", "user_id"])
              .aggregate(Count(alias_name="n")))

    def local_best(b: pa.Table) -> pa.Table:
        t = np.asarray(b.column("event_type").to_pylist(), dtype=object)
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, -n, t))
        ts_ = t[order]
        keep = np.zeros(len(ts_), dtype=bool)
        if len(ts_):
            keep[0] = True
            keep[1:] = ts_[1:] != ts_[:-1]
        return pa.table({
            "event_type": pa.array(ts_[keep].tolist(), type=pa.string()),
            "mode_user": pa.array(u[order][keep], type=pa.int64()),
            "n_events": pa.array(n[order][keep], type=pa.int64()),
        })

    def merge_best(g: pa.Table) -> pa.Table:
        u = g.column("mode_user").to_numpy(zero_copy_only=False)
        n = g.column("n_events").to_numpy(zero_copy_only=False)
        i = int(np.lexsort((u, -n))[0])
        return g.slice(i, 1)

    return (counts.map_batches(local_best, **_PYA)
            .groupby("event_type")
            .map_groups(merge_best, batch_format="pyarrow"))


SQL_EVENTS_MODE = """
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS n
  FROM events GROUP BY event_type, user_id),
r AS (
  SELECT event_type, user_id, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY n DESC, user_id) AS rn
  FROM c)
SELECT event_type, user_id AS mode_user, CAST(n AS BIGINT) AS n_events
FROM r WHERE rn = 1
"""


# --- W6: cohort retention ------------------------------------------------------

def q_user_retention(sf_dir: str) -> ray.data.Dataset:
    """Cohort table: users grouped by first-seen day, with how many were
    still active >= 7 days after their first event.  Two mergeable
    groupbys — per-user (Min ts, Max ts), then per-cohort-day counts;
    the per-user span table is the only shuffle payload (one row per
    user, never raw events)."""
    def to_us(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pa.array(_ts_us(b.column("ts"))),
        })

    spans = (_read(sf_dir, "events", ["user_id", "ts"])
             .map_batches(to_us, **_PYA)
             .groupby("user_id")
             .aggregate(Min("ts_us", alias_name="first_us"),
                        Max("ts_us", alias_name="last_us")))

    day_us = 86_400_000_000

    def cohortize(b: pa.Table) -> pa.Table:
        first = b.column("first_us").to_numpy(zero_copy_only=False)
        last = b.column("last_us").to_numpy(zero_copy_only=False)
        days = (first // day_us).astype("datetime64[D]")
        return pa.table({
            # ISO strings, not date32: pandas renders Arrow dates and
            # DuckDB DATEs differently, so the parity twins compare
            # strings on both sides.
            "cohort_day": pa.array(
                np.datetime_as_string(days, unit="D").tolist(),
                type=pa.string()),
            "retained": pa.array(
                (last >= first + 7 * day_us).astype(np.int64)),
        })

    return (spans.map_batches(cohortize, **_PYA)
            .groupby("cohort_day")
            .aggregate(Count(alias_name="n_users"),
                       Sum("retained", alias_name="n_retained")))


SQL_USER_RETENTION = """
WITH u AS (
  SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts
  FROM events GROUP BY user_id)
SELECT strftime(date_trunc('day', first_ts), '%Y-%m-%d') AS cohort_day,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN last_ts >= first_ts + INTERVAL 7 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_retained
FROM u GROUP BY cohort_day
"""


# --- W7: funnel (ordered multi-stage conversion) -------------------------------

_FUNNEL_SENTINEL = np.int64(2**62)


def q_funnel_conversions(sf_dir: str) -> ray.data.Dataset:
    """Users whose first view precedes their first click precedes their
    first purchase (strict).  Per-batch partial: min ts per user per
    stage (sentinel for absent) — three conditional-min columns — then
    one groupby Min merge and a vectorized order filter.  The classic
    web-analytics funnel as a single mergeable aggregate."""
    import pyarrow.dataset as pads

    stages = ["view", "click", "purchase"]

    def partial(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        t = np.asarray(b.column("event_type").to_pylist(), dtype=object)
        ts = _ts_us(b.column("ts"))
        uniq, inv = np.unique(u, return_inverse=True)
        cols = {"user_id": pa.array(uniq, type=pa.int64())}
        for s in stages:
            m = np.full(len(uniq), _FUNNEL_SENTINEL)
            sel = t == s
            np.minimum.at(m, inv[sel], ts[sel])
            cols[f"t_{s}"] = pa.array(m)
        return pa.table(cols)

    mins = (_read(sf_dir, "events", ["user_id", "event_type", "ts"],
                  row_filter=pads.field("event_type").isin(stages))
            .map_batches(partial, **_PYA)
            .groupby("user_id")
            .aggregate(*[Min(f"t_{s}", alias_name=f"t_{s}_us")
                         for s in stages]))

    def converted(b: pa.Table) -> pa.Table:
        v = b.column("t_view_us").to_numpy(zero_copy_only=False)
        c = b.column("t_click_us").to_numpy(zero_copy_only=False)
        p = b.column("t_purchase_us").to_numpy(zero_copy_only=False)
        m = (v < c) & (c < p) & (p < _FUNNEL_SENTINEL)
        return b.filter(pa.array(m))

    return mins.map_batches(converted, **_PYA)


SQL_FUNNEL_CONVERSIONS = """
WITH m AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purch
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST(epoch_us(t_view) AS BIGINT) AS t_view_us,
       CAST(epoch_us(t_click) AS BIGINT) AS t_click_us,
       CAST(epoch_us(t_purch) AS BIGINT) AS t_purchase_us
FROM m
WHERE t_view < t_click AND t_click < t_purch
"""


# --- T4: document chunking (training-window split) -----------------------------

CHUNK_LEN = 200
CHUNK_STRIDE = 160


def chunk_batch(b: pa.Table, text_col: str = "text",
                chunk_len: int = CHUNK_LEN,
                stride: int = CHUNK_STRIDE) -> pa.Table:
    """Split each doc into fixed-width overlapping character windows —
    the step that turns a cleaned corpus into training examples.
    Vectorized over ROWS per chunk index: chunk k slices every
    still-long-enough doc at once with utf8_slice_codeunits (codepoint
    semantics, identical to SQL substr), so the Python loop runs
    max-chunks-per-batch times, not once per row."""
    text = b.column(text_col)
    n = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    doc_id = b.column("doc_id")
    parts = []
    k = 0
    while True:
        start = k * stride
        mask = n > start
        if not mask.any():
            break
        sel = pa.array(mask)
        sub = pc.utf8_slice_codeunits(
            text.combine_chunks().filter(sel),
            start=start, stop=start + chunk_len)
        parts.append(pa.table({
            "doc_id": doc_id.filter(sel),
            "chunk_id": pa.array(
                np.full(int(mask.sum()), k, dtype=np.int64)),
            "chunk": sub,
        }))
        k += 1
    if not parts:
        return pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "chunk_id": pa.array([], type=pa.int64()),
            "chunk": pa.array([], type=pa.string()),
        })
    return pa.concat_tables(parts)


def q_doc_chunks(sf_dir: str) -> ray.data.Dataset:
    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(chunk_batch, **_PYA))


SQL_DOC_CHUNKS = f"""
WITH g AS (
  SELECT doc_id, text,
         unnest(generate_series(
           0, CAST((length(text) - 1) // {CHUNK_STRIDE} AS BIGINT))) AS i
  FROM documents WHERE length(text) > 0)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       substr(text, CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT),
              {CHUNK_LEN}) AS chunk
FROM g
"""


def queries_r3b() -> dict:
    return {
        "users_click_and_purchase": q_users_click_and_purchase,
        "users_click_not_purchase": q_users_click_not_purchase,
        "orders_rollup": q_orders_rollup,
        "events_lag": q_events_lag,
        "users_by_type_exact": q_users_by_type_exact,
        "events_corr": q_events_corr,
        "events_mode": q_events_mode,
        "user_retention": q_user_retention,
        "funnel_conversions": q_funnel_conversions,
        "doc_chunks": q_doc_chunks,
    }


def parity_sql_r3b() -> dict[str, str]:
    """DuckDB twins for the pytest parity gate (NOT driver oracles —
    the 50-row window allocation is frozen; see queries.py)."""
    return {
        "users_click_and_purchase": SQL_USERS_CLICK_AND_PURCHASE,
        "users_click_not_purchase": SQL_USERS_CLICK_NOT_PURCHASE,
        "orders_rollup": SQL_ORDERS_ROLLUP,
        "events_lag": SQL_EVENTS_LAG,
        "users_by_type_exact": SQL_USERS_BY_TYPE_EXACT,
        "events_corr": SQL_EVENTS_CORR,
        "events_mode": SQL_EVENTS_MODE,
        "user_retention": SQL_USER_RETENTION,
        "funnel_conversions": SQL_FUNNEL_CONVERSIONS,
        "doc_chunks": SQL_DOC_CHUNKS,
    }
