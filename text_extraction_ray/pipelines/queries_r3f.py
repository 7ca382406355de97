"""Round-3 continuation batch F: calendar/window breadth + fuzzy match +
quality signals.

Six operators: month-over-month growth (window over a distributed
aggregate), zero-filled dense calendar grid (the gap-fill every
time-series pipeline needs), NTILE(4) per group, LEAD/FIRST_VALUE/
LAST_VALUE window triplet, dictionary-level fuzzy name matching with a
from-scratch pair-vectorized Levenshtein DP, and Gopher-style
repetition / type-token-ratio quality signals over documents.

Registered rows-only (driver 50-row window frozen); DuckDB parity twins
run in tests/test_queries_r3f.
"""

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


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    return col.combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False)


# --- W11: month-over-month growth (window over aggregate) ----------------------

def q_orders_monthly_growth(sf_dir: str) -> pa.Table:
    """Monthly revenue + % growth vs the previous month.  The heavy part
    (summing every order) is a distributed partial-sum per month; the
    window (LAG + ratio) runs on the driver over the aggregate, which is
    bounded by the calendar — ≤ 12 rows/year no matter how many orders.
    Revenue rounds to 2dp BEFORE the ratio so both engines divide the
    same doubles."""
    def partial(b: pa.Table) -> pa.Table:
        d = _ts_us(b.column("o_orderdate"))
        month = d.astype("datetime64[us]").astype(
            "datetime64[M]").astype(np.int64)  # months since epoch
        price = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(month, return_inverse=True)
        return pa.table({
            "month_i": pa.array(uniq),
            "rev_part": pa.array(np.bincount(inv, weights=price)),
        })

    rows = (_read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
            .map_batches(partial, **_PYA)
            .groupby("month_i")
            .aggregate(Sum("rev_part", alias_name="revenue"))
            .take_all())
    rows.sort(key=lambda r: r["month_i"])
    rev = _round_half_up(
        np.array([r["revenue"] for r in rows], dtype=np.float64), 2)
    pct = np.full(len(rev), np.nan)
    if len(rev) > 1:
        pct[1:] = _round_half_up(
            100.0 * (rev[1:] - rev[:-1]) / rev[:-1], 6)
    months = np.array([r["month_i"] for r in rows],
                      dtype="datetime64[M]").astype("datetime64[us]")
    return pa.table({
        "month": pa.array(months),
        "revenue": pa.array(rev),
        "pct_growth": pa.array(
            [None if np.isnan(p) else p for p in pct],
            type=pa.float64()),
    })


SQL_ORDERS_MONTHLY_GROWTH = """
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         ROUND(SUM(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1)
SELECT month, revenue,
       ROUND(100.0 * (revenue - LAG(revenue) OVER (ORDER BY month))
             / LAG(revenue) OVER (ORDER BY month), 6) AS pct_growth
FROM m
"""


# --- G22: zero-filled dense calendar grid (gap-fill) ---------------------------

def q_events_gapfill(sf_dir: str) -> pa.Table:
    """Dense day × event_type count grid with explicit zeros.  The
    distributed part aggregates per (day, type); the densification
    reindexes that aggregate against the full calendar range on the
    driver — bounded by days × |type domain|, independent of event
    count.  (The oracled pivot covers the wide layout; this is the long
    gap-filled layout feeding forecasting / anomaly jobs.)"""
    def partial(b: pa.Table) -> pa.Table:
        us = _ts_us(b.column("ts"))
        day = (us // 86_400_000_000).astype(np.int64)
        types = np.asarray(b.column("event_type").to_pylist(),
                           dtype=object)
        tu, ti = np.unique(types, return_inverse=True)
        key = day * len(tu) + ti
        ku, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "day_i": pa.array(ku // len(tu)),
            "event_type": pa.array(tu[ku % len(tu)].tolist(),
                                   type=pa.string()),
            "n_part": pa.array(cnt, type=pa.int64()),
        })

    rows = (_read(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, **_PYA)
            .groupby(["day_i", "event_type"])
            .aggregate(Sum("n_part", alias_name="n"))
            .take_all())
    days = np.array([r["day_i"] for r in rows], dtype=np.int64)
    types = sorted({r["event_type"] for r in rows})
    tidx = {t: i for i, t in enumerate(types)}
    lo, hi = int(days.min()), int(days.max())
    n_days = hi - lo + 1
    grid = np.zeros((n_days, len(types)), dtype=np.int64)
    for r in rows:
        grid[r["day_i"] - lo, tidx[r["event_type"]]] = r["n"]
    day_col = np.repeat(
        (np.arange(lo, hi + 1) * 86_400_000_000).astype("datetime64[us]"),
        len(types))
    return pa.table({
        "day": pa.array(day_col),
        "event_type": pa.array(types * n_days, type=pa.string()),
        "n": pa.array(grid.reshape(-1)),
    })


SQL_EVENTS_GAPFILL = """
WITH days AS (
  SELECT UNNEST(generate_series(
    (SELECT MIN(CAST(ts AS DATE)) FROM events),
    (SELECT MAX(CAST(ts AS DATE)) FROM events),
    INTERVAL 1 DAY)) AS day),
agg AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2)
SELECT CAST(d.day AS TIMESTAMP) AS day, t.event_type,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n
FROM days d
CROSS JOIN (SELECT DISTINCT event_type FROM events) t
LEFT JOIN agg a
  ON CAST(d.day AS DATE) = a.day AND t.event_type = a.event_type
"""


# --- K6: NTILE per group -------------------------------------------------------

def _ntile(pos: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) for 0-based positions within an n-row partition:
    the first n % k tiles get one extra row."""
    base, rem = divmod(n, k)
    if base == 0:
        return pos + 1
    cut = rem * (base + 1)
    tile = np.where(pos < cut,
                    pos // (base + 1),
                    rem + (pos - cut) // base)
    return tile + 1


def q_orders_ntile(sf_dir: str) -> ray.data.Dataset:
    """NTILE(4) of each customer's orders by price — the quartile
    bucketing used for spend segmentation.  Same 64-bucket + lexsort
    machinery as ROW_NUMBER (orders_rank): partitions shuffle once into
    hash buckets, each group computes every customer's tiles
    vectorized (boundary diff → per-partition sizes → closed-form tile
    from position)."""
    def add_bucket(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array((ck % 64).astype(np.int64)))

    def tiles(g: pa.Table) -> pa.Table:
        ck = g.column("o_custkey").to_numpy(zero_copy_only=False)
        ok = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        price = g.column("o_totalprice").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, price, ck))
        cks, oks, prices = ck[order], ok[order], price[order]
        n = len(cks)
        starts = np.flatnonzero(
            np.concatenate(([True], cks[1:] != cks[:-1])))
        sizes = np.diff(np.concatenate((starts, [n])))
        pos = np.arange(n) - np.repeat(starts, sizes)
        size_col = np.repeat(sizes, sizes)
        tile = np.empty(n, dtype=np.int64)
        for sz in np.unique(sizes):
            m = size_col == sz
            tile[m] = _ntile(pos[m], int(sz), 4)
        return pa.table({
            "o_orderkey": pa.array(oks),
            "o_custkey": pa.array(cks),
            "o_totalprice": pa.array(prices),
            "tile": pa.array(tile),
        })

    return (_read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_totalprice"])
            .map_batches(add_bucket, **_PYA)
            .groupby("bucket")
            .map_groups(tiles, batch_format="pyarrow"))


SQL_ORDERS_NTILE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(NTILE(4) OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice, o_orderkey) AS BIGINT)
         AS tile
FROM orders
"""


# --- W12: LEAD / FIRST_VALUE / LAST_VALUE --------------------------------------

def q_events_lead(sf_dir: str) -> ray.data.Dataset:
    """The remaining navigation-window triplet (LAG shipped in batch C):
    per user in (ts, event_id) order — the NEXT event's type plus the
    first and last value of the whole partition.  Bucketed lexsort;
    first/last materialize by indexing the partition boundary rows and
    repeating, no per-group Python."""
    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array((ids % 64).astype(np.int64)))

    def nav(g: pa.Table) -> pa.Table:
        user = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = _ts_us(g.column("ts"))
        val = g.column("value").to_numpy(zero_copy_only=False)
        types = np.asarray(g.column("event_type").to_pylist(),
                           dtype=object)
        order = np.lexsort((eid, ts, user))
        u, e, v, t = user[order], eid[order], val[order], types[order]
        n = len(u)
        starts = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1])))
        sizes = np.diff(np.concatenate((starts, [n])))
        ends = starts + sizes - 1
        nxt = np.empty(n, dtype=object)
        if n:
            nxt[:-1] = t[1:]
            nxt[-1] = None
        nxt[ends] = None
        return pa.table({
            "event_id": pa.array(e),
            "user_id": pa.array(u),
            "next_type": pa.array(nxt.tolist(), type=pa.string()),
            "first_value": pa.array(np.repeat(v[starts], sizes)),
            "last_value": pa.array(np.repeat(v[ends], sizes)),
        })

    return (_read(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type", "value"])
            .map_batches(add_bucket, **_PYA)
            .groupby("bucket")
            .map_groups(nav, batch_format="pyarrow"))


SQL_EVENTS_LEAD = """
SELECT event_id, user_id,
       LEAD(event_type) OVER w AS next_type,
       FIRST_VALUE(value) OVER w AS first_value,
       LAST_VALUE(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- F1: dictionary-level fuzzy name match (vectorized Levenshtein) ------------

def _levenshtein_pairs(a_list: list[str], b_list: list[str]) -> np.ndarray:
    """Edit distance for P string pairs at once, vectorized ACROSS the
    pairs: pad to (P, L) uint8 matrices, run the classic DP with the two
    char loops outside and every cell update an O(P) numpy op.  For
    names ≤ ~32 chars that is ≤ ~1k vector ops regardless of P — the
    per-pair-Python-DP alternative is 100× slower at bench scale."""
    P = len(a_list)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.array([len(s) for s in a_list], dtype=np.int64)
    lb = np.array([len(s) for s in b_list], dtype=np.int64)
    La, Lb = int(la.max()), int(lb.max())
    A = np.zeros((P, La), dtype=np.uint8)
    B = np.zeros((P, Lb), dtype=np.uint8)
    for i, s in enumerate(a_list):
        A[i, :len(s)] = np.frombuffer(s.encode("latin-1"), dtype=np.uint8)
    for i, s in enumerate(b_list):
        B[i, :len(s)] = np.frombuffer(s.encode("latin-1"), dtype=np.uint8)
    # dp rows over a's chars; each row scanned left-to-right over b's.
    prev = np.tile(np.arange(Lb + 1, dtype=np.int64), (P, 1))
    out = np.where(la == 0, lb, 0)
    for i in range(1, La + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, Lb + 1):
            sub = prev[:, j - 1] + (ai != B[:, j - 1])
            cur[:, j] = np.minimum(
                sub, np.minimum(prev[:, j], cur[:, j - 1]) + 1)
        # pairs whose a ends exactly here read their answer at b's end
        done = la == i
        if done.any():
            out[done] = cur[done, lb[done]]
        prev = cur
    return out


def q_part_name_fuzzy(sf_dir: str) -> ray.data.Dataset:
    """Fuzzy name matching at the DICTIONARY level: distinct
    (brand, name) terms with their multiplicities, then every
    within-brand name pair at edit distance ≤ 2 with the implied pair
    count (c_a × c_b).  Matching distinct terms instead of raw rows is
    the entity-resolution shape that survives scale: raw-pair output is
    quadratic in name multiplicity (156 k pairs at sf0.1 from 64
    distinct names), while the dictionary is Zipf-bounded and the
    distance DP runs once per distinct pair.  Shuffles: one groupby to
    build the dictionary, one per-brand map_groups for the pair DP —
    fact rows never move twice."""
    def pairs(g: pa.Table) -> pa.Table:
        names = np.asarray(g.column("p_name").to_pylist(), dtype=object)
        cnt = g.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(names)
        names, cnt = names[order], cnt[order]
        n = len(names)
        ia, ib = np.triu_indices(n, k=1)
        if len(ia):
            # |len| difference > 2 can never reach distance ≤ 2
            ln = np.array([len(s) for s in names], dtype=np.int64)
            keep = np.abs(ln[ia] - ln[ib]) <= 2
            ia, ib = ia[keep], ib[keep]
        dist = _levenshtein_pairs(names[ia].tolist(), names[ib].tolist())
        hit = dist <= 2
        ia, ib, dist = ia[hit], ib[hit], dist[hit]
        brand = g.column("p_brand")[0].as_py() if g.num_rows else ""
        return pa.table({
            "p_brand": pa.array([brand] * len(ia), type=pa.string()),
            "name_a": pa.array(names[ia].tolist(), type=pa.string()),
            "name_b": pa.array(names[ib].tolist(), type=pa.string()),
            "dist": pa.array(dist, type=pa.int64()),
            "n_pairs": pa.array(cnt[ia] * cnt[ib], type=pa.int64()),
        })

    return (_read(sf_dir, "part", ["p_brand", "p_name"])
            .groupby(["p_brand", "p_name"])
            .aggregate(Count(alias_name="c"))
            .groupby("p_brand")
            .map_groups(pairs, batch_format="pyarrow"))


SQL_PART_NAME_FUZZY = """
WITH d AS (
  SELECT p_brand, p_name, COUNT(*) AS c FROM part GROUP BY 1, 2)
SELECT a.p_brand, a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
       CAST(a.c * b.c AS BIGINT) AS n_pairs
FROM d a JOIN d b
  ON a.p_brand = b.p_brand AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


# --- T2: repetition / type-token-ratio quality signals -------------------------

def q_docs_ttr(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style repetition signals per document: type-token ratio
    and the token fraction covered by the single most repeated bigram.
    Doc-local, so embarrassingly parallel; the kernel is batch-level
    numpy over Arrow list offsets (split once, factorize tokens once,
    bigram keys as int64 pairs) — no per-document Python.  Docs with
    fewer than 2 tokens have no bigram and are dropped, matching the
    SQL inner join."""
    def signals(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), pattern=" ")
        toks = toks.combine_chunks()
        flat = toks.flatten()
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        n_toks = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tok_ids = flat.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_docs = b.num_rows
        V = int(tok_ids.max()) + 1 if len(tok_ids) else 1
        # distinct (doc, token) pairs → types per doc
        tkey = parent * V + tok_ids
        n_types = np.bincount(
            np.unique(tkey) // V, minlength=n_docs).astype(np.int64)
        # consecutive same-doc pairs → bigram keys per doc
        same = parent[1:] == parent[:-1] if len(parent) else \
            np.zeros(0, dtype=bool)
        bdoc = parent[:-1][same]
        bkey = (bdoc * V + tok_ids[:-1][same]) * V + tok_ids[1:][same]
        ukey, cnt = np.unique(bkey, return_counts=True)
        udoc = (ukey // V) // V
        top = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(top, udoc, cnt)
        keep = n_toks >= 2
        doc_id = b.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        ttr = 1.0 * n_types[keep] / n_toks[keep]
        frac = 2.0 * top[keep] / n_toks[keep]
        return pa.table({
            "doc_id": pa.array(doc_id),
            "ttr": pa.array(_round_half_up(ttr, 6)),
            "top_bigram_frac": pa.array(_round_half_up(frac, 6)),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]
                 ).map_batches(signals, **_PYA)


SQL_DOCS_TTR = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
bg AS (
  SELECT t1.doc_id, t1.tok || ' ' || t2.tok AS bigram
  FROM toks t1 JOIN toks t2
    ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1),
bgc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
top AS (SELECT doc_id, MAX(c) AS top_c FROM bgc GROUP BY 1),
tt AS (
  SELECT doc_id, COUNT(DISTINCT tok) AS n_types, COUNT(*) AS n_toks
  FROM toks GROUP BY 1)
SELECT tt.doc_id,
       ROUND(1.0 * n_types / n_toks, 6) AS ttr,
       ROUND(2.0 * top_c / n_toks, 6) AS top_bigram_frac
FROM tt JOIN top ON tt.doc_id = top.doc_id
"""


def queries_r3f() -> dict:
    return {
        "orders_monthly_growth": q_orders_monthly_growth,
        "events_gapfill": q_events_gapfill,
        "orders_ntile": q_orders_ntile,
        "events_lead": q_events_lead,
        "part_name_fuzzy": q_part_name_fuzzy,
        "docs_ttr": q_docs_ttr,
    }


def parity_sql_r3f() -> dict[str, str]:
    """DuckDB twins for the pytest parity gate (NOT driver oracles)."""
    return {
        "orders_monthly_growth": SQL_ORDERS_MONTHLY_GROWTH,
        "events_gapfill": SQL_EVENTS_GAPFILL,
        "orders_ntile": SQL_ORDERS_NTILE,
        "events_lead": SQL_EVENTS_LEAD,
        "part_name_fuzzy": SQL_PART_NAME_FUZZY,
        "docs_ttr": SQL_DOCS_TTR,
    }
