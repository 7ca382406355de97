"""Batch-C operators: DuckDB-parity gate run IN PYTEST (rows-only in the
driver registry — 50-row window frozen — same harness as
test_queries_r3/test_queries_r3b) plus structural invariants."""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).df()


def _norm(v):
    try:
        if pd.isna(v):
            return "null"
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def _mset(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(tuple(_norm(v) for v in row)
                  for row in df[cols].itertuples(index=False, name=None))


def _names():
    from text_extraction_ray.pipelines.queries_r3c import parity_sql_r3c

    return sorted(parity_sql_r3c())


def _to_df(res):
    return res.to_pandas()


@pytest.mark.parametrize("name", _names())
def test_r3c_query_matches_duckdb(ray_session, name):
    from text_extraction_ray.pipelines.queries_r3c import (
        parity_sql_r3c,
        queries_r3c,
    )

    got = _to_df(queries_r3c()[name](SF_DIR))
    want = _duck(parity_sql_r3c()[name])
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    assert _mset(got) == _mset(want), name


def test_r3c_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3c import (parity_sql_r3c,
        queries_r3c)

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    par = set(parity_sql_r3c())
    for n in queries_r3c():
        assert n in qs, n
        assert (n in osql) == (n in par), n
    assert names[49:51] == ["extract_pages_parity", "extract_pages"]
    # pdf_tables heads the rows-only tail, right after the oracled
    # block (50-row driver window + 55 batch-parity oracles)
    assert names[len(osql) + 1] == "pdf_tables"


def test_quantiles_match_full_sort(ray_session):
    """The three-pass selection picks exactly the ceil(q*n)-th element
    of the fully sorted column."""
    from text_extraction_ray.pipelines.queries_r3c import (
        _QUANTILES,
        q_orders_quantile_disc,
    )
    import pyarrow.parquet as pq

    got = q_orders_quantile_disc(SF_DIR).to_pandas()
    x = np.sort(pq.read_table(SF_DIR + "/orders.parquet",
                              columns=["o_totalprice"])
                .column("o_totalprice").to_numpy())
    for q in _QUANTILES:
        k = int(np.ceil(q * len(x)))
        want = x[k - 1]
        assert float(got[got.q == q]["value"].iloc[0]) == want, q


def test_hopping_window_mass_conservation(ray_session):
    """Every event lands in exactly WIN_HOPS windows: total n_events is
    3x the raw event count and total sum_value is 3x the raw sum."""
    from text_extraction_ray.pipelines.queries_r3c import (
        _HOP_US,
        _WIN_HOPS,
        q_events_hopping,
    )
    import pyarrow.parquet as pq

    df = q_events_hopping(SF_DIR).to_pandas()
    raw = pq.read_table(SF_DIR + "/events.parquet", columns=["value"])
    assert int(df.n_events.sum()) == _WIN_HOPS * raw.num_rows
    assert abs(df.sum_value.sum()
               - _WIN_HOPS * float(
                   np.sum(raw.column("value").to_numpy()))) < 1.0
    assert (df.window_start_us % _HOP_US == 0).all()


def test_percent_rank_bounds_and_extremes(ray_session):
    """pr in [0,1]; per lang the min-length docs get 0 and (when the
    max length is unique) the max-length doc gets 1."""
    from text_extraction_ray.pipelines.queries_r3c import (
        q_docs_percent_rank,
    )

    df = q_docs_percent_rank(SF_DIR).to_pandas()
    assert ((df.pr >= 0) & (df.pr <= 1)).all()
    for lang, g in df.groupby("lang"):
        if len(g) > 1:
            assert g.loc[g.n_chars.idxmin(), "pr"] == 0.0
            mx = g.n_chars.max()
            if (g.n_chars == mx).sum() == 1:
                assert g.loc[g.n_chars.idxmax(), "pr"] == 1.0


def test_shipping_priority_is_true_top10(ray_session):
    """The distributed top-k equals the head of the full DuckDB ranking
    (not just any 10 matching rows)."""
    from text_extraction_ray.pipelines.queries_r3c import (
        q_shipping_priority,
    )

    got = q_shipping_priority(SF_DIR).to_pandas()
    full = _duck("""
        SELECT o_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, o_orderkey
    """)
    assert list(got.o_orderkey) == list(full.o_orderkey.head(10))
