"""Batch-G operators (CUBE, robust stats, percentile_cont, Q5
composite, entropy, count-min sketch): DuckDB-parity gate in pytest +
structural invariants."""

import duckdb
import numpy as np
import pandas as pd
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
    from text_extraction_ray.pipelines.queries_r3g import parity_sql_r3g

    return sorted(parity_sql_r3g())


def _to_pandas(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


@pytest.mark.parametrize("name", _names())
def test_r3g_query_matches_duckdb(ray_session, name):
    from text_extraction_ray.pipelines.queries_r3g import (
        parity_sql_r3g,
        queries_r3g,
    )

    got = _to_pandas(queries_r3g()[name](SF_DIR))
    want = _duck(parity_sql_r3g()[name])
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    assert _mset(got) == _mset(want), name


def test_r3g_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3g import (parity_sql_r3g,
        queries_r3g)

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    par = set(parity_sql_r3g())
    for n in queries_r3g():
        assert n in qs, n
        assert (n in osql) == (n in par), n
    assert names[49:51] == ["extract_pages_parity", "extract_pages"]
    # pdf_tables heads the rows-only tail, right after the oracled
    # block (50-row driver window + 55 batch-parity oracles)
    assert names[len(osql) + 1] == "pdf_tables"


def test_cms_never_underestimates_and_bounded(ray_session):
    """The count-min property: every estimate >= the true count, and the
    overestimate stays within the standard e·N/width bound (deterministic
    here — fixed FNV salts, fixed corpus)."""
    from text_extraction_ray.pipelines.queries_r3g import (
        q_heavy_tokens_cms,
    )

    df = _to_pandas(q_heavy_tokens_cms(SF_DIR))
    assert len(df) > 0
    assert (df.n_cms >= df.n_exact).all()
    total = _duck("""
        SELECT SUM(LENGTH(string_split(text, ' '))) AS n
        FROM documents""").n[0]
    bound = np.ceil(np.e * float(total) / 8192.0)
    assert (df.n_cms - df.n_exact <= bound).all()


def test_cms_exact_agrees_with_duckdb(ray_session):
    """The n_exact column (exact heavy hitters) re-derives from SQL."""
    from text_extraction_ray.pipelines.queries_r3g import (
        q_heavy_tokens_cms,
    )

    df = _to_pandas(q_heavy_tokens_cms(SF_DIR))
    want = _duck("""
        WITH toks AS (
          SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents),
        c AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
        t AS (SELECT SUM(n) AS total FROM c)
        SELECT tok, n FROM c, t WHERE n >= CEIL(total / 200.0)
        ORDER BY tok""")
    assert df.token.tolist() == want.tok.tolist()
    assert df.n_exact.tolist() == want.n.astype(int).tolist()


def test_cube_lattice_consistency(ray_session):
    """Every coarser grouping set re-aggregates exactly from the finest
    one (ints exact; sums to the cent)."""
    from text_extraction_ray.pipelines.queries_r3g import q_orders_cube

    df = _to_pandas(q_orders_cube(SF_DIR)).fillna({"o_orderstatus": "@",
                                                   "o_orderpriority": "@"})
    base = df[(df.o_orderstatus != "@") & (df.o_orderpriority != "@")]
    top = df[(df.o_orderstatus == "@") & (df.o_orderpriority == "@")]
    assert len(top) == 1
    assert int(top.n.iloc[0]) == int(base.n.sum())
    assert abs(float(top.sum_price.iloc[0]) - base.sum_price.sum()) < 0.02
    by_status = df[(df.o_orderstatus != "@") & (df.o_orderpriority == "@")]
    want = base.groupby("o_orderstatus").n.sum()
    got = by_status.set_index("o_orderstatus").n
    assert got.sort_index().tolist() == want.sort_index().tolist()


def test_robust_resists_outliers():
    """Sanity of the estimator itself: median/MAD shrug at a huge
    outlier that would wreck mean/std."""
    from text_extraction_ray.pipelines.queries_r3g import _interp_quantile

    vals = np.array([1.0, 2.0, 3.0, 4.0, 1e9])
    cnts = np.ones(5, dtype=np.int64)
    assert _interp_quantile(vals, cnts, 0.5) == 3.0


def test_q5_revenue_positive_and_region_scoped(ray_session):
    """Every output nation belongs to the filtered region."""
    from text_extraction_ray.pipelines.queries_r3g import (
        _Q5_REGION,
        q_local_supplier_volume,
    )

    df = _to_pandas(q_local_supplier_volume(SF_DIR))
    asia = _duck(f"""
        SELECT n_name FROM nation JOIN region
          ON n_regionkey = r_regionkey
        WHERE r_name = '{_Q5_REGION}'""").n_name.tolist()
    assert set(df.n_name) <= set(asia)
    assert (df.revenue > 0).all()
