"""Batch-I operators (left outer join, winsorize, DENSE_RANK, k-means):
DuckDB-parity gate in pytest + structural invariants."""

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
    from text_extraction_ray.pipelines.queries_r3i import parity_sql_r3i

    return sorted(parity_sql_r3i())


def _to_pandas(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


@pytest.mark.parametrize("name", _names())
def test_r3i_query_matches_duckdb(ray_session, name):
    from text_extraction_ray.pipelines.queries_r3i import (
        parity_sql_r3i,
        queries_r3i,
    )

    got = _to_pandas(queries_r3i()[name](SF_DIR))
    want = _duck(parity_sql_r3i()[name])
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    assert _mset(got) == _mset(want), name


def test_r3i_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3i import (parity_sql_r3i,
        queries_r3i)

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    par = set(parity_sql_r3i())
    for n in queries_r3i():
        assert n in qs, n
        assert (n in osql) == (n in par), n
    assert names[49:51] == ["extract_pages_parity", "extract_pages"]
    # pdf_tables heads the rows-only tail, right after the oracled
    # block (50-row driver window + 55 batch-parity oracles)
    assert names[len(osql) + 1] == "pdf_tables"


def test_left_outer_exercises_unmatched(ray_session):
    """The left join genuinely produces zero-filled rows — otherwise
    the test proves nothing about outer semantics."""
    from text_extraction_ray.pipelines.queries_r3i import (
        q_cust_big_orders_left,
    )

    df = _to_pandas(q_cust_big_orders_left(SF_DIR))
    assert (df.n_big == 0).any()
    assert ((df.n_big == 0) == (df.big_total == 0)).all()
    ncust = _duck("SELECT COUNT(*) AS n FROM customer").n[0]
    assert len(df) == ncust


def test_winsorize_only_touches_tails(ray_session):
    """Roughly 2% of rows per type change, and clipped values equal the
    group bounds."""
    from text_extraction_ray.pipelines.queries_r3i import (
        q_events_winsorize,
    )

    got = _to_pandas(q_events_winsorize(SF_DIR))
    raw = _duck("SELECT event_id, value FROM events")
    m = got.merge(raw, on="event_id")
    changed = (m.value_w - m.value).abs() > 1e-9
    frac = changed.mean()
    assert 0.005 < frac < 0.05
    # unclipped rows pass through bit-exactly (mod 6dp rounding)
    assert np.allclose(m.value_w[~changed], m.value[~changed].round(6))


def test_dense_rank_vs_row_number(ray_session):
    """dr <= ROW_NUMBER everywhere, with equality iff no earlier tie in
    the partition; max dr per customer = distinct dates."""
    from text_extraction_ray.pipelines.queries_r3i import (
        q_orders_dense_rank,
    )

    df = _to_pandas(q_orders_dense_rank(SF_DIR))
    want = _duck("""
        SELECT o_custkey,
               COUNT(DISTINCT o_orderdate) AS nd
        FROM orders GROUP BY 1""")
    got_max = df.groupby("o_custkey").dr.max().reset_index()
    m = got_max.merge(want, on="o_custkey")
    assert (m.dr == m.nd).all()


def test_kmeans_invariants(ray_session):
    """Inertia decreases monotonically over iterations; every vector's
    cluster is the argmin against the final centroids; all k clusters
    survive; rerun is deterministic."""
    from text_extraction_ray.pipelines.queries_r3i import (
        _KM_K,
        _km_centroids,
        q_embeddings_kmeans,
    )

    cents, inertia = _km_centroids(SF_DIR)
    assert all(inertia[i + 1] <= inertia[i] + 1e-6
               for i in range(len(inertia) - 1))
    df = _to_pandas(q_embeddings_kmeans(SF_DIR))
    assert df.cluster.nunique() == _KM_K
    emb = _duck("SELECT vec_id, embedding FROM embeddings")
    X = np.array(emb.embedding.tolist(), dtype=np.float64)
    d2 = ((X * X).sum(1)[:, None] - 2.0 * X @ cents.T
          + (cents * cents).sum(1)[None, :])
    want = d2.argmin(1)
    got = df.set_index("vec_id").loc[emb.vec_id].cluster.to_numpy()
    assert (got == want).all()
    again = _to_pandas(q_embeddings_kmeans(SF_DIR))
    assert _mset(df) == _mset(again)
