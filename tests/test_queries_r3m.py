"""Batch-M operators (integrity check, global NTILE deciles,
ratio-to-report): DuckDB-parity gate + structural invariants."""

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
    from text_extraction_ray.pipelines.queries_r3m import parity_sql_r3m

    return sorted(parity_sql_r3m())


def _to_pandas(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


@pytest.mark.parametrize("name", _names())
def test_r3m_query_matches_duckdb(ray_session, name):
    from text_extraction_ray.pipelines.queries_r3m import (
        parity_sql_r3m,
        queries_r3m,
    )

    got = _to_pandas(queries_r3m()[name](SF_DIR))
    want = _duck(parity_sql_r3m()[name])
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    assert _mset(got) == _mset(want), name


def test_r3m_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3m import (parity_sql_r3m,
        queries_r3m)

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    par = set(parity_sql_r3m())
    for n in queries_r3m():
        assert n in qs, n
        assert (n in osql) == (n in par), n
    assert names[49:51] == ["extract_pages_parity", "extract_pages"]
    # pdf_tables heads the rows-only tail, right after the oracled
    # block (50-row driver window + 55 batch-parity oracles)
    assert names[len(osql) + 1] == "pdf_tables"


def test_orphan_count_detects_violations(ray_session):
    """A corrupted fixture (dangling keys) produces exact nonzero
    orphan counts — the checker's violation path."""
    import ray as _ray

    from text_extraction_ray.pipelines.queries_r3m import orphan_count

    fact = pa.table({"fk": pa.array([1, 2, 3, 99, 98, 2],
                                    type=pa.int64())})
    dim = pa.table({"pk": pa.array([1, 2, 3], type=pa.int64())})
    n_orph, n_rows = orphan_count(
        _ray.data.from_arrow(fact).repartition(3), "fk",
        _ray.data.from_arrow(dim), "pk")
    assert (n_orph, n_rows) == (2, 6)


def test_decile_sizes_balanced(ray_session):
    """All 10 deciles exist with sizes differing by at most one, larger
    first — the global NTILE contract."""
    from text_extraction_ray.pipelines.queries_r3m import q_orders_decile

    df = _to_pandas(q_orders_decile(SF_DIR))
    sizes = df.groupby("decile").size()
    assert list(sizes.index) == list(range(1, 11))
    assert sizes.max() - sizes.min() <= 1
    assert (sizes.diff().dropna() <= 0).all()


def test_revenue_share_sums_to_100(ray_session):
    from text_extraction_ray.pipelines.queries_r3m import (
        q_nation_revenue_share,
    )

    df = _to_pandas(q_nation_revenue_share(SF_DIR))
    assert abs(df.pct_share.sum() - 100.0) < 1e-3
    assert (df.pct_share > 0).all()
