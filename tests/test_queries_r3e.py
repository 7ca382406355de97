"""Batch-E operators (unpivot, argmax, regex extract, z-score,
transitions): DuckDB-parity gate in pytest + structural invariants."""

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
    from text_extraction_ray.pipelines.queries_r3e import parity_sql_r3e

    return sorted(parity_sql_r3e())


@pytest.mark.parametrize("name", _names())
def test_r3e_query_matches_duckdb(ray_session, name):
    from text_extraction_ray.pipelines.queries_r3e import (
        parity_sql_r3e,
        queries_r3e,
    )

    got = queries_r3e()[name](SF_DIR).to_pandas()
    want = _duck(parity_sql_r3e()[name])
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    assert _mset(got) == _mset(want), name


def test_r3e_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3e import (parity_sql_r3e,
        queries_r3e)

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    par = set(parity_sql_r3e())
    for n in queries_r3e():
        assert n in qs, n
        assert (n in osql) == (n in par), n
    assert names[49:51] == ["extract_pages_parity", "extract_pages"]
    # pdf_tables heads the rows-only tail, right after the oracled
    # block (50-row driver window + 55 batch-parity oracles)
    assert names[len(osql) + 1] == "pdf_tables"


def test_unpivot_inverts_pivot(ray_session):
    """melt(pivot(x)) re-aggregates to the plain long groupby, zeros
    preserved where a (day, type) cell had no events."""
    from text_extraction_ray.pipelines.queries_r3e import q_events_unpivot

    long = q_events_unpivot(SF_DIR).to_pandas()
    raw = _duck("""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2""")
    long["day"] = pd.to_datetime(long.day).astype("datetime64[ns]")
    raw["day"] = pd.to_datetime(raw.day).astype("datetime64[ns]")
    merged = long.merge(raw, on=["day", "event_type"], how="left",
                        suffixes=("", "_raw"))
    filled = merged.n_raw.fillna(0).astype(int)
    assert (merged.n == filled).all()
    # dense grid: exactly one long row per (day, type) cell
    assert len(long) == long.day.nunique() * long.event_type.nunique()


def test_zscore_group_stats(ray_session):
    """Within each lang: mean(z) ~ 0, std(z, ddof=1) ~ 1."""
    from text_extraction_ray.pipelines.queries_r3e import q_docs_zscore

    df = q_docs_zscore(SF_DIR).to_pandas()
    for lang, g in df.groupby("lang"):
        if len(g) > 2:
            assert abs(g.z.mean()) < 1e-4
            assert abs(g.z.std(ddof=1) - 1) < 1e-4


def test_transitions_mass(ray_session):
    """Total transitions = total events - number of users (each user
    stream of length L contributes L-1 bigrams)."""
    from text_extraction_ray.pipelines.queries_r3e import (
        q_event_transitions,
    )

    df = q_event_transitions(SF_DIR).to_pandas()
    counts = _duck("SELECT COUNT(*) AS n, COUNT(DISTINCT user_id) AS u "
                   "FROM events")
    assert int(df.n.sum()) == int(counts.n[0]) - int(counts.u[0])
