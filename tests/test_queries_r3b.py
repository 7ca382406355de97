"""Round-3 continuation batch: DuckDB-parity gate run IN PYTEST (these
queries are rows-only in the driver registry — the 50-row CORRECTNESS
window stays 48 oracled + extract_pages + pdf_tables — so the
rows+schema+values check lives here, same harness as test_queries_r3)."""

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
    from text_extraction_ray.pipelines.queries_r3b import parity_sql_r3b

    return sorted(parity_sql_r3b())


def _to_df(res):
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


@pytest.mark.parametrize("name", _names())
def test_r3b_query_matches_duckdb(ray_session, name):
    from text_extraction_ray.pipelines.queries_r3b import (
        parity_sql_r3b,
        queries_r3b,
    )

    got = _to_df(queries_r3b()[name](SF_DIR))
    want = _duck(parity_sql_r3b()[name])
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    assert _mset(got) == _mset(want), name


def test_r3b_registered_rows_only(ray_session):
    """New queries registered; parity names are driver-facing oracles
    (merged round 3), the rest rows-only; window allocation intact."""
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3b import (parity_sql_r3b,
        queries_r3b)

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    par = set(parity_sql_r3b())
    for n in queries_r3b():
        assert n in qs, n
        assert (n in osql) == (n in par), n
    assert names[49:51] == ["extract_pages_parity", "extract_pages"]
    # pdf_tables heads the rows-only tail, right after the oracled
    # block (50-row driver window + 55 batch-parity oracles)
    assert names[len(osql) + 1] == "pdf_tables"


def test_chunking_covers_and_overlaps(ray_session):
    """Every character of every doc appears in at least one chunk;
    consecutive chunks of a doc overlap by len-stride characters."""
    from text_extraction_ray.pipelines.queries_r3b import (
        CHUNK_LEN,
        CHUNK_STRIDE,
        q_doc_chunks,
    )

    df = q_doc_chunks("/root/testdata/sf0.001").to_pandas()
    import pyarrow.parquet as pq

    texts = dict(zip(
        *pq.read_table("/root/testdata/sf0.001/documents.parquet",
                       columns=["doc_id", "text"]).to_pydict().values()))
    for doc_id, g in df.groupby("doc_id"):
        text = texts[doc_id]
        g = g.sort_values("chunk_id")
        joined = g.iloc[0]["chunk"]
        for _, row in g.iloc[1:].iterrows():
            k = int(row["chunk_id"])
            assert row["chunk"] == text[k * CHUNK_STRIDE:
                                        k * CHUNK_STRIDE + CHUNK_LEN]
            joined = joined[:k * CHUNK_STRIDE] + row["chunk"]
        assert joined == text, doc_id


def test_set_ops_partition_users(ray_session):
    """INTERSECT + EXCEPT partition the click-user set."""
    from text_extraction_ray.pipelines.queries_r3b import (
        q_users_click_and_purchase,
        q_users_click_not_purchase,
    )

    both = set(q_users_click_and_purchase(SF_DIR).to_pandas()["user_id"])
    only = set(q_users_click_not_purchase(SF_DIR).to_pandas()["user_id"])
    assert both and only, "threshold should make both sides non-trivial"
    assert both.isdisjoint(only)
    clickers = set(_duck(
        "SELECT DISTINCT user_id FROM events WHERE event_type='click'"
    )["user_id"])
    assert both | only == clickers


def test_rollup_levels_consistent(ray_session):
    """Subtotals equal the sum of their finest rows; grand total equals
    the sum of subtotals (exactly, for counts)."""
    from text_extraction_ray.pipelines.queries_r3b import q_orders_rollup

    df = q_orders_rollup(SF_DIR).to_pandas()
    finest = df[df.o_orderstatus.notna()]
    subs = df[df.o_orderstatus.isna() & df.o_orderpriority.notna()]
    grand = df[df.o_orderpriority.isna()]
    assert len(grand) == 1
    assert int(grand.n_orders.iloc[0]) == int(finest.n_orders.sum())
    for _, row in subs.iterrows():
        sel = finest[finest.o_orderpriority == row.o_orderpriority]
        assert int(row.n_orders) == int(sel.n_orders.sum())
        assert abs(float(row.sum_price) - float(sel.sum_price.sum())) < 0.05


def test_lag_matches_pandas_recompute(ray_session):
    """Cross-check the lexsort LAG against a straight pandas groupby
    shift on the small fixture."""
    from text_extraction_ray.pipelines.queries_r3b import q_events_lag

    got = (q_events_lag("/root/testdata/sf0.001").to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["delta_value"] = ev.groupby("user_id")["value"].diff()
    ev["gap_us"] = ev.groupby("user_id")["ts"].diff().dt.total_seconds()
    ev = ev.sort_values("event_id").reset_index(drop=True)
    assert np.allclose(got["delta_value"].to_numpy(dtype=float),
                       ev["delta_value"].to_numpy(dtype=float),
                       equal_nan=True)
    g = got["gap_us"].to_numpy(dtype=float) / 1e6
    w = ev["gap_us"].to_numpy(dtype=float)
    assert np.allclose(g, w, equal_nan=True, atol=1e-6)
