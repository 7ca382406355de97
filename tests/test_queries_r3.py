"""Round-3 operators: DuckDB-parity gate run IN PYTEST (these queries are
rows-only in the driver registry — the 50-row CORRECTNESS window is fully
allocated — so the rows+schema+values check lives here instead)."""

import math

import duckdb
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
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    return str(v)


def _mset(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(tuple(_norm(v) for v in row)
                  for row in df[cols].itertuples(index=False, name=None))


def _names():
    from text_extraction_ray.pipelines.queries_r3 import parity_sql_r3

    return sorted(parity_sql_r3())


@pytest.mark.parametrize("name", _names())
def test_r3_query_matches_duckdb(ray_session, name):
    from text_extraction_ray.pipelines.queries_r3 import (
        parity_sql_r3,
        queries_r3,
    )

    got = queries_r3()[name](SF_DIR).to_pandas()
    want = _duck(parity_sql_r3()[name])
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    assert _mset(got) == _mset(want), name


def test_r3_registered_rows_only(ray_session):
    """The new queries must be registered, rows-only, and must not push
    extract_pages/pdf_tables out of the driver's 50-row window."""
    from text_extraction_ray.pipelines.queries import oracle_sql, queries

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    for n in ("docs_dedup_apply", "orders_rank", "lang_doc_csv"):
        assert n in qs and n not in osql
    assert "extract_pages" in names[:50]
    assert "pdf_tables" in names[:50]


def test_dedup_apply_drops_exactly_the_non_heads(ray_session):
    """Survivors = corpus minus cluster members that are not their
    cluster's min — re-derived from the (oracled) clusters table."""
    from text_extraction_ray.pipelines.queries_ext import q_neardup_clusters
    from text_extraction_ray.pipelines.queries_r3 import q_docs_dedup_apply

    clusters = q_neardup_clusters(SF_DIR).to_pandas()
    drops = set(clusters[clusters.doc_id != clusters.cluster_id]["doc_id"])
    kept = set(q_docs_dedup_apply(SF_DIR).to_pandas()["doc_id"])
    import pyarrow.parquet as pq

    all_ids = set(pq.read_table(SF_DIR + "/documents.parquet",
                                columns=["doc_id"])
                  .column("doc_id").to_pylist())
    assert kept == all_ids - drops
    assert drops  # the corpus genuinely has near-dup pairs to drop
