"""Batch-F operators (monthly growth, gap-fill, NTILE, LEAD/FIRST/LAST,
fuzzy name match, repetition signals): DuckDB-parity gate in pytest +
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
    from text_extraction_ray.pipelines.queries_r3f import parity_sql_r3f

    return sorted(parity_sql_r3f())


def _to_pandas(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


@pytest.mark.parametrize("name", _names())
def test_r3f_query_matches_duckdb(ray_session, name):
    from text_extraction_ray.pipelines.queries_r3f import (
        parity_sql_r3f,
        queries_r3f,
    )

    got = _to_pandas(queries_r3f()[name](SF_DIR))
    want = _duck(parity_sql_r3f()[name])
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    assert _mset(got) == _mset(want), name


def test_r3f_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3f import (parity_sql_r3f,
        queries_r3f)

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    par = set(parity_sql_r3f())
    for n in queries_r3f():
        assert n in qs, n
        assert (n in osql) == (n in par), n
    assert names[49:51] == ["extract_pages_parity", "extract_pages"]
    # pdf_tables heads the rows-only tail, right after the oracled
    # block (50-row driver window + 55 batch-parity oracles)
    assert names[len(osql) + 1] == "pdf_tables"


def test_levenshtein_pairs_vs_duckdb():
    """The pair-vectorized DP agrees with DuckDB's levenshtein on random
    word-soup pairs of unequal length, including empty strings."""
    from text_extraction_ray.pipelines.queries_r3f import (
        _levenshtein_pairs,
    )

    rng = np.random.default_rng(7)
    vocab = ["red", "blue", "steel", "bolt", "rod", "r0d", ""]
    a = [" ".join(rng.choice(vocab, rng.integers(0, 4)))
         for _ in range(200)]
    b = [" ".join(rng.choice(vocab, rng.integers(0, 4)))
         for _ in range(200)]
    got = _levenshtein_pairs(a, b)
    con = duckdb.connect()
    want = [con.execute("SELECT levenshtein(?, ?)", [x, y]).fetchone()[0]
            for x, y in zip(a, b)]
    assert got.tolist() == want


def test_ntile_balance(ray_session):
    """Within every customer: tiles are 1..min(4, n) and sizes differ by
    at most one, larger tiles first — the NTILE contract."""
    from text_extraction_ray.pipelines.queries_r3f import q_orders_ntile

    df = _to_pandas(q_orders_ntile(SF_DIR))
    for _, g in list(df.groupby("o_custkey"))[:50]:
        sizes = g.groupby("tile").size()
        assert list(sizes.index) == list(range(1, min(4, len(g)) + 1))
        assert sizes.max() - sizes.min() <= 1
        assert (sizes.diff().dropna() <= 0).all()


def test_gapfill_dense_and_conserving(ray_session):
    """The grid is exactly days × types, and its total equals the event
    count — zeros added, nothing lost."""
    from text_extraction_ray.pipelines.queries_r3f import q_events_gapfill

    df = _to_pandas(q_events_gapfill(SF_DIR))
    n_days = df.day.nunique()
    n_types = df.event_type.nunique()
    assert len(df) == n_days * n_types
    total = _duck("SELECT COUNT(*) AS n FROM events").n[0]
    assert int(df.n.sum()) == int(total)


def test_ttr_bounds(ray_session):
    """Both signals live in (0, 1]: a doc can't have more types than
    tokens, and one bigram can't cover more than every token."""
    from text_extraction_ray.pipelines.queries_r3f import q_docs_ttr

    df = _to_pandas(q_docs_ttr(SF_DIR))
    assert ((df.ttr > 0) & (df.ttr <= 1)).all()
    assert ((df.top_bigram_frac > 0) & (df.top_bigram_frac <= 1)).all()
