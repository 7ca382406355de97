"""Batch-J operators (skew join, watermark late windows) + the
schema-evolution reader: DuckDB-parity gate + structural invariants."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
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
    from text_extraction_ray.pipelines.queries_r3j import parity_sql_r3j

    return sorted(parity_sql_r3j())


def _to_pandas(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


@pytest.mark.parametrize("name", _names())
def test_r3j_query_matches_duckdb(ray_session, name):
    from text_extraction_ray.pipelines.queries_r3j import (
        parity_sql_r3j,
        queries_r3j,
    )

    got = _to_pandas(queries_r3j()[name](SF_DIR))
    want = _duck(parity_sql_r3j()[name])
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    assert _mset(got) == _mset(want), name


def test_r3j_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3j import (parity_sql_r3j,
        queries_r3j)

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    par = set(parity_sql_r3j())
    for n in queries_r3j():
        assert n in qs, n
        assert (n in osql) == (n in par), n
    assert names[49:51] == ["extract_pages_parity", "extract_pages"]
    # pdf_tables heads the rows-only tail, right after the oracled
    # block (50-row driver window + 55 batch-parity oracles)
    assert names[len(osql) + 1] == "pdf_tables"


def test_skew_join_hot_path_equals_plain_join(ray_session):
    """A fixture where ONE key owns half the fact rows: the hybrid join
    must route it through the broadcast path (hot set non-empty at
    hot_share=0.2) and still return exactly pandas' inner join."""
    import ray as _ray

    from text_extraction_ray.functions.skew import skew_broadcast_join

    rng = np.random.default_rng(11)
    keys = np.where(rng.random(4000) < 0.5, 7,
                    rng.integers(0, 100, 4000)).astype(np.int64)
    fact = pa.table({"k": keys, "payload": np.arange(4000)})
    dim = pa.table({"dk": np.arange(100, dtype=np.int64),
                    "attr": np.arange(100) * 10})
    got = (skew_broadcast_join(
        _ray.data.from_arrow(fact).repartition(8),
        _ray.data.from_arrow(dim).repartition(4),
        "k", "dk", hot_share=0.2)
        .to_pandas())
    want = fact.to_pandas().merge(
        dim.to_pandas(), left_on="k", right_on="dk").drop(columns="dk")
    assert _mset(got) == _mset(want)


def test_skew_join_all_hot_and_none_hot_agree(ray_session):
    """Forcing every key hot (hot_share→0) and no key hot
    (hot_share→1.1) produces identical rows — route never changes the
    result."""
    import ray as _ray

    from text_extraction_ray.functions.skew import skew_broadcast_join

    fact = pa.table({"k": np.arange(300, dtype=np.int64) % 17,
                     "v": np.arange(300)})
    dim = pa.table({"dk": np.arange(17, dtype=np.int64),
                    "w": np.arange(17) * 2})
    a = skew_broadcast_join(_ray.data.from_arrow(fact),
                            _ray.data.from_arrow(dim),
                            "k", "dk", hot_share=1e-9).to_pandas()
    b = skew_broadcast_join(_ray.data.from_arrow(fact),
                            _ray.data.from_arrow(dim),
                            "k", "dk", hot_share=1.1).to_pandas()
    assert _mset(a) == _mset(b)
    assert len(a) == 300


def test_late_windows_mass_conservation(ray_session):
    """ontime + late sums to the event count; lateness is nonzero (the
    jitter makes the op non-degenerate) but a small minority."""
    from text_extraction_ray.pipelines.queries_r3j import (
        q_events_late_windows,
    )

    df = _to_pandas(q_events_late_windows(SF_DIR))
    total = _duck("SELECT COUNT(*) AS n FROM events").n[0]
    assert int((df.n_ontime + df.n_late).sum()) == int(total)
    late_frac = df.n_late.sum() / total
    assert 0.001 < late_frac < 0.25


def test_read_parquet_evolving(ray_session, tmp_path):
    """Three shards from different 'pipeline versions' unify: missing
    columns null-fill, extra columns drop, int32 widens to int64."""
    from text_extraction_ray.sources.evolve import read_parquet_evolving

    p1 = os.path.join(tmp_path, "v1.parquet")
    p2 = os.path.join(tmp_path, "v2.parquet")
    p3 = os.path.join(tmp_path, "v3.parquet")
    pq.write_table(pa.table({
        "a": pa.array([1, 2], type=pa.int32()),
        "b": pa.array(["x", "y"])}), p1)
    pq.write_table(pa.table({
        "a": pa.array([3], type=pa.int64()),
        "c": pa.array([0.5]),
        "junk": pa.array([9])}), p2)
    pq.write_table(pa.table({"b": pa.array(["z"])}), p3)
    target = pa.schema([("a", pa.int64()), ("b", pa.string()),
                        ("c", pa.float64())])
    ds = read_parquet_evolving([p1, p2, p3], target)
    df = ds.to_pandas().sort_values(["b", "a"],
                                    na_position="last").reset_index(
        drop=True)
    assert len(df) == 4
    assert list(df.columns) == ["a", "b", "c"]
    assert df.a.dropna().astype(int).tolist() == [1, 2, 3]
    assert df.b.tolist()[:3] == ["x", "y", "z"]
    assert "junk" not in df.columns
    assert df.c.notna().sum() == 1
