"""Batch-K: table profiler parity + zone-map pruning + compaction."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).df()


def _to_pandas(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


def test_orders_profile_matches_duckdb(ray_session):
    from text_extraction_ray.pipelines.queries_r3k import (
        SQL_ORDERS_PROFILE,
        q_orders_profile,
    )

    got = _to_pandas(q_orders_profile(SF_DIR)).sort_values(
        "column").reset_index(drop=True)
    want = _duck(SQL_ORDERS_PROFILE).sort_values(
        "column").reset_index(drop=True)
    assert got.column.tolist() == want.column.tolist()
    for c in ["n_rows", "n_nulls", "n_distinct"]:
        assert got[c].tolist() == want[c].astype(int).tolist(), c


def test_profile_counts_nulls(ray_session):
    """Null accounting on a fixture with actual nulls (the testdata has
    none)."""
    import ray as _ray

    from text_extraction_ray.pipelines.queries_r3k import profile_column

    t = pa.table({"x": pa.array([1, None, 2, None, 2, 3],
                                type=pa.int64())})
    p = profile_column(_ray.data.from_arrow(t).repartition(3), "x")
    assert p == {"n_rows": 6, "n_nulls": 2, "n_distinct": 3}


def test_r3k_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3k import (parity_sql_r3k,
        queries_r3k)

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    par = set(parity_sql_r3k())
    for n in queries_r3k():
        assert n in qs, n
        assert (n in osql) == (n in par), n
    assert names[49:51] == ["extract_pages_parity", "extract_pages"]
    # pdf_tables heads the rows-only tail, right after the oracled
    # block (50-row driver window + 55 batch-parity oracles)
    assert names[len(osql) + 1] == "pdf_tables"


def _write_shards(tmp_path, n_shards=4, rows_per=100):
    paths = []
    for i in range(n_shards):
        p = os.path.join(tmp_path, f"s{i}.parquet")
        lo = i * rows_per
        pq.write_table(pa.table({
            "k": pa.array(np.arange(lo, lo + rows_per, dtype=np.int64)),
            "v": pa.array(np.arange(rows_per, dtype=np.float64)),
        }), p)
        paths.append(p)
    return paths


def test_zone_map_prunes_files(ray_session, tmp_path):
    """A range covering 2 of 4 key-sorted shards opens exactly 2 files
    and returns exactly the in-range rows."""
    from text_extraction_ray.sources.zonemap import (
        build_zone_map,
        prune_paths,
        read_parquet_zoned,
    )

    paths = _write_shards(tmp_path)
    zmap = build_zone_map(paths, "k")
    assert zmap.num_rows == 4
    assert prune_paths(zmap, 150, 250) == paths[1:3]
    ds, files_read = read_parquet_zoned(paths, "k", 150, 250)
    assert files_read == 2
    df = ds.to_pandas()
    assert sorted(df.k) == list(range(150, 251))


def test_zone_map_empty_range(ray_session, tmp_path):
    from text_extraction_ray.sources.zonemap import read_parquet_zoned

    paths = _write_shards(tmp_path)
    ds, files_read = read_parquet_zoned(paths, "k", 10_000, 20_000)
    assert files_read == 0
    assert ds.count() == 0


def test_compaction_preserves_rows(ray_session, tmp_path):
    """16 tiny shards → few files, identical row multiset, original
    directory name preserved."""
    from text_extraction_ray.state.compact import compact_parquet_dir

    d = os.path.join(tmp_path, "out")
    os.makedirs(d)
    _write_shards(d, n_shards=16, rows_per=50)
    before = duckdb.sql(
        f"SELECT SUM(k) s, COUNT(*) n FROM '{d}/*.parquet'").df()
    stats = compact_parquet_dir(d, target_rows_per_file=400)
    assert stats["files_before"] == 16
    assert stats["n_rows"] == 800
    assert stats["files_after"] <= 4
    after = duckdb.sql(
        f"SELECT SUM(k) s, COUNT(*) n FROM '{d}/*.parquet'").df()
    assert before.s[0] == after.s[0] and before.n[0] == after.n[0]
    assert not os.path.exists(d + ".compact-tmp")
    assert not os.path.exists(d + ".compact-old")
