"""Batch-W: bucketed layout join + deflate compressibility."""

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"

SQL_BUCKETED = """
SELECT c_mktsegment,
       SUM(CAST(FLOOR(o_totalprice*100+0.5) AS BIGINT))/100.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def test_bucketed_join_matches_duckdb_and_native():
    import duckdb
    import ray.data

    from text_extraction_ray.pipelines.queries_r3w import (
        q_bucketed_join_revenue)
    from text_extraction_ray.pipelines.queries import read_table

    got = (q_bucketed_join_revenue(SF_DIR).to_pandas()
           .sort_values("c_mktsegment").reset_index(drop=True))
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    want = con.execute(SQL_BUCKETED).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # and equals the engine's own shuffle hash join on the same data
    orders = read_table(SF_DIR, "orders", ["o_custkey", "o_totalprice"])
    cust = read_table(SF_DIR, "customer", ["c_custkey", "c_mktsegment"])
    native = orders.join(cust, join_type="inner", num_partitions=4,
                         on=("o_custkey",), right_on=("c_custkey",))
    ndf = native.to_pandas()
    ndf["cents"] = np.floor(ndf.o_totalprice * 100 + 0.5).astype(np.int64)
    nagg = (ndf.groupby("c_mktsegment", as_index=False)
            .agg(revenue=("cents", lambda s: s.sum() / 100.0),
                 n_orders=("cents", "size"))
            .sort_values("c_mktsegment").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, nagg, check_dtype=False)


def test_bucket_layout_and_guard(tmp_path):
    import ray.data

    from text_extraction_ray.functions.bucketed import (bucket_of,
                                                        bucketed_join,
                                                        write_bucketed)

    a = pa.table({"k": pa.array(range(40), pa.int64()),
                  "va": pa.array([f"a{i}" for i in range(40)])})
    b = pa.table({"kk": pa.array([i for i in range(40) if i % 3 == 0],
                                 pa.int64()),
                  "vb": pa.array([f"b{i}" for i in range(40)
                                  if i % 3 == 0])})
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    write_bucketed(ray.data.from_arrow(a), da, "k", 8)
    write_bucketed(ray.data.from_arrow(b), db, "kk", 8)
    # every row landed in the bucket splitmix64 dictates
    for bd in sorted(os.listdir(da)):
        if not bd.startswith("bucket="):
            continue
        k = int(bd.split("=")[1])
        t = pq.read_table(os.path.join(da, bd))
        keys = t.column("k").to_numpy(zero_copy_only=False)
        assert (bucket_of(keys, 8) == k).all()
    got = (bucketed_join(da, db, "k", "kk", n_buckets=8).to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = (a.to_pandas().merge(b.to_pandas(), left_on="k",
                                right_on="kk")
            .drop(columns=["kk"]).sort_values("k")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(ValueError):
        bucketed_join(da, db, "k", "kk", n_buckets=4)


def test_bucketed_join_empty_buckets_schema_stable(tmp_path):
    import ray.data

    from text_extraction_ray.functions.bucketed import (bucketed_join,
                                                        write_bucketed)

    # single-key tables: 15 of 16 buckets empty on both sides
    a = pa.table({"k": pa.array([7], pa.int64()), "va": pa.array(["x"])})
    b = pa.table({"kk": pa.array([8], pa.int64()), "vb": pa.array(["y"])})
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    write_bucketed(ray.data.from_arrow(a), da, "k", 16)
    write_bucketed(ray.data.from_arrow(b), db, "kk", 16)
    ds = bucketed_join(da, db, "k", "kk", n_buckets=16)
    # Ray's to_pandas drops columns for a zero-row dataset; the block
    # schema is the contract (downstream stages see typed columns)
    assert sorted(ds.schema().names) == ["k", "va", "vb"]
    assert ds.count() == 0                     # keys differ → no match


def test_deflate_ratio_parity_and_signal():
    import ray.data

    from text_extraction_ray.pipelines.queries_r3w import (deflate_rows,
                                                           q_docs_deflate_ratio)

    got = (q_docs_deflate_ratio(SF_DIR).to_pandas()
           .sort_values("lang").reset_index(drop=True))
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["text", "lang"])
    agg = {}
    for text, lang in zip(t.column("text").to_pylist(),
                          t.column("lang").to_pylist()):
        raw = text.encode("utf-8")
        d = agg.setdefault(lang, [0, 0, 0])
        d[0] += 1
        d[1] += len(raw)
        d[2] += len(zlib.compress(raw, 6))
    rows = [(l, *agg[l], np.floor(agg[l][2] / agg[l][1] * 1e6 + 0.5) / 1e6)
            for l in sorted(agg)]
    want = pd.DataFrame(rows, columns=[
        "lang", "n_docs", "n_bytes", "n_deflate", "deflate_ratio"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # planted signal: pure repetition compresses far below varied text
    rep = "spam ham " * 200
    var = " ".join(f"w{i}x{i * 7 % 101}" for i in range(400))
    planted = pa.table({"text": pa.array([rep, var]),
                        "lang": pa.array(["rep", "var"])})
    df = (ray.data.from_arrow(planted)
          .map_batches(deflate_rows, batch_format="pyarrow")
          .to_pandas().set_index("lang"))
    r_rep = df.loc["rep", "n_deflate"] / df.loc["rep", "n_bytes"]
    r_var = df.loc["var", "n_deflate"] / df.loc["var", "n_bytes"]
    assert r_rep < 0.1 < r_var
