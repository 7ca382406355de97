"""Batch-N: windowed dedup parity, CSV input shards through the
checkpointed job, --materialize-query CTAS mode."""

import base64
import csv
import os

import duckdb
import pandas as pd
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


def _to_pandas(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


def test_events_dedup_hourly_matches_duckdb(ray_session):
    from text_extraction_ray.pipelines.queries_r3n import (
        SQL_EVENTS_DEDUP_HOURLY,
        q_events_dedup_hourly,
    )

    got = _to_pandas(q_events_dedup_hourly(SF_DIR))
    want = _duck(SQL_EVENTS_DEDUP_HOURLY)
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    assert _mset(got) == _mset(want)


def test_r3n_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3n import (parity_sql_r3n,
        queries_r3n)

    qs, osql = queries(), oracle_sql()
    par = set(parity_sql_r3n())
    for n in queries_r3n():
        assert n in qs, n
        assert (n in osql) == (n in par), n
    assert list(qs)[49:51] == ["extract_pages_parity", "extract_pages"]


def test_checkpointed_job_over_csv_shards(ray_session, tmp_path):
    """The resumable job consumes .csv shards (row-streamed, html
    base64) and produces the same extracted bytes as the parquet run."""
    from text_extraction_ray.pipelines.job import (
        read_output,
        run_extraction_job,
    )
    from text_extraction_ray.sources.synth import gen_corpus

    pdir = str(tmp_path / "pq_in")
    gen_corpus(pdir, 90, seed=42, n_shards=3)
    cdir = str(tmp_path / "csv_in")
    os.makedirs(cdir)
    for shard in sorted(f for f in os.listdir(pdir)
                        if f.endswith(".parquet")):
        t = pq.read_table(os.path.join(pdir, shard))
        with open(os.path.join(cdir, shard + ".csv"), "w",
                  newline="", encoding="utf-8") as fh:
            w = csv.DictWriter(
                fh, fieldnames=["url", "warc_ts", "html_b64", "lang"])
            w.writeheader()
            for r in t.to_pylist():
                w.writerow({
                    "url": r["url"],
                    "warc_ts": r["warc_ts"].isoformat(),
                    "html_b64": base64.b64encode(
                        r["html"] or b"").decode(),
                    "lang": r.get("lang", "") or "",
                })
    out_pq = str(tmp_path / "out_pq")
    out_csv = str(tmp_path / "out_csvsrc")
    run_extraction_job(pdir, out_pq, None, concurrency=(1, 2))
    run_extraction_job(cdir, out_csv, None, concurrency=(1, 2))
    a = read_output(out_pq).to_pandas().set_index("url").sort_index()
    b = read_output(out_csv).to_pandas().set_index("url").sort_index()
    assert len(a) == len(b) == 90
    assert (a["extracted_text"] == b["extracted_text"]).all()


def test_materialize_query_cli(ray_session, tmp_path):
    """--materialize-query writes a registry query's result as parquet
    that re-reads to the same rows."""
    from text_extraction_ray.run import main

    out = str(tmp_path / "mat")
    rc = main(["--input", SF_DIR, "--output", out,
               "--materialize-query", "lang_stats"])
    assert rc == 0
    df = pq.read_table(os.path.join(out, "data.parquet")).to_pandas() \
        if os.path.exists(os.path.join(out, "data.parquet")) \
        else duckdb.sql(f"SELECT * FROM '{out}/*.parquet'").df()
    from text_extraction_ray.pipelines.queries import queries

    direct = _to_pandas(queries()["lang_stats"](SF_DIR))
    assert _mset(df) == _mset(direct)


def test_materialize_query_unknown_name(ray_session, tmp_path):
    from text_extraction_ray.run import main

    with pytest.raises(SystemExit):
        main(["--input", SF_DIR, "--output", str(tmp_path / "x"),
              "--materialize-query", "no_such_query"])
