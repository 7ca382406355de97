"""Batch-AB: training mix + corpus datasheet (DuckDB parity twins)."""

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _con(sf):
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def _mix_sql():
    from text_extraction_ray.pipelines.queries_r3ab import (BUCKET_W,
                                                            LANG_W,
                                                            mix_threshold)

    cases = []
    for lang, lw in LANG_W.items():
        for bk, bw in enumerate(BUCKET_W):
            thr = mix_threshold(lw * bw)
            cond = "TRUE" if thr is None else (
                f"substr(md5(CAST(doc_id AS VARCHAR)),1,8) < '{thr}'")
            cases.append(f"WHEN lang = '{lang}' AND t = {bk + 1} "
                         f"THEN CASE WHEN {cond} THEN 1 ELSE 0 END")
    return f"""
WITH r AS (SELECT doc_id, lang,
  NTILE(3) OVER (ORDER BY n_chars, doc_id) AS t FROM documents)
SELECT lang, t-1 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_total,
 CAST(SUM(CASE {' '.join(cases)} END) AS BIGINT) AS n_kept
FROM r GROUP BY 1,2 ORDER BY 1,2
"""


def test_training_mix_matches_duckdb_ntile_twin():
    from text_extraction_ray.pipelines.queries_r3ab import q_training_mix

    for sf in (SF_DIR, "/root/testdata/sf0.01"):
        got = (q_training_mix(sf).to_pandas()
               .sort_values(["lang", "bucket"]).reset_index(drop=True))
        want = _con(sf).execute(_mix_sql()).fetchdf()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # the mix genuinely reweights: something dropped, nothing empty
        assert (got.n_kept <= got.n_total).all()
        assert got.n_kept.sum() < got.n_total.sum()
        assert (got.n_total > 0).all()


def test_corpus_datasheet_matches_duckdb():
    from text_extraction_ray.pipelines.queries_r3ab import (
        q_corpus_datasheet)

    got = (q_corpus_datasheet(SF_DIR).to_pandas()
           .set_index("metric").value)
    con = _con(SF_DIR)
    want = {
        "docs.n": "SELECT COUNT(*) FROM documents",
        "docs.n_langs": "SELECT COUNT(DISTINCT lang) FROM documents",
        "docs.total_chars": "SELECT SUM(n_chars) FROM documents",
        "docs.mean_chars":
            "SELECT FLOOR(SUM(n_chars)*1.0/COUNT(*)*1e6+0.5)/1e6 "
            "FROM documents",
        "docs.min_chars": "SELECT MIN(n_chars) FROM documents",
        "docs.max_chars": "SELECT MAX(n_chars) FROM documents",
        "docs.distinct_text_rate":
            "SELECT FLOOR(COUNT(DISTINCT text)*1.0/COUNT(*)*1e6+0.5)/1e6 "
            "FROM documents",
        "events.n": "SELECT COUNT(*) FROM events",
        "events.n_users": "SELECT COUNT(DISTINCT user_id) FROM events",
        "events.per_user":
            "SELECT FLOOR(COUNT(*)*1.0/COUNT(DISTINCT user_id)*1e6+0.5)"
            "/1e6 FROM events",
    }
    assert sorted(got.index) == sorted(want)
    for m, sql in want.items():
        assert got[m] == float(con.execute(sql).fetchone()[0]), m
