"""Batch-R: corpus-curation funnel parity + per-stage drop proof."""

import os
import tempfile

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    return con.execute(sql).df()


def _funnel(sf_dir):
    from text_extraction_ray.pipelines.queries_r3r import q_corpus_curation

    t = q_corpus_curation(sf_dir).to_pandas()
    return dict(zip(t.stage, t.n_docs.astype(int)))


def _want(sf_dir):
    from text_extraction_ray.pipelines.queries_r3r import SQL_CORPUS_CURATION

    t = _duck(sf_dir, SQL_CORPUS_CURATION)
    return dict(zip(t.stage, t.n_docs.astype(int)))


def test_curation_funnel_matches_duckdb(ray_session):
    assert _funnel(SF_DIR) == _want(SF_DIR)


def test_curation_funnel_each_stage_drops(ray_session):
    """Planted fixture where EVERY stage removes specific docs:
    junk (digits), short, exact duplicate, benchmark-contaminated,
    and a skewed lang mix for the resampler."""
    bench_text = ("the quick brown fox jumps over the lazy dog "
                  "while reading long articles about nothing much")
    good = ("this is a perfectly reasonable english sentence with "
            "plenty of alphabetic words inside it number %d ok")
    rows = [
        # benchmark doc (doc_id < 20)
        {"doc_id": 0, "lang": "en", "text": bench_text},
        # junk: digits
        {"doc_id": 30, "lang": "en", "text": "111 222 333 444 555 666 777"},
        # junk: too short
        {"doc_id": 31, "lang": "en", "text": "too short now"},
        # exact duplicate pair (32 kept, 33 dropped)
        {"doc_id": 32, "lang": "en", "text": good % 1},
        {"doc_id": 33, "lang": "en", "text": good % 1},
        # contaminated: contains an 8-gram of the benchmark doc
        {"doc_id": 34, "lang": "en",
         "text": "copied text follows " + bench_text},
    ]
    # lang mix: many 'en', few 'de' — resampler must downsample en only
    for i in range(60):
        rows.append({"doc_id": 100 + i, "lang": "en",
                     "text": good % (100 + i)})
    for i in range(5):
        rows.append({"doc_id": 300 + i, "lang": "de",
                     "text": good % (300 + i)})
    t = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "text": pa.array([r["text"] for r in rows]),
        "lang": pa.array([r["lang"] for r in rows]),
        "source": pa.array(["fix"] * len(rows)),
        "n_chars": pa.array([len(r["text"]) for r in rows], pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got, want = _funnel(d), _want(d)
    assert got == want
    assert got["input"] == len(rows)
    assert got["quality"] == len(rows) - 2          # junk + short dropped
    assert got["exact_dedup"] == got["quality"] - 1  # dup dropped
    # contaminated: doc 34 AND the benchmark doc 0 itself share grams
    assert got["decontaminated"] == got["exact_dedup"] - 2
    # resample: all 5 'de' survive; 'en' strictly downsampled
    assert got["lang_resampled"] < got["decontaminated"]
    assert got["lang_resampled"] >= 5


def test_r3r_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3r import queries_r3r

    qs, osql = queries(), oracle_sql()
    for name in queries_r3r():
        assert name in qs
        assert name not in osql
