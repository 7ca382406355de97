"""Batch-AD: training-set export + heterogeneous source union."""

import os

import duckdb
import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def test_survivors_match_funnel_and_duckdb_s4():
    """The export keep-list is EXACTLY the curation funnel's final
    stage: count equals corpus_curation's lang_resampled row and the
    id set equals the DuckDB twin's s4 selection."""
    from text_extraction_ray.pipelines.queries_r3ad import (
        curation_survivor_ids)
    from text_extraction_ray.pipelines.queries_r3r import (
        SQL_CORPUS_CURATION, q_corpus_curation)

    ids = curation_survivor_ids(SF_DIR)
    funnel = q_corpus_curation(SF_DIR).to_pandas().set_index("stage")
    assert ids.size == funnel.loc["lang_resampled", "n_docs"]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{SF_DIR}/documents.parquet'")
    # reuse the pinned twin's CTE chain, select the s4 ids themselves
    body = SQL_CORPUS_CURATION.split("SELECT 'input'")[0]
    want = sorted(r[0] for r in con.execute(
        body + "SELECT doc_id FROM s4").fetchall())
    assert ids.tolist() == want


def test_training_set_export_layout_and_resume():
    import pyarrow.parquet as pq

    from text_extraction_ray.functions.bucketed import bucket_of
    from text_extraction_ray.pipelines.queries_r3ad import (
        EXPORT_SHARDS, curation_survivor_ids, q_make_training_set)

    m = (q_make_training_set(SF_DIR).to_pandas()
         .sort_values("shard").reset_index(drop=True))
    ids = curation_survivor_ids(SF_DIR)
    assert m.n_docs.sum() == ids.size
    # every shard directory holds exactly its splitmix bucket
    import tempfile

    root = os.path.join(tempfile.gettempdir(), "tx_trainset_sf0.001",
                        "data")
    seen = 0
    for d in sorted(os.listdir(root)):
        if not d.startswith("shard="):
            continue
        k = int(d.split("=")[1])
        t = pq.read_table(os.path.join(root, d), columns=["doc_id"])
        got_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        assert (bucket_of(got_ids, EXPORT_SHARDS) == k).all()
        seen += t.num_rows
    assert seen == ids.size
    # resume: a second call reuses the stamped layout (no rewrite)
    stamp = os.path.join(tempfile.gettempdir(), "tx_trainset_sf0.001",
                         "_STAMP")
    before = os.path.getmtime(stamp)
    m2 = (q_make_training_set(SF_DIR).to_pandas()
          .sort_values("shard").reset_index(drop=True))
    assert os.path.getmtime(stamp) == before
    pd.testing.assert_frame_equal(m, m2)


def test_multi_source_union_formats_agree():
    from text_extraction_ray.pipelines.queries_r3ad import (
        q_multi_source_union_stats)

    got = (q_multi_source_union_stats(SF_DIR).to_pandas()
           .sort_values("source_format").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{SF_DIR}/documents.parquet'")
    n, chars = con.execute(
        "SELECT COUNT(*), SUM(n_chars) FROM documents").fetchone()
    assert list(got.source_format) == ["csv", "jsonl", "parquet"]
    assert (got.n_docs == n).all()
    assert (got.total_chars == chars).all()


def _export_doc_ids(root: str) -> list[tuple[int, int]]:
    import pyarrow.parquet as pq

    out = []
    data = os.path.join(root, "data")
    for d in sorted(os.listdir(data)):
        if not d.startswith("shard="):
            continue
        k = int(d.split("=")[1])
        t = pq.read_table(os.path.join(data, d), columns=["doc_id"])
        out.extend((k, i) for i in sorted(t.column("doc_id").to_pylist()))
    return sorted(out)


def test_training_set_join_path_equals_broadcast(ray_session, monkeypatch):
    """VERDICT r3 #1: forcing SURVIVOR_BROADCAST_CAP to 0 exercises the
    distributed left_semi keep-list join; manifest AND the exported
    (shard, doc_id) layout must match the broadcast path exactly."""
    import shutil
    import tempfile

    import text_extraction_ray.pipelines.queries_r3ad as AD

    root = os.path.join(tempfile.gettempdir(), "tx_trainset_sf0.001")
    shutil.rmtree(root, ignore_errors=True)
    base = (AD.q_make_training_set(SF_DIR).to_pandas()
            .sort_values("shard").reset_index(drop=True))
    base_ids = _export_doc_ids(root)

    shutil.rmtree(root, ignore_errors=True)
    monkeypatch.setattr(AD, "SURVIVOR_BROADCAST_CAP", 0)
    joined = (AD.q_make_training_set(SF_DIR).to_pandas()
              .sort_values("shard").reset_index(drop=True))
    joined_ids = _export_doc_ids(root)

    pd.testing.assert_frame_equal(base, joined, check_dtype=False)
    assert base_ids == joined_ids and len(base_ids) > 0
