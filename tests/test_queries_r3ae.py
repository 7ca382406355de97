"""Batch-AE: banded theta-join + incremental near-dup index."""

import duckdb
import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def test_banded_theta_join_matches_duckdb():
    from text_extraction_ray.pipelines.queries_r3ae import (
        SQL_EVENTS_VALUE_BAND_JOIN, q_events_value_band_join)

    for sf in (SF_DIR, "/root/testdata/sf0.01"):
        got = (q_events_value_band_join(sf).to_pandas()
               .sort_values(["id_a", "id_b"]).reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        want = con.execute(
            SQL_EVENTS_VALUE_BAND_JOIN + " ORDER BY id_a, id_b").fetchdf()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert len(got) > 0


def test_incremental_neardup_planted_recall():
    """Every exact re-crawl copy pairs with its source at sim 1.0;
    one-word edits are found at high rate; fresh docs never pair with
    their own id's source."""
    from text_extraction_ray.pipelines.queries_r3ae import (
        q_incremental_neardup, recrawl_docs)

    got = q_incremental_neardup(SF_DIR).to_pandas()
    pairs = set(zip(got.new_id, got.old_id))

    nd = recrawl_docs(SF_DIR).to_pylist()
    exact_new = [r["doc_id"] for i, r in enumerate(nd) if i % 5 == 0]
    edit_new = [r["doc_id"] for i, r in enumerate(nd) if i % 5 == 1]
    fresh_new = [r["doc_id"] for i, r in enumerate(nd)
                 if i % 5 not in (0, 1)]

    sim = dict(zip(zip(got.new_id, got.old_id), got.sim))
    for nid in exact_new:
        assert (nid, nid - 1_000_000) in pairs, nid
        assert sim[(nid, nid - 1_000_000)] == 1.0
    found_edits = sum((nid, nid - 1_000_000) in pairs
                      for nid in edit_new)
    assert found_edits / len(edit_new) > 0.8
    for nid in fresh_new:
        assert (nid, nid - 1_000_000) not in pairs, nid
    # verification floor holds
    assert (got.sim >= 0.7).all()


def test_incremental_index_is_persisted_and_reused():
    import os
    import tempfile

    from text_extraction_ray.pipelines.queries_r3ae import (
        _lsh_index_dir, q_incremental_neardup)

    root = _lsh_index_dir(SF_DIR)
    stamp = os.path.join(root, "_STAMP")
    before = os.path.getmtime(stamp)
    q_incremental_neardup(SF_DIR)          # must reuse, not rebuild
    assert os.path.getmtime(stamp) == before
    assert os.path.isdir(os.path.join(root, "bands"))
    assert os.path.isdir(os.path.join(root, "sigs"))
