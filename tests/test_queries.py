"""Local replica of the driver's correctness gate: every oracled query's
Ray result must match its DuckDB SQL result (row count + column names +
order-insensitive values) at sf0.01; rows-only queries must execute and
return a stable schema."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).df()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def _row_multiset(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


@pytest.fixture(scope="module")
def registry(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries

    return queries(), oracle_sql()


def _oracled_names():
    # Batch-parity oracles (merged into oracle_sql() in round 3) are skipped
    # here: each batch's own test file runs the identical columns/rows/
    # multiset comparison, so the central harness covers only core oracles.
    from text_extraction_ray.pipelines.queries import (oracle_sql,
                                                       parity_oracle_names)

    return sorted(set(oracle_sql()) - parity_oracle_names())


def _rows_only_names():
    from text_extraction_ray.pipelines.queries import oracle_sql, queries

    return sorted(set(queries()) - set(oracle_sql()))


@pytest.mark.parametrize("name", _oracled_names())
def test_query_matches_oracle(registry, name):
    qs, oracles = registry
    got = _to_pandas(qs[name](SF_DIR))
    want = _duck(oracles[name])
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    gm, wm = _row_multiset(got), _row_multiset(want)
    mismatches = [(a, b) for a, b in zip(gm, wm) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_query_runs(registry, name):
    qs, _ = registry
    df = _to_pandas(qs[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0
    assert len(df) >= 0


def test_multimodal_decodes(registry):
    qs, _ = registry
    df = _to_pandas(qs["multimodal_decode"](SF_DIR))
    assert len(df) == 500
    assert bool(df["decode_ok"].all())
    assert (df["n_pixels"] > 0).all()


def test_media_resize_chain(registry):
    qs, _ = registry
    df = _to_pandas(qs["media_resize"](SF_DIR))
    assert len(df) == 500
    assert bool(df["decode_ok"].all())
    # resized rasters fit max_dim=16 in both dimensions
    assert (df["n_pixels"] <= 16 * 16).all()
    assert (df["n_pixels"] > 0).all()


def test_video_frame_sampling(registry):
    import pyarrow.parquet as pq

    qs, _ = registry
    df = _to_pandas(qs["video_frames"](SF_DIR))
    ids = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                        columns=["doc_id"]).column("doc_id").to_pylist()
    # every 4th frame of 4 + id % 9 frames per doc
    expected = sum(len(range(0, 4 + i % 9, 4)) for i in ids)
    assert len(df) == expected
    assert bool(df["decode_ok"].all())
    assert "frame_idx" in df.columns
    assert (df[df["frame_idx"] == 0].shape[0]) == len(ids)


def test_lang_id_mostly_matches_label(registry):
    qs, _ = registry
    df = _to_pandas(qs["lang_id"](SF_DIR))
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                           columns=["doc_id", "lang"])
    merged = df.merge(docs, on="doc_id")
    en = merged[merged["lang"] == "en"]
    if len(en):
        acc = (en["lang_pred"] == "en").mean()
        assert acc > 0.9, f"en lang-id accuracy {acc}"


def test_ann_lsh_subset_of_bruteforce_corpus(registry):
    qs, _ = registry
    lsh = _to_pandas(qs["ann_lsh"](SF_DIR))
    brute = _to_pandas(qs["ann_top10"](SF_DIR))
    assert len(lsh) <= 10
    assert set(lsh.columns) == set(brute.columns)


def test_ann_ivf_recall_vs_bruteforce(registry):
    qs, _ = registry
    ivf = _to_pandas(qs["ann_ivf"](SF_DIR))
    brute = _to_pandas(qs["ann_top10"](SF_DIR))
    assert len(ivf) <= 10
    assert set(ivf.columns) == set(brute.columns)
    # scores carried by shared ids must agree with brute force exactly
    merged = ivf.merge(brute, on="vec_id", suffixes=("_ivf", "_bf"))
    assert (merged["cos_ivf"] == merged["cos_bf"]).all()
    # probing 4/16 lists should still recover most of the true top-10
    recall = len(merged) / len(brute)
    assert recall >= 0.5, f"IVF recall {recall}"


def test_registry_orders_oracled_first(registry):
    """Cap-proofing: the driver records only the first 50 registered
    queries.  Round-5 window layout: 49 core-oracled queries, then
    extract_pages_parity (the flagship pipeline's value-level oracle)
    at position 49 — every recorded row carries the strong
    rows+schema+hash check.  extract_pages (flagship smoke, rows-only
    by nature) sits at position 50, first past the window; the other
    batch-parity oracles follow, so if the cap grows the weakest
    checks are always the last to be recorded."""
    from text_extraction_ray.pipelines.queries import parity_oracle_names

    qs, oracles = registry
    names = list(qs)
    assert all(n in oracles for n in names[:50])
    assert not any(n in parity_oracle_names() for n in names[:49])
    assert names[49] == "extract_pages_parity"
    assert names[50] == "extract_pages"
    assert all(n in oracles for n in names[51:len(oracles) + 1])
    tail = names[len(oracles) + 1:]
    assert not any(n in oracles for n in tail)


def test_events_asof_matches_bruteforce(registry):
    """The distributed as-of join equals a per-user brute force over the
    raw events table (ordering key (ts, event_id), at-or-before)."""
    import pyarrow.parquet as pq

    qs, _ = registry
    got = _to_pandas(qs["events_asof"](SF_DIR))
    ev = pq.read_table(os.path.join(SF_DIR, "events.parquet"),
                       columns=["event_id", "ts", "user_id", "event_type",
                                "value"]).to_pandas()
    ev = ev[ev["event_type"].isin(["click", "purchase"])]
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    want = {}
    for uid, g in ev.groupby("user_id"):
        last = None
        for _, row in g.iterrows():
            if row["event_type"] == "purchase":
                last = row["value"]
            elif last is not None:
                want[row["event_id"]] = last
    got_map = dict(zip(got["event_id"], got["last_purchase_value"]))
    assert got_map == want


_ROWS_ONLY_SCHEMAS = {
    "image_tables_text": ['c', 'cell', 'doc_id', 'r'],
    "scanned_pdf_tables": ['c', 'cell', 'doc_id', 'page', 'r'],
    "image_tables_skewed": ['c', 'cell', 'doc_id', 'r'],
    "extract_pages": ['doc_type', 'lang', 'n_blocks_dropped',
                      'n_blocks_kept', 'parse_ok', 'url'],
    "explain_blocks": ['block_id', 'cls', 'link_density', 'n_chars',
                       'stop_density', 'tag_path', 'url'],
    "html_tables": ['n_cells', 'row_idx', 'row_text', 'table_idx', 'url'],
    "pdf_tables": ['grid', 'table_idx', 'url'],
    # round-3 batch AI (CDX random-access WARC; byte-parity pinned in
    # tests/test_queries_r3ai.py)
    "cdx_hosts": ['host_num', 'n_captures', 'total_bytes'],
    "cdx_selective_extract": ['doc_type', 'n_chars', 'text_sha16', 'url'],
    "cdx_point_lookup": ['doc_type', 'n_chars', 'text_sha16', 'url'],
    "extract_embed_neardup": ['cos', 'id_a', 'id_b'],
    "audio_features": ['decode_ok', 'duration_s', 'error', 'media_id',
                       'n_channels', 'peak', 'rms', 'zcr'],
    "decontaminate": ['doc_id', 'n_contaminated'],
    "users_by_type_hll": ['event_type', 'n_distinct_approx'],
    "minhash_dedup": ['doc_a', 'doc_b', 'est_jaccard'],
    "simhash_dedup": ['doc_a', 'doc_b', 'hamming'],
    "fingerprint": ['doc_id', 'fingerprint'],
    "sample_docs": ['doc_id'],
    "length_quantiles_sketch": ['estimate', 'lang', 'quantile'],
    "distinct_users_hll": ['n_users_approx'],
    "multimodal_decode": ['caption', 'decode_ok', 'error', 'mean_pixel',
                          'media_id', 'n_pixels', 'thumb16'],
    "media_resize": ['decode_ok', 'error', 'mean_pixel', 'media_id',
                     'n_pixels', 'thumb16'],
    "video_frames": ['decode_ok', 'error', 'frame_idx', 'mean_pixel',
                     'media_id', 'n_pixels', 'thumb16'],
    "ann_lsh": ['cos', 'vec_id'],
    "ann_ivf": ['cos', 'vec_id'],
    "heavy_tokens_cms": ['n_cms', 'n_exact', 'token'],
    "embeddings_kmeans": ['cluster', 'dist', 'vec_id'],
    "media_dhash": ['decode_ok', 'dhash', 'error', 'media_id'],
    "ann_pq": ['cos_pq', 'vec_id'],
    # round-3 batches P-S (DuckDB parity twins live in their pytest
    # modules; the driver records these rows-only)
    "corpus_curation": ['n_docs', 'stage'],
    "domain_stats": ['fail_rate', 'host', 'mean_chars', 'n_pages'],
    "host_pagerank": ['host', 'rank'],
    "link_graph": ['n_internal', 'n_links', 'n_unique_targets', 'src_host'],
    "wet_roundtrip": ['n_chars', 'sha16', 'url'],
    # round-3 batch T
    "docs_span_dedup": ['clean_md5', 'doc_id', 'n_chunks', 'n_kept'],
    "anchor_text_index": ['host', 'n_refs', 'n_unique_texts', 'top_anchor',
                          'top_n'],
    "robots_meta": ['n_meta', 'nofollow', 'noindex', 'url'],
    # round-3 batch U
    "pages_nb_confusion": ['label', 'n', 'pred'],
    "docs_bpe_stats": ['lang', 'n_docs', 'n_pieces', 'n_words',
                       'pieces_per_word'],
    # round-3 batch V
    "frontier_new_urls": ['host', 'n_new', 'n_sitemap'],
    "frontier_schedule": ['crawl_delay', 'est_seconds', 'first_url',
                          'host', 'n_allowed', 'n_blocked'],
    # round-3 batch W
    "bucketed_join_revenue": ['c_mktsegment', 'n_orders', 'revenue'],
    "docs_deflate_ratio": ['deflate_ratio', 'lang', 'n_bytes',
                           'n_deflate', 'n_docs'],
    # round-3 batch X
    "snapshot_diff": ['n_urls', 'status'],
    "events_kmv_distinct": ['event_type', 'n_distinct_est'],
    # round-3 batch Y
    "host_template_ratio": ['host', 'n_chunks', 'n_pages',
                            'template_ratio'],
    "ann_rp_rescore": ['cos', 'vec_id'],
    # round-3 batch Z
    "pages_boilerplate_frac": ['boilerplate_frac', 'n_bytes',
                               'tpl_bytes', 'url'],
    "ann_batch_queries": ['cos', 'qid', 'vec_id'],
    # round-3 batch AA
    "retrieval_pairs": ['anchor', 'dst_url', 'n_chars', 'text_sha'],
    "retrieval_hard_negatives": ['anchor', 'cos_neg', 'neg_rank',
                                 'neg_url', 'pos_url'],
    # round-3 batch AB
    "training_mix": ['bucket', 'lang', 'n_kept', 'n_total'],
    "corpus_datasheet": ['metric', 'value'],
    # round-3 batch AC
    "host_reciprocal_links": ['hi', 'lo', 'n_fwd', 'n_rev',
                              'reciprocal'],
    "kwic_search": ['doc_id', 'left_ctx', 'n_hits', 'pos', 'right_ctx'],
    # round-3 batch AD
    "make_training_set": ['n_docs', 'n_tokens', 'shard'],
    "multi_source_union_stats": ['n_docs', 'source_format',
                                 'total_chars'],
    # round-3 batch AE
    "events_value_band_join": ['diff', 'id_a', 'id_b'],
    "incremental_neardup": ['new_id', 'old_id', 'sim'],
}


def test_rows_only_schemas_pinned(registry):
    """The driver's rows-only check records row count + schema; pin every
    rows-only query's column set so schema drift is caught here, not in
    the round report."""
    qs, oracles = registry
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(_ROWS_ONLY_SCHEMAS), (
        rows_only ^ set(_ROWS_ONLY_SCHEMAS))
    for name, want in _ROWS_ONLY_SCHEMAS.items():
        df = _to_pandas(qs[name](SF_DIR))
        assert sorted(df.columns) == want, name


def test_doc_top_terms_distributed_plan_is_exact():
    """Round-3 scale fix: the vocabulary broadcast is BOUNDED (head_k) with
    a distributed hash-join fallback above it — never an unbounded driver
    collect.  Both paths are pinned against a pure-pandas recomputation of
    (tf DESC, df ASC, token ASC) top-3 + 6dp tf-idf; head_k=8 forces the
    join path on the 31-token corpus, which also exercises the
    empty-reduce-partition blocks that acero's join rejects without the
    repartition() absorb."""
    import math
    from collections import Counter

    import pandas as pd
    import pyarrow.parquet as pq

    from text_extraction_ray.pipelines.queries_ext import q_doc_top_terms

    sf = "/root/testdata/sf0.001"
    got = (
        q_doc_top_terms(sf)
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    got_join = (
        q_doc_top_terms(sf, head_k=8)   # vocab=31 > 8 → distributed join
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )

    docs = pq.read_table(sf + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    n_docs = len(docs)
    df_counts: Counter = Counter()
    per_doc = {}
    for row in docs:
        tf = Counter((row["text"] or "").split())
        per_doc[row["doc_id"]] = tf
        df_counts.update(tf.keys())
    rows = []
    for doc_id, tf in per_doc.items():
        ranked = sorted(tf.items(),
                        key=lambda kv: (-kv[1], df_counts[kv[0]], kv[0]))[:3]
        for tok, n in ranked:
            rows.append({
                "doc_id": doc_id, "token": tok, "tf": n,
                "df": df_counts[tok],
                "tfidf": round(n * math.log(n_docs / df_counts[tok]), 6),
            })
    want = (pd.DataFrame(rows)
            .sort_values(["doc_id", "token"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["doc_id", "token", "tf", "df", "tfidf"]].astype(want.dtypes),
        want)
    pd.testing.assert_frame_equal(
        got_join[["doc_id", "token", "tf", "df", "tfidf"]].astype(
            want.dtypes),
        want)
