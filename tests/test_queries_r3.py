"""Round-3 operators: DuckDB-parity gate run IN PYTEST (these queries are
rows-only in the driver registry — the 50-row CORRECTNESS window is fully
allocated — so the rows+schema+values check lives here instead)."""

import math

import duckdb
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
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    return str(v)


def _mset(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(tuple(_norm(v) for v in row)
                  for row in df[cols].itertuples(index=False, name=None))


def _names():
    from text_extraction_ray.pipelines.queries_r3 import parity_sql_r3

    return sorted(parity_sql_r3())


@pytest.mark.parametrize("name", _names())
def test_r3_query_matches_duckdb(ray_session, name):
    from text_extraction_ray.pipelines.queries_r3 import (
        parity_sql_r3,
        queries_r3,
    )

    got = queries_r3()[name](SF_DIR).to_pandas()
    want = _duck(parity_sql_r3()[name])
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    assert _mset(got) == _mset(want), name


def test_r3_registered_rows_only(ray_session):
    """The new queries must be registered (the parity trio as driver-facing
    oracles since the round-3 merge) and must not push extract_pages out of
    the driver's 50-row window."""
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3 import (parity_sql_r3,
                                                          queries_r3)

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    par = set(parity_sql_r3())
    for n in queries_r3():
        assert n in qs, n
        assert (n in osql) == (n in par), n
    # round-5 window: the parity oracle holds position 49, the rows-only
    # flagship smoke sits first past the window at 50
    assert names[49] == "extract_pages_parity"
    assert names[50] == "extract_pages"
    # pdf_tables leads the rows-only tail right after the 55 batch-parity
    # oracles; its grid semantics live in binary PDFs no SQL engine can
    # parse, so it stays benched + pytest-pinned
    assert names[len(osql) + 1] == "pdf_tables"


def test_dedup_apply_drops_exactly_the_non_heads(ray_session):
    """Survivors = corpus minus cluster members that are not their
    cluster's min — re-derived from the (oracled) clusters table."""
    from text_extraction_ray.pipelines.queries_ext import q_neardup_clusters
    from text_extraction_ray.pipelines.queries_r3 import q_docs_dedup_apply

    clusters = q_neardup_clusters(SF_DIR).to_pandas()
    drops = set(clusters[clusters.doc_id != clusters.cluster_id]["doc_id"])
    kept = set(q_docs_dedup_apply(SF_DIR).to_pandas()["doc_id"])
    import pyarrow.parquet as pq

    all_ids = set(pq.read_table(SF_DIR + "/documents.parquet",
                                columns=["doc_id"])
                  .column("doc_id").to_pylist())
    assert kept == all_ids - drops
    assert drops  # the corpus genuinely has near-dup pairs to drop


def test_audio_features_exact_and_total(ray_session):
    """The Ray audio stage must reproduce direct numpy features exactly
    for every clip (incl. stereo and 8-bit variants), and route corrupt /
    non-PCM payloads to the error column with the codec's precise reason."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from text_extraction_ray.core.wav import audio_features, decode_wav
    from text_extraction_ray.functions.multimodal import (
        AudioFeaturizer,
        synth_audio_batch,
    )
    from text_extraction_ray.pipelines.queries_r3 import q_audio_features

    got = q_audio_features(SF_DIR).to_pandas().set_index("media_id")
    ids = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id"])
    assert len(got) == ids.num_rows
    assert bool(got["decode_ok"].all())

    # exact recompute for a sample of clips, covering stereo (i%7==0)
    sample = [i for i in ids.column("doc_id").to_pylist()[:40]]
    clips = synth_audio_batch(pa.table({"doc_id": pa.array(sample)}))
    for mid, payload in zip(clips.column("media_id").to_pylist(),
                            clips.column("media").to_pylist()):
        sr, ch, samples = decode_wav(payload)
        want = audio_features(sr, ch, samples)
        row = got.loc[mid]
        assert row["duration_s"] == want["duration_s"], mid
        assert row["rms"] == want["rms"], mid
        assert row["peak"] == want["peak"], mid
        assert row["zcr"] == want["zcr"], mid
        assert row["n_channels"] == ch, mid

    # totality: garbage + IEEE-float WAV land in the error column
    import struct

    fmt3 = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body3 = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt3)) + fmt3
             + b"data" + struct.pack("<I", 4) + b"\0\0\0\0")
    bad = pa.table({
        "media_id": pa.array([1, 2], type=pa.int64()),
        "media": pa.array([b"not audio at all",
                           b"RIFF" + struct.pack("<I", len(body3)) + body3],
                          type=pa.binary()),
        "media_type": pa.array(["audio/wav", "audio/wav"]),
    })
    out = (ray.data.from_arrow(bad)
           .map_batches(AudioFeaturizer, concurrency=1, batch_size=4,
                        batch_format="pyarrow")
           .to_pandas().sort_values("media_id"))
    assert (~out["decode_ok"]).all()
    assert "RIFF/WAVE signature" in out.iloc[0]["error"]
    assert "ieee-float" in out.iloc[1]["error"]


def test_redaction_scrubs_crafted_pii(ray_session):
    """Arrow RE2 scrub == DuckDB regexp_replace(...,'g') on text that
    actually CONTAINS emails/URLs (the corpus texts are word soup, so the
    registry query's parity is exercised here with crafted rows)."""
    import duckdb
    import pyarrow as pa

    from text_extraction_ray.pipelines.queries_r3 import redact_batch

    rows = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "contact a.smith+x@sub.example.org or b@x.co today",
            "see https://example.com/a?b=c and http://t.co/xyz now",
            "no pii here at all",
            "mixed bob@ex.ample.com visits https://ex.net/p — twice "
            "carol@ex.net",
        ]),
    })
    got = redact_batch(rows).to_pandas()
    con = duckdb.connect()
    con.register("docs", rows)
    want = con.execute("""
        SELECT doc_id,
               regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
                 'https?://[^\\s]+', '<URL>', 'g') AS redacted,
               CAST(length(regexp_extract_all(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                    + length(regexp_extract_all(text, 'https?://[^\\s]+'))
                    AS INT) AS n_redacted
        FROM docs""").df()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert list(got["redacted"]) == list(want["redacted"])
    assert list(got["n_redacted"].astype(int)) == \
        list(want["n_redacted"].astype(int))
    assert got.loc[0, "redacted"] == "contact <EMAIL> or <EMAIL> today"
    assert got.loc[3, "n_redacted"] == 3


def test_decontaminate_matches_bruteforce(ray_session):
    """Distributed scan == single-process brute force over the same
    benchmark n-gram set (membership on strings — hash() is per-process
    randomized and must never cross the driver/worker boundary)."""
    import pyarrow.parquet as pq

    from text_extraction_ray.pipelines.queries_r3 import q_decontaminate

    got = (q_decontaminate(SF_DIR).to_pandas()
           .set_index("doc_id")["n_contaminated"].to_dict())
    docs = pq.read_table(SF_DIR + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    grams = set()
    for r in docs:
        if r["doc_id"] < 20:
            toks = (r["text"] or "").split()
            for i in range(len(toks) - 7):
                grams.add(" ".join(toks[i : i + 8]))
    want = {}
    for r in docs:
        toks = (r["text"] or "").split()
        n = sum(1 for i in range(len(toks) - 7)
                if " ".join(toks[i : i + 8]) in grams)
        if n:
            want[r["doc_id"]] = n
    assert got == want
    assert len(want) >= 20  # benchmark docs self-hit at minimum


def test_full_outer_and_global_sort_parity(ray_session):
    from text_extraction_ray.pipelines.queries_r3 import (
        SQL_CUST_ORDERS_FULL_OUTER,
        SQL_ORDERS_GLOBAL_SORT,
        q_cust_orders_full_outer,
        q_orders_global_sort,
    )

    got = q_cust_orders_full_outer(SF_DIR).to_pandas()
    want = _duck(SQL_CUST_ORDERS_FULL_OUTER)
    assert sorted(got.columns) == sorted(want.columns)
    assert _mset(got) == _mset(want)
    # (at sf0.01 every customer has >=1 order, so the null-side behavior
    # is exercised synthetically below instead)
    import pyarrow as pa

    import ray.data

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2], type=pa.int64()),
        "a": pa.array(["x", "y"])}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 3], type=pa.int64()),
        "b": pa.array([20, 30], type=pa.int64())}))
    fo = left.join(right, join_type="full_outer", num_partitions=2,
                   on=("k",), right_on=("rk",)).to_pandas()
    assert len(fo) == 3                      # 1-only, both, 3-only
    assert fo["a"].isna().sum() == 1         # orphan right row
    assert fo["b"].isna().sum() == 1         # unmatched left row

    g = q_orders_global_sort(SF_DIR).to_pandas()
    w = _duck(SQL_ORDERS_GLOBAL_SORT)
    # ORDERED comparison — the whole point of a global sort
    assert list(map(tuple, g[["o_orderkey", "o_totalprice"]].values)) == \
        list(map(tuple, w[["o_orderkey", "o_totalprice"]].values))


def test_grouped_hll_accuracy(ray_session):
    """Per-group HLL within 5% of exact per group; merge-invariant under
    different block structures (override_num_blocks)."""
    import duckdb
    import pyarrow.parquet as pq

    import ray.data

    from text_extraction_ray.functions.sketch import grouped_approx_distinct

    got = (grouped_approx_distinct(
        ray.data.read_parquet(SF_DIR + "/events.parquet",
                              columns=["event_type", "user_id"]),
        "event_type", "user_id").to_pandas()
        .set_index("event_type")["n_distinct_approx"])
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n FROM "
        f"'{SF_DIR}/events.parquet' GROUP BY event_type"
    ).df().set_index("event_type")["n"]
    assert set(got.index) == set(exact.index)
    for et in exact.index:
        err = abs(got[et] - exact[et]) / max(exact[et], 1)
        assert err <= 0.05, (et, got[et], exact[et])
    # merge invariance: a different block structure folds the same regs
    got2 = (grouped_approx_distinct(
        ray.data.read_parquet(SF_DIR + "/events.parquet",
                              columns=["event_type", "user_id"],
                              override_num_blocks=13),
        "event_type", "user_id").to_pandas()
        .set_index("event_type")["n_distinct_approx"])
    assert (got.sort_index() == got2.sort_index()).all()


def test_dedup_apply_join_path_equals_broadcast(ray_session, monkeypatch):
    """VERDICT r3 #1: forcing DROP_BROADCAST_CAP to 0 exercises the
    distributed left_anti join fallback; it must return exactly the
    broadcast path's rows."""
    import text_extraction_ray.pipelines.queries_r3 as R3

    base = (R3.q_docs_dedup_apply(SF_DIR).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    monkeypatch.setattr(R3, "DROP_BROADCAST_CAP", 0)
    joined = (R3.q_docs_dedup_apply(SF_DIR).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    cols = sorted(base.columns)
    assert cols == sorted(joined.columns)
    pd.testing.assert_frame_equal(base[cols], joined[cols],
                                  check_dtype=False)
