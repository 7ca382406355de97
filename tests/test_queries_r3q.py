"""Batch-Q: WET sink/source roundtrip + domain-level curation."""

import datetime as dt
import gzip
import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.01"


def test_wet_record_roundtrip_identity():
    """parse_wet(write_wet(records)) == records, including unicode text,
    empty text, and header-hostile URLs (CR/LF/% in the URI)."""
    import io

    from text_extraction_ray.sources.wet import parse_wet, write_wet

    recs = [
        ("https://a.example/x", dt.datetime(2024, 5, 1, 12, 0, 0), "héllo\nwörld"),
        ("https://b.example/evil\r\nWARC-Type: lie", dt.datetime(2024, 5, 2), ""),
        ("https://c.example/%41%0d", dt.datetime(2024, 5, 3), "x" * 10_000),
    ]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.warc.gz")
        write_wet(p, recs)
        got = list(parse_wet(open(p, "rb").read()))
    assert [(u, t, x) for u, t, x in got] == recs


def test_wet_salvage_truncated_shard():
    """A shard truncated mid-gzip-member yields its intact prefix
    records instead of raising (total-function contract)."""
    import os
    import tempfile

    from text_extraction_ray.sources.wet import parse_wet, write_wet

    recs = [(f"https://s.example/{i}", dt.datetime(2024, 1, 1), f"text {i}")
            for i in range(10)]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.warc.gz")
        write_wet(p, recs)
        data = open(p, "rb").read()
    cut = data[: int(len(data) * 0.55)]
    got = list(parse_wet(cut))
    assert 0 < len(got) < 10
    assert got == recs[: len(got)]


def test_wet_roundtrip_matches_direct_extraction(ray_session):
    """The registered query's sha fingerprints equal sha of the direct
    extraction output, url for url — the sink/source pair is lossless."""
    from text_extraction_ray.pipelines.queries_r3q import (
        _extract_out,
        q_wet_roundtrip,
    )

    got = q_wet_roundtrip(SF_DIR).to_pandas()
    direct = _extract_out(SF_DIR).select_columns(
        ["url", "extracted_text"]).to_pandas()
    direct["sha16"] = direct.extracted_text.fillna("").map(
        lambda t: hashlib.sha256(t.encode()).hexdigest()[:16])
    # urls repeat (re-crawled pages) — compare as multisets of pairs
    assert (sorted(zip(got.url, got.sha16))
            == sorted(zip(direct.url, direct.sha16)))


def test_domain_stats_matches_pandas(ray_session):
    from text_extraction_ray.pipelines.queries_r3q import (
        _extract_out,
        q_domain_stats,
    )

    got = q_domain_stats(SF_DIR).to_pandas().sort_values(
        "host").reset_index(drop=True)
    out = _extract_out(SF_DIR).select_columns(
        ["url", "parse_ok", "extracted_text"]).to_pandas()
    out["host"] = out.url.str.split("/").str[2]
    out["n_chars"] = out.extracted_text.fillna("").str.len()
    want = out.groupby("host").agg(
        n_pages=("url", "size"),
        n_ok=("parse_ok", "sum"),
        mean_chars=("n_chars", "mean")).reset_index()
    want["fail_rate"] = 1.0 - want.n_ok / want.n_pages
    want = want.sort_values("host").reset_index(drop=True)
    assert got.host.tolist() == want.host.tolist()
    assert got.n_pages.tolist() == want.n_pages.tolist()
    assert np.allclose(got.fail_rate, want.fail_rate, atol=1e-6)
    assert np.allclose(got.mean_chars, want.mean_chars, atol=1e-6)


def test_apply_domain_filter_drops_planted_host(ray_session):
    import ray as _ray

    from text_extraction_ray.pipelines.queries_r3q import apply_domain_filter

    t = pa.table({
        "url": pa.array([f"https://good{i % 3}.example/p{i}"
                         for i in range(30)]
                        + ["https://spam.example/x", "https://spam.example/y"]),
        "v": pa.array(list(range(32)), pa.int64()),
    })
    ds = _ray.data.from_arrow(t).repartition(4)
    kept = apply_domain_filter(ds, ["spam.example"]).to_pandas()
    assert len(kept) == 30
    assert not kept.url.str.contains("spam").any()
    # empty blocklist is the identity
    assert apply_domain_filter(ds, []).count() == 32


def test_r3q_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3q import queries_r3q

    qs, osql = queries(), oracle_sql()
    for name in queries_r3q():
        assert name in qs
        assert name not in osql
