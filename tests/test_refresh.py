"""Incremental crawl refresh: delta-only extraction equivalence."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa

import ray.data

from text_extraction_ray.schemas import PAGES
from text_extraction_ray.sources.synth import make_row


def _pages_table(rows: list[dict]) -> pa.Table:
    cols = {name: [r[name] for r in rows] for name in PAGES.names}
    return pa.Table.from_pydict(cols, schema=PAGES)


def test_refresh_extracts_only_the_delta(ray_session):
    from text_extraction_ray.pipelines.analysis import dedup_keep_latest
    from text_extraction_ray.pipelines.extraction import extract_pages
    from text_extraction_ray.pipelines.refresh import refresh_extraction

    old_rows = [make_row(i) for i in range(60)]

    recrawled = []
    for i in range(10):  # same url, newer ts, different payload
        r = dict(old_rows[i])
        r["warc_ts"] = r["warc_ts"] + dt.timedelta(hours=2)
        r["html"] = make_row(1000 + i)["html"]
        recrawled.append(r)
    fresh = [make_row(300 + i) for i in range(10)]  # brand-new urls
    stale = []
    for i in range(10, 25):  # re-delivered OLD records: must be skipped
        r = dict(old_rows[i])
        r["warc_ts"] = r["warc_ts"] - dt.timedelta(hours=1)
        stale.append(r)
    new_rows = recrawled + fresh + stale

    old_out = extract_pages(
        ray.data.from_arrow(_pages_table(old_rows)),
        mode="single_pass", concurrency=(1, 2), batch_size=32).materialize()

    merged, n_delta = refresh_extraction(
        old_out, ray.data.from_arrow(_pages_table(new_rows)),
        concurrency=(1, 2), batch_size=32)
    got = merged.to_pandas().set_index("url")["extracted_text"].to_dict()

    # only the 10 recrawls + 10 fresh urls hit the parser
    assert n_delta == 20

    # equivalence: full re-extraction of keep-latest(old ∪ new) pages
    all_pages = dedup_keep_latest(
        ray.data.from_arrow(_pages_table(old_rows + new_rows)))
    want_ds = extract_pages(all_pages, mode="single_pass",
                            concurrency=(1, 2), batch_size=32)
    want = want_ds.to_pandas().set_index("url")["extracted_text"].to_dict()
    assert got == want
    # and the recrawled urls really carry the NEW payload's extraction
    old_map = old_out.to_pandas().set_index("url")["extracted_text"].to_dict()
    changed = [r["url"] for r in recrawled]
    assert any(got[u] != old_map[u] for u in changed)


def test_refresh_join_fallback_equals_broadcast(ray_session):
    """VERDICT r4 #1: with the watermark broadcast cap forced to 0 the
    superseding filter degrades to a distributed left_outer join; the
    merged result must be IDENTICAL to the broadcast path's."""
    from text_extraction_ray.pipelines.extraction import extract_pages
    from text_extraction_ray.pipelines.refresh import refresh_extraction

    old_rows = [make_row(i) for i in range(40)]
    recrawled = []
    for i in range(8):
        r = dict(old_rows[i])
        r["warc_ts"] = r["warc_ts"] + dt.timedelta(hours=2)
        r["html"] = make_row(2000 + i)["html"]
        recrawled.append(r)
    fresh = [make_row(400 + i) for i in range(7)]
    stale = [dict(old_rows[20]), dict(old_rows[21])]
    for s in stale:
        s["warc_ts"] = s["warc_ts"] - dt.timedelta(hours=3)
    new_rows = recrawled + fresh + stale

    old_out = extract_pages(
        ray.data.from_arrow(_pages_table(old_rows)),
        mode="single_pass", concurrency=(1, 2), batch_size=32).materialize()

    def run(cap):
        merged, n_delta = refresh_extraction(
            old_out, ray.data.from_arrow(_pages_table(new_rows)),
            concurrency=(1, 2), batch_size=32, broadcast_cap=cap)
        df = merged.to_pandas().sort_values("url").reset_index(drop=True)
        return df[["url", "warc_ts", "extracted_text"]], n_delta

    via_bcast, n_b = run(None)
    via_join, n_j = run(0)
    assert n_b == n_j == 15
    assert via_bcast.equals(via_join)
