"""Batch-T: span-level dedup, anchor-text index, robots meta."""

import hashlib
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"

SQL_SPAN_DEDUP = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
chunks AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(ts[(i-1)*10+1:(i-1)*10+10], ' ') AS chunk
  FROM toks, UNNEST(generate_series(1, CAST((len(ts)+9)//10 AS BIGINT)))
       AS t(i)),
k AS (SELECT chunk, MIN(doc_id*1048576 + pos) AS min_key
      FROM chunks GROUP BY chunk),
flags AS (
  SELECT c.doc_id, c.pos, c.chunk,
         (c.doc_id*1048576 + c.pos = k.min_key) AS keep
  FROM chunks c JOIN k USING (chunk))
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       COALESCE(md5(string_agg(chunk, ' ' ORDER BY pos)
                    FILTER (WHERE keep)), '') AS clean_md5
FROM flags GROUP BY doc_id ORDER BY doc_id
"""


def _oracle(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{sf_dir}/documents.parquet'")
    return con.execute(SQL_SPAN_DEDUP).fetchdf()


def _run(sf_dir):
    from text_extraction_ray.pipelines.queries_r3t import q_docs_span_dedup

    return (q_docs_span_dedup(sf_dir).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def test_span_dedup_duckdb_parity():
    """Ray result == DuckDB window-min twin, including the md5 of every
    reassembled document (the corpus genuinely drops spans — assert
    the dedup is not vacuous)."""
    got, want = _run(SF_DIR), _oracle(SF_DIR)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (want.n_chunks - want.n_kept).sum() > 0


def test_span_dedup_join_path_equals_broadcast(monkeypatch):
    import text_extraction_ray.pipelines.queries_r3t as T

    base = _run(SF_DIR)
    monkeypatch.setattr(T, "DUP_BROADCAST_CAP", 0)
    joined = _run(SF_DIR)
    pd.testing.assert_frame_equal(base, joined, check_dtype=False)


def test_span_dedup_planted(tmp_path):
    """First occurrence keeps the span; later docs lose it; docs with
    all-unique spans reassemble byte-identically (clean_md5 ==
    md5(text))."""
    span = " ".join(f"w{i}" for i in range(10))
    uniq = " ".join(f"u{i}" for i in range(10))
    tail = " ".join(f"t{i}" for i in range(10))
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([span + " " + uniq,     # keeps both
                          span + " " + tail,     # loses span, keeps tail
                          span],                 # loses its only span
                         pa.string()),
    })
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    got = _run(str(tmp_path)).set_index("doc_id")
    assert got.loc[1, "n_kept"] == 2
    assert got.loc[1, "clean_md5"] == hashlib.md5(
        (span + " " + uniq).encode()).hexdigest()
    assert got.loc[2, "n_kept"] == 1
    assert got.loc[2, "clean_md5"] == hashlib.md5(tail.encode()).hexdigest()
    assert got.loc[3, "n_kept"] == 0
    assert got.loc[3, "clean_md5"] == ""


def test_extract_anchors_fixtures():
    from text_extraction_ray.core.links import extract_anchors

    html = (
        '<a href="/x">Hello <b>world</b> &amp; co</a>'
        '<script>var a = \'<a href=/fake>fake</a>\';</script>'
        '<a href="/z">unclosed <a href="/w">next</a>'
        '<a href="/s"><script>sneak("text")</script>visible</a>'
        '<a name="n">no href</a>'
    )
    assert extract_anchors(html) == [
        ("/x", "Hello world & co"),
        ("/z", "unclosed"),
        ("/w", "next"),
        ("/s", "visible"),
    ]


def test_anchor_text_index_matches_local_recompute():
    """The distributed (host, text) aggregate + modal fold equals a
    single-process recomputation over the same synthetic crawl."""
    from collections import Counter

    from text_extraction_ray.core.encoding import decode_html
    from text_extraction_ray.core.links import (extract_anchors, host_of,
                                                resolve_url)
    from text_extraction_ray.pipelines.queries_r3s import _corpus_pages
    from text_extraction_ray.pipelines.queries_r3t import q_anchor_text_index

    got = (q_anchor_text_index(SF_DIR).to_pandas()
           .sort_values("host").reset_index(drop=True))

    counts = Counter()
    for row in _corpus_pages(SF_DIR).iter_rows():
        payload = row["html"]
        text = decode_html(payload)[0] if isinstance(payload, bytes) \
            else str(payload)
        for href, txt in extract_anchors(text):
            absu = resolve_url(row["url"], href)
            if absu is not None:
                counts[(host_of(absu), txt)] += 1
    rows = []
    hosts = sorted({h for h, _ in counts})
    for h in hosts:
        sub = {t: c for (hh, t), c in counts.items() if hh == h}
        top = min(sub, key=lambda t: (-sub[t], t))
        rows.append((h, sum(sub.values()), len(sub), top, sub[top]))
    want = pd.DataFrame(rows, columns=[
        "host", "n_refs", "n_unique_texts", "top_anchor", "top_n"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.n_refs.sum() > 0


def test_meta_robots_fixtures():
    from text_extraction_ray.core.links import meta_robots_flags

    assert meta_robots_flags(
        '<meta name="robots" content="noindex, nofollow">') == (
        True, True, 1)
    assert meta_robots_flags(
        "<META NAME='Robots' CONTENT='NOINDEX'>") == (True, False, 1)
    assert meta_robots_flags("<meta name=robots content=none>") == (
        True, True, 1)
    assert meta_robots_flags(
        '<meta charset="utf-8"><meta name="viewport" content="w">') == (
        False, False, 2)
    # a script echoing a meta string is NOT a directive
    assert meta_robots_flags(
        '<script>d("<meta name=robots content=noindex>")</script>') == (
        False, False, 0)


def test_robots_stage_and_filter():
    """Planted pages through the SAME Ray stage the registered query
    uses; composing with a filter drops exactly the noindex pages."""
    import ray.data

    from text_extraction_ray.pipelines.queries_r3t import robots_flag_rows

    pages = pa.table({
        "url": pa.array([f"https://h/{i}" for i in range(4)]),
        "html": pa.array([
            "<html><meta name='robots' content='noindex'><p>a</p>",
            "<html><meta name='robots' content='nofollow'><p>b</p>",
            "<html><meta charset='utf-8'><p>c</p>",
            "<html><meta name=robots content='none'><p>d</p>",
        ]),
    })
    ds = (ray.data.from_arrow(pages)
          .map_batches(robots_flag_rows, batch_format="pyarrow"))
    df = ds.to_pandas().set_index("url")
    assert df.noindex.tolist() == [True, False, False, True]
    assert df.nofollow.tolist() == [False, True, False, True]
    kept = ds.filter(expr="noindex == False").to_pandas()
    assert sorted(kept.url) == ["https://h/1", "https://h/2"]
