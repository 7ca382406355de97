"""Batch AI: CDX-indexed selective WARC extraction — index roundtrip,
byte-parity with the full reader, and the prune-at-the-read guarantee."""

import datetime as dt
import gzip
import hashlib
import os

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.01"
TS = dt.datetime(2025, 5, 4, 12, 0, 0)


def test_surt_key_reverses_host_and_drops_scheme():
    from text_extraction_ray.sources.cdx import surt_key

    assert surt_key("https://B.a.Example/x/y") == "example,a,b)/x/y"
    assert surt_key("http://site3.example") == "example,site3)/"


def test_cdx_roundtrip_offsets_slice_to_records(tmp_path):
    """Every CDX (offset, length) must slice out a gzip member that
    decompresses to exactly its record."""
    from text_extraction_ray.sources.cdx import write_warc_with_cdx
    from text_extraction_ray.sources.warc import parse_warc

    recs = [(f"https://site{i}.example/en/page-{i}", TS,
             f"<p>body {i}</p>".encode()) for i in range(7)]
    warc, cdx = write_warc_with_cdx(str(tmp_path / "s.warc.gz"), recs)
    blob = open(warc, "rb").read()
    lines = open(cdx).read().splitlines()
    assert len(lines) == 7
    prev_end = 0
    for line, (url, _, body) in zip(lines, recs):
        _, _, _, off, length, fname = line.split(" ")
        off, length = int(off), int(length)
        assert off == prev_end          # members tile the file exactly
        prev_end = off + length
        assert fname == "s.warc.gz"
        member = blob[off:off + length]
        parsed = list(parse_warc(gzip.decompress(member)))
        assert len(parsed) == 1
        assert parsed[0][0] == url
        assert parsed[0][2] == body
    assert prev_end == len(blob)


def test_selective_extract_matches_full_reader(ray_session):
    """The CDX-selected extraction must be byte-identical (via sha16) to
    the full WARC reader's extraction restricted to the same hosts."""
    from text_extraction_ray.pipelines.extraction import extract_pages
    from text_extraction_ray.pipelines.queries_r3ai import (
        CDX_HOST_MAX, _warc_cdx_corpus, q_cdx_selective_extract)
    from text_extraction_ray.sources.warc import read_warc_pages

    got = q_cdx_selective_extract(SF_DIR).to_pandas()
    wdir = _warc_cdx_corpus(SF_DIR)
    full = extract_pages(read_warc_pages(wdir), mode="single_pass",
                         concurrency=(1, 4), batch_size=32).to_pandas()
    import re
    host = full["url"].str.extract(r"^https://site(\d+)\.example/")[0]
    want = full[host.astype(int) < CDX_HOST_MAX]
    assert 0 < len(got) < len(full)
    assert len(got) == len(want)
    gm = dict(zip(got["url"], got["text_sha16"]))
    for _, row in want.iterrows():
        sha = hashlib.md5((row["extracted_text"] or "")
                          .encode("utf-8")).hexdigest()[:16]
        assert gm[row["url"]] == sha, row["url"]


def test_selected_bytes_are_a_fraction_of_the_corpus(ray_session):
    """Prune-at-the-read: the bytes the fetch stage reads equal the sum
    of the SELECTED members' lengths — a strict fraction of the WARC
    corpus (12 of 97 hosts selected)."""
    from text_extraction_ray.pipelines.queries_r3ai import (
        CDX_HOST_MAX, _host_num, _warc_cdx_corpus)
    from text_extraction_ray.sources.cdx import read_cdx

    wdir = _warc_cdx_corpus(SF_DIR)
    idx = read_cdx(wdir).map_batches(_host_num,
                                     batch_format="pyarrow").to_pandas()
    total_on_disk = sum(
        os.path.getsize(os.path.join(wdir, f)) for f in os.listdir(wdir)
        if f.endswith(".warc.gz"))
    assert idx["length"].sum() == total_on_disk   # index covers the corpus
    sel = idx[idx["host_num"] < CDX_HOST_MAX]["length"].sum()
    assert 0 < sel < 0.35 * total_on_disk


def test_cdx_hosts_counts_match_index(ray_session):
    from text_extraction_ray.pipelines.queries_r3ai import (CDX_ROWS,
                                                            q_cdx_hosts)

    df = q_cdx_hosts(SF_DIR).to_pandas()
    assert df["n_captures"].sum() == CDX_ROWS
    assert set(df["host_num"]) == set(range(97))
    assert (df["total_bytes"] > 0).all()


def test_fetch_raises_when_index_is_stale(tmp_path, ray_session):
    """A CDX row pointing at a torn member must fail loudly, not return
    a short result."""
    import pyarrow as pa

    from text_extraction_ray.sources.cdx import (fetch_cdx_members,
                                                 write_warc_with_cdx)

    recs = [("https://site1.example/en/page-1", TS, b"<p>x</p>")]
    warc, _ = write_warc_with_cdx(str(tmp_path / "s.warc.gz"), recs)
    batch = pa.table({
        "url": ["https://site1.example/en/page-1"],
        "warc_ts": pa.array([TS], type=pa.timestamp("us")),
        "offset": pa.array([5], type=pa.int64()),     # mid-member: torn
        "length": pa.array([40], type=pa.int64()),
        "filename": [warc],
    })
    with pytest.raises(ValueError, match="out of step"):
        fetch_cdx_members(batch)


def test_r3ai_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3ai import queries_r3ai

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    for n in queries_r3ai():
        assert n in qs and n not in osql, n
    assert names[len(osql) + 1] == "pdf_tables"


def test_cluster_master_is_sorted_and_complete(ray_session):
    """master.cdx holds every capture in (surt, ts) order; cluster.idx
    samples exactly every BLOCK_LINES-th boundary and tiles the file."""
    from text_extraction_ray.pipelines.queries_r3ai import (CDX_ROWS,
                                                            _cdx_cluster_dir)
    from text_extraction_ray.sources.cdx_cluster import BLOCK_LINES

    cdir = _cdx_cluster_dir(SF_DIR)
    master = open(os.path.join(cdir, "master.cdx")).read().splitlines()
    assert len(master) == CDX_ROWS
    surts = [line.split(" ", 1)[0] for line in master]
    assert surts == sorted(surts)
    cluster = open(os.path.join(cdir, "cluster.idx")).read().splitlines()
    assert len(cluster) == -(-CDX_ROWS // BLOCK_LINES)
    pos = 0
    size = os.path.getsize(os.path.join(cdir, "master.cdx"))
    for line in cluster:
        key, off, ln = line.rsplit(" ", 2)
        assert int(off) == pos
        pos += int(ln)
    assert pos == size


def test_point_lookup_matches_full_reader_with_bounded_reads(ray_session):
    """Each looked-up url resolves to its exact capture; the index bytes
    touched stay <= n_blocks * max block size (two bounded reads per
    lookup, never a scan); a miss returns no rows."""
    from text_extraction_ray.pipelines.extraction import extract_pages
    from text_extraction_ray.pipelines.queries_r3ai import (
        _cdx_cluster_dir, _warc_cdx_corpus, lookup_urls,
        q_cdx_point_lookup)
    from text_extraction_ray.sources.cdx_cluster import CdxCluster
    from text_extraction_ray.sources.warc import read_warc_pages

    got = q_cdx_point_lookup(SF_DIR).to_pandas()
    urls = lookup_urls(SF_DIR)
    assert sorted(got["url"]) == sorted(urls)
    wdir = _warc_cdx_corpus(SF_DIR)
    full = extract_pages(read_warc_pages(wdir), mode="single_pass",
                         concurrency=(1, 4), batch_size=32).to_pandas()
    want = full[full["url"].isin(urls)]
    gm = dict(zip(got["url"], got["text_sha16"]))
    for _, row in want.iterrows():
        sha = hashlib.md5((row["extracted_text"] or "")
                          .encode("utf-8")).hexdigest()[:16]
        assert gm[row["url"]] == sha, row["url"]
    # bounded reads: every lookup touches at most 2 blocks
    cdir = _cdx_cluster_dir(SF_DIR)
    cluster = CdxCluster(cdir)
    rows = cluster.lookup_index_rows(urls)
    assert len(rows) == len(urls)
    max_block = max(ln for _, ln in cluster.extents)
    assert 0 < cluster.bytes_read <= 2 * len(urls) * max_block
    assert cluster.bytes_read < os.path.getsize(cluster.master_path)
    miss = cluster.lookup_index_rows(["https://site1.example/nope"])
    assert len(miss) == 0
