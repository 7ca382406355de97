"""Property tests for the CDX layer: sidecar roundtrip (every indexed
slice gunzips to its exact record) and two-level cluster lookup
(complete recovery of every capture, including key runs spanning many
blocks — the case the naive one-block-back rule misses)."""

import datetime as dt
import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.sources.cdx import surt_key, write_warc_with_cdx
from text_extraction_ray.sources.cdx_cluster import (
    CdxCluster, write_master_and_cluster)
from text_extraction_ray.sources.warc import parse_warc

TS = dt.datetime(2025, 5, 4, 12, 0, 0)

_url = st.builds(
    lambda h, p: f"https://site{h}.example/{p}",
    st.integers(min_value=0, max_value=30),
    st.text(alphabet="abc/0-", min_size=0, max_size=8))


@given(st.lists(st.tuples(_url, st.binary(min_size=0, max_size=64)),
                min_size=1, max_size=25))
@settings(max_examples=60, deadline=None)
def test_cdx_roundtrip_property(tmp_path_factory, recs):
    tmp = tmp_path_factory.mktemp("cdxprop")
    rows = [(u, TS, b) for u, b in recs]
    warc, cdx = write_warc_with_cdx(str(tmp / "s.warc.gz"), rows)
    blob = open(warc, "rb").read()
    lines = open(cdx).read().splitlines()
    assert len(lines) == len(rows)
    pos = 0
    for line, (url, _, body) in zip(lines, rows):
        surt, _, _, off, ln, _ = line.split(" ")
        assert surt == surt_key(url)
        off, ln = int(off), int(ln)
        assert off == pos
        pos += ln
        (got_url, _, got_body, _e), = parse_warc(
            gzip.decompress(blob[off:off + ln]))
        assert (got_url, got_body) == (url, body)
    assert pos == len(blob)


@given(st.lists(st.integers(min_value=0, max_value=9),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=5),
       st.integers(min_value=0, max_value=9))
@settings(max_examples=120, deadline=None)
def test_cluster_lookup_recovers_every_capture(tmp_path_factory,
                                               url_ids, block_lines,
                                               probe):
    """Captures (possibly MANY per url — runs spanning > block_lines
    blocks) are all recovered by lookup, and a url with no captures
    returns none."""
    tmp = tmp_path_factory.mktemp("cdxcluster")
    urls = [f"https://site{i}.example/p" for i in url_ids]
    caps = sorted(
        ((surt_key(u), dt.datetime(2025, 5, 4, 12, 0, k % 60), u,
          100 * k, 10, str(tmp / "x.warc.gz"))
         for k, u in enumerate(urls)),
        key=lambda r: (r[0], r[1]))
    write_master_and_cluster(iter(caps), str(tmp), block_lines)
    cluster = CdxCluster(str(tmp))
    probe_url = f"https://site{probe}.example/p"
    got = cluster.lookup_index_rows([probe_url])
    want_offsets = sorted(r[3] for r in caps if r[2] == probe_url)
    if not want_offsets:
        assert len(got) == 0
    else:
        assert sorted(got.column("offset").to_pylist()) == want_offsets
    missing = cluster.lookup_index_rows(
        ["https://site99.example/absent"])
    assert len(missing) == 0
