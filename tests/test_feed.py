"""M28: RSS/Atom feed extraction — parser units, routing, corpus, parity."""

import duckdb
import pandas as pd
import pytest

from text_extraction_ray.core.encoding import decode_xml, sniff_doc_type
from text_extraction_ray.core.extract import extract_document
from text_extraction_ray.core.feed import feed_to_text, parse_feed

RSS = """<?xml version="1.0" encoding="utf-8"?>
<rss version="2.0"><channel>
<title>Blog &amp; Notes</title>
<item><title>First &#8212; post</title><link>https://b.ex/1</link>
<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
<description><![CDATA[Body with <b>tags</b> & amp]]></description></item>
<item><title>Second</title><description>plain</description></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
<title>Atom Title</title>
<entry><title>E1</title><link rel="alternate" href="https://a.ex/1"/>
<updated>2024-01-01T00:00:00Z</updated><summary>s one</summary></entry>
<entry><title>E2</title><link href="https://a.ex/2"/>
<published>2024-01-02T00:00:00Z</published><summary>s two</summary></entry>
</feed>"""


def test_parse_rss_fields():
    p = parse_feed(RSS)
    assert p["kind"] == "rss"
    assert p["feed_title"] == "Blog & Notes"
    assert [it["title"] for it in p["items"]] == ["First — post", "Second"]
    assert p["items"][0]["link"] == "https://b.ex/1"
    assert p["items"][0]["date"] == "Mon, 01 Jan 2024 00:00:00 GMT"
    # CDATA: markup stays literal, raw ampersand survives
    assert p["items"][0]["summary"] == "Body with <b>tags</b> & amp"


def test_parse_atom_fields():
    p = parse_feed(ATOM)
    assert p["kind"] == "atom"
    assert p["feed_title"] == "Atom Title"
    assert [it["link"] for it in p["items"]] \
        == ["https://a.ex/1", "https://a.ex/2"]
    assert [it["date"] for it in p["items"]] \
        == ["2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z"]


def test_feed_to_text_spans():
    text, spans, kept = feed_to_text(parse_feed(ATOM), "\n\n")
    assert kept == 5          # feed title + 2×(title, summary)
    assert [text[a:b] for a, b in spans] \
        == ["Atom Title", "E1", "s one", "E2", "s two"]


def test_sniff_routes_feeds_not_html():
    assert sniff_doc_type(RSS.encode()) == "feed"
    assert sniff_doc_type(ATOM.encode()) == "feed"
    assert sniff_doc_type(b"\xef\xbb\xbf \n" + ATOM.encode()) == "feed"
    # an HTML page MENTIONING <rss stays html
    html = (b"<!DOCTYPE html><html><body><p>all about <rss> tags"
            b"</p></body></html>")
    assert sniff_doc_type(html) == "html"


def test_decode_xml_prolog_encoding():
    xml = '<?xml version="1.0" encoding="ISO-8859-1"?><rss>\xe9</rss>'
    text, cs = decode_xml(xml.encode("latin-1"))
    assert cs == "latin-1" and "\xe9" in text
    assert decode_xml(b"\xef\xbb\xbf<feed/>")[1] == "utf-8-bom"


def test_extract_document_feed_route():
    r = extract_document(RSS.encode())
    assert r["doc_type"] == "feed" and r["parse_ok"]
    assert r["extracted_text"].startswith("Blog & Notes")
    assert r["n_blocks_kept"] == 5
    assert [r["extracted_text"][a:b] for a, b in r["spans"]][1] \
        == "First — post"


def test_feed_totality_on_garbage():
    for g in (b"<rss>", b"<feed><entry><title>x",
              b"<?xml version='1.0'?><rss><item></rss>",
              b"<rss>" + b"\xff" * 64,
              ("<rss><channel>" + "<item>" * 2000).encode()):
        r = extract_document(g)
        assert r["doc_type"] == "feed"
        assert isinstance(r["extracted_text"], str)


def test_corpus_carries_extractable_feeds():
    from text_extraction_ray.sources.synth import make_row

    n_feed = n_text = 0
    for i in range(3000):
        row = make_row(i)
        res = extract_document(row["html"], row["lang"])
        if res["doc_type"] == "feed":
            n_feed += 1
            if res["extracted_text"] and res["parse_ok"]:
                n_text += 1
    assert n_feed > 20 and n_text == n_feed


@pytest.mark.parametrize("sf_dir",
                         ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_feed_items_duckdb_parity(ray_session, sf_dir):
    from text_extraction_ray.pipelines.queries_r4b import (
        SQL_FEED_ITEMS, q_feed_items)

    got = (q_feed_items(sf_dir).to_pandas()
           .sort_values(["doc_id", "item_idx"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf_dir}/documents.parquet'")
    want = con.execute(SQL_FEED_ITEMS
                       + " ORDER BY doc_id, item_idx").fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
