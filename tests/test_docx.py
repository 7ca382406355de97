"""OOXML .docx extraction (SURVEY §2.2 M31): ZIP container vs the
stdlib-zipfile oracle, markup semantics, writer/reader closure, routing,
and totality on corrupt bytes."""

from __future__ import annotations

import io
import zipfile
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.docx import (
    build_docx,
    build_zip,
    docx_to_text,
    extract_docx,
    is_docx,
    parse_docx,
    zip_entries,
    zip_read,
)
from text_extraction_ray.core.encoding import sniff_doc_type
from text_extraction_ray.core.extract import extract_document
from text_extraction_ray.core.html_extract import JOINER


# --------------------------------------------------------------------------
# ZIP container — our reader vs the stdlib zipfile oracle, both directions
# --------------------------------------------------------------------------

def test_zip_reader_reads_stdlib_archives():
    """Archives written by the INDEPENDENT stdlib writer (stored and
    deflated) extract byte-identically through zip_read."""
    members = {"a.txt": b"hello world", "dir/b.bin": bytes(range(256)) * 40,
               "empty": b""}
    for method in (zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", method) as zf:
            for name, payload in members.items():
                zf.writestr(name, payload)
        data = buf.getvalue()
        ents = zip_entries(data)
        assert set(ents) == set(members)
        for name, payload in members.items():
            assert zip_read(data, name, ents) == payload


def test_zip_writer_read_by_stdlib():
    """Archives from build_zip open cleanly in stdlib zipfile (CRCs,
    sizes, offsets all consistent) — both compression modes."""
    members = [("x.xml", b"<a>" + b"y" * 5000 + b"</a>"), ("s", b"abc")]
    for deflate in (True, False):
        data = build_zip(members, deflate=deflate)
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            assert zf.testzip() is None
            for name, payload in members:
                assert zf.read(name) == payload


@given(st.lists(
    st.tuples(st.text(st.characters(min_codepoint=48, max_codepoint=122),
                      min_size=1, max_size=12),
              st.binary(max_size=2000)),
    min_size=1, max_size=6, unique_by=lambda t: t[0]))
@settings(max_examples=40, deadline=None)
def test_zip_roundtrip_property(members):
    data = build_zip(members)
    ents = zip_entries(data)
    for name, payload in members:
        assert zip_read(data, name, ents) == payload


def test_zip_crc_mismatch_detected():
    data = bytearray(build_zip([("m", b"payload-bytes")], deflate=False))
    i = data.find(b"payload-bytes")
    data[i] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        zip_read(bytes(data), "m")


def test_zip_total_on_corrupt_bytes():
    """Truncations anywhere raise ValueError — never struct.error or
    IndexError leaking out of the container layer."""
    base = build_docx([("some body text", "")])
    for cut in [0, 3, 10, 30, len(base) // 2, len(base) - 5]:
        with pytest.raises(ValueError):
            zip_read(base[:cut], "word/document.xml")


def test_zip_inflate_cap():
    """A member whose declared uncompressed size exceeds the 64 MiB cap
    is refused before inflation (zip-bomb bound)."""
    import struct as _s
    data = bytearray(build_zip([("m", b"x" * 100)], deflate=False))
    # patch uncomp_size in the central directory entry (offset +24..28)
    p = data.find(b"PK\x01\x02")
    data[p + 24:p + 28] = _s.pack("<I", (64 << 20) + 1)
    with pytest.raises(ValueError, match="cap"):
        zip_read(bytes(data), "m")


# --------------------------------------------------------------------------
# word/document.xml markup semantics
# --------------------------------------------------------------------------

def test_parse_runs_concatenate_exactly():
    """Split-mid-word preserve-space runs reassemble byte-identically."""
    xml = ('<w:document><w:body><w:p>'
           '<w:r><w:t xml:space="preserve">conca</w:t></w:r>'
           '<w:r><w:t xml:space="preserve">tenated</w:t></w:r>'
           '</w:p></w:body></w:document>')
    paras = parse_docx(xml)
    assert [p["text"] for p in paras] == ["concatenated"]


def test_parse_tab_br_fold_to_space_and_ws_collapses():
    xml = ('<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/>'
           '<w:t>  c\td</w:t></w:r></w:p>')
    assert [p["text"] for p in parse_docx(xml)] == ["a b c d"]


def test_parse_styles_tables_and_entities():
    xml = ('<w:body>'
           '<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
           '<w:r><w:t>Title &amp; more</w:t></w:r></w:p>'
           '<w:tbl><w:tr>'
           '<w:tc><w:p><w:r><w:t>c1</w:t></w:r></w:p></w:tc>'
           '<w:tc><w:p><w:r><w:t>c2</w:t></w:r></w:p></w:tc>'
           '</w:tr></w:tbl>'
           '<w:p/></w:body>')
    paras = parse_docx(xml)
    assert [(p["text"], p["style"], p["in_table"]) for p in paras] == [
        ("Title & more", "Heading1", False),
        ("c1", "", True),
        ("c2", "", True),
        ("", "", False),
    ]


def test_parse_instrtext_and_deltext_excluded():
    """Field codes and tracked deletions never reach the text: only a
    <w:t> open captures literals."""
    xml = ('<w:p><w:r><w:instrText>PAGEREF _Toc</w:instrText></w:r>'
           '<w:r><w:delText>gone</w:delText></w:r>'
           '<w:r><w:t>kept</w:t></w:r></w:p>')
    assert [p["text"] for p in parse_docx(xml)] == ["kept"]


def test_docx_to_text_span_conventions():
    """Spans follow html_extract.assemble: joiner-separated, empty
    paragraphs dropped and counted."""
    paras = [{"text": "alpha", "style": "", "in_table": False},
             {"text": "", "style": "", "in_table": False},
             {"text": "beta", "style": "", "in_table": True}]
    text, spans, kept, dropped = docx_to_text(paras, JOINER)
    assert text == "alpha" + JOINER + "beta"
    assert (kept, dropped) == (2, 1)
    assert [text[a:b] for a, b in spans] == ["alpha", "beta"]


# --------------------------------------------------------------------------
# Writer/reader closure + full-document extraction
# --------------------------------------------------------------------------

@given(st.lists(st.text(st.characters(min_codepoint=32, max_codepoint=591),
                        min_size=1, max_size=60),
                min_size=1, max_size=8),
       st.booleans(), st.booleans())
@settings(max_examples=40, deadline=None)
def test_build_extract_roundtrip_property(texts, deflate, split_runs):
    """build_docx → extract_docx recovers exactly the ws-collapsed
    non-empty paragraphs, in order, for arbitrary unicode text."""
    from text_extraction_ray.core.dom import collapse_ws
    payload = build_docx([(t, "") for t in texts],
                         deflate=deflate, split_runs=split_runs)
    r = extract_docx(payload, JOINER)
    assert r["parse_ok"]
    want = [collapse_ws(t).strip() for t in texts]
    want = [t for t in want if t]
    assert r["extracted_text"] == JOINER.join(want)
    assert r["n_blocks_kept"] == len(want)


def test_extract_docx_with_table():
    payload = build_docx([("Intro", "Heading1"), ("body text", "")],
                         table_rows=[["r1c1", "r1c2"], ["r2c1", "r2c2"]])
    r = extract_docx(payload, JOINER)
    assert r["parse_ok"]
    assert r["extracted_text"] == JOINER.join(
        ["Intro", "body text", "r1c1", "r1c2", "r2c1", "r2c2"])
    assert r["n_blocks_kept"] == 6


def test_extract_docx_total_on_garbage():
    for payload in [b"", b"PK\x03\x04junk", b"not a zip at all",
                    build_zip([("other.xml", b"<a/>")])]:
        r = extract_docx(payload, JOINER)
        assert not r["parse_ok"]
        assert r["error"].startswith("docx:")
        assert r["extracted_text"] == ""


# --------------------------------------------------------------------------
# Routing: sniff + extract_document contract
# --------------------------------------------------------------------------

def test_sniff_routes_docx_vs_other_zip():
    docx = build_docx([("hello", "")])
    assert is_docx(docx)
    assert sniff_doc_type(docx) == "docx"
    other_zip = build_zip([("data/file.csv", b"a,b\n1,2\n")])
    assert sniff_doc_type(other_zip) == "unknown"
    assert not is_docx(other_zip)


def test_extract_document_docx_contract():
    """doc_type=docx rows carry the full flagship schema: lang votes from
    the body, charset utf-8, spans index the text."""
    body = ("the quick brown fox jumps over the lazy dog and then the "
            "fox rests because the day is long and the sun is high")
    payload = build_docx([("Report Title", "Heading1"), (body, "")])
    row = extract_document(payload)
    assert row["doc_type"] == "docx"
    assert row["parse_ok"]
    assert row["charset"] == "utf-8"
    assert row["lang"] == "en"
    assert row["n_blocks_kept"] == 2
    text = row["extracted_text"]
    assert [text[a:b] for a, b in row["spans"]] == ["Report Title", body]


def test_zip_data_descriptor_member_reads_via_central_dir():
    """Streaming writers set flag bit 3 and zero the LOCAL header's
    crc/sizes (real data in a trailing descriptor); zip_read must stay
    correct because it trusts the CENTRAL directory, never the local
    header."""
    import struct as _s

    payload = b"descriptor member payload"
    crc = zlib.crc32(payload) & 0xFFFFFFFF
    nb = b"m.txt"
    local = (_s.pack("<IHHHHHIII", 0x04034B50, 20, 0x08, 0, 0, 0x21,
                     0, 0, 0)               # bit 3: crc/sizes ZERO here
             + _s.pack("<HH", len(nb), 0) + nb + payload
             + _s.pack("<IIII", 0x08074B50, crc, len(payload),
                       len(payload)))       # the descriptor
    central = (_s.pack("<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0x08,
                       0, 0, 0x21, crc, len(payload), len(payload),
                       len(nb), 0, 0, 0, 0, 0, 0) + nb)
    data = (local + central
            + _s.pack("<IHHHHIIH", 0x06054B50, 0, 0, 1, 1,
                      len(central), len(local), 0))
    assert zip_read(data, "m.txt") == payload


def test_parse_footnotes_skips_separators_and_orders():
    from text_extraction_ray.core.docx import build_docx, parse_footnotes

    payload = build_docx(
        [("body", "")],
        footnotes=[(1, ["first note"]),
                   (2, ["second note p1", "second note p2"])])
    rows = parse_footnotes(payload)
    assert rows == [
        {"fn_id": 1, "text": "first note"},
        {"fn_id": 2, "text": "second note p1"},
        {"fn_id": 2, "text": "second note p2"},
    ]


def test_parse_footnotes_absent_member_raises():
    from text_extraction_ray.core.docx import build_docx, parse_footnotes

    with pytest.raises(ValueError):
        parse_footnotes(build_docx([("no footnotes here", "")]))


def test_footnotes_not_in_flagship_body():
    """Policy pin (same as ODT note exclusion): footnote text never
    reaches extract_docx's body — it has its own operator."""
    from text_extraction_ray.core.docx import build_docx, extract_docx

    payload = build_docx([("body only", "")],
                         footnotes=[(1, ["secret footnote"])])
    r = extract_docx(payload, JOINER)
    assert r["extracted_text"] == "body only"
    assert "secret" not in r["extracted_text"]


def test_extract_document_corrupt_docx_error_routed():
    """A truncated docx lands on the error route with parse_ok=False —
    extract_document stays total."""
    payload = build_docx([("hello world paragraph", "")])
    row = extract_document(payload[: len(payload) - 7])
    assert row["doc_type"] == "docx"
    assert not row["parse_ok"]
    assert row["error"].startswith("docx:")
    assert row["extracted_text"] == ""
