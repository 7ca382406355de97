"""OpenDocument .odt extraction (SURVEY §2.2 M34): ODF markup
semantics, writer/reader closure, routing, totality."""

from __future__ import annotations

import io
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.docx import build_zip
from text_extraction_ray.core.encoding import sniff_doc_type
from text_extraction_ray.core.extract import extract_document
from text_extraction_ray.core.html_extract import JOINER
from text_extraction_ray.core.odt import (
    build_odt,
    extract_odt,
    is_odt,
    parse_odt,
)


def test_parse_paragraphs_headings_spans():
    xml = ('<office:text>'
           '<text:h text:outline-level="2">Title &amp; more</text:h>'
           '<text:p>plain <text:span text:style-name="T1">nested'
           '</text:span> tail</text:p>'
           '<text:p/></office:text>')
    assert parse_odt(xml) == [
        {"text": "Title & more", "heading": 2},
        {"text": "plain nested tail", "heading": 0},
        {"text": "", "heading": 0},
    ]


def test_parse_tab_break_and_run_length_spaces():
    xml = ('<text:p>a<text:tab/>b<text:line-break/>c'
           '<text:s text:c="5"/>d<text:s/>e</text:p>')
    assert parse_odt(xml) == [{"text": "a b c d e", "heading": 0}]


def test_notes_and_annotations_excluded():
    """Footnote bodies and comments are not body text."""
    xml = ('<text:p>before'
           '<text:note text:note-class="footnote"><text:note-body>'
           '<text:p>footnote text</text:p></text:note-body></text:note>'
           ' after'
           '<office:annotation><text:p>reviewer comment</text:p>'
           '</office:annotation>'
           ' end</text:p>')
    assert parse_odt(xml) == [{"text": "before after end", "heading": 0}]


@given(st.lists(
    st.tuples(st.text(st.characters(min_codepoint=32, max_codepoint=591),
                      min_size=1, max_size=50),
              st.integers(0, 3)),
    min_size=1, max_size=8),
    st.booleans(), st.booleans())
@settings(max_examples=40, deadline=None)
def test_build_extract_roundtrip_property(paras, deflate, use_spans):
    from text_extraction_ray.core.dom import collapse_ws

    data = build_odt(paras, deflate=deflate, use_spans=use_spans)
    r = extract_odt(data, JOINER)
    assert r["parse_ok"]
    want = [collapse_ws(t).strip() for t, _ in paras]
    want = [t for t in want if t]
    assert r["extracted_text"] == JOINER.join(want)


def test_extract_odt_total_on_garbage():
    for payload in [b"", b"PK\x03\x04junk", b"not a zip",
                    build_zip([("mimetype",
                                b"application/vnd.oasis.opendocument.text")])]:
        r = extract_odt(payload, JOINER)
        assert not r["parse_ok"]
        assert r["error"].startswith("odt:")


def test_writer_read_by_stdlib_and_mimetype_first():
    data = build_odt([("hello world", 0)])
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        assert zf.testzip() is None
        infos = zf.infolist()
        assert infos[0].filename == "mimetype"
        assert infos[0].compress_type == zipfile.ZIP_STORED
        assert zf.read("mimetype") == (
            b"application/vnd.oasis.opendocument.text")


def test_sniff_routes_odt():
    data = build_odt([("hello", 0)])
    assert is_odt(data)
    assert sniff_doc_type(data) == "odt"


def test_extract_document_odt_contract():
    body = ("the quick brown fox jumps over the lazy dog and the day "
            "is long under the high sun")
    row = extract_document(build_odt([("Report", 1), (body, 0)]))
    assert row["doc_type"] == "odt"
    assert row["parse_ok"]
    assert row["lang"] == "en"
    assert row["n_blocks_kept"] == 2
    text = row["extracted_text"]
    assert [text[a:b] for a, b in row["spans"]] == ["Report", body]


def test_extract_document_corrupt_odt_error_routed():
    data = build_odt([("hello world paragraph", 0)])
    row = extract_document(data[: len(data) - 5])
    assert row["doc_type"] == "odt"
    assert not row["parse_ok"]
    assert row["error"].startswith("odt:")
