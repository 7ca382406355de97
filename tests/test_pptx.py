"""OOXML .pptx extraction (SURVEY §2.2 M33): slide discovery through
presentation rels, the shared paragraph grammar, writer/reader closure,
routing, and totality on corrupt bytes."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.docx import build_zip, zip_entries, zip_read
from text_extraction_ray.core.encoding import sniff_doc_type
from text_extraction_ray.core.extract import extract_document
from text_extraction_ray.core.html_extract import JOINER
from text_extraction_ray.core.pptx import (
    build_pptx,
    extract_pptx,
    is_pptx,
    parse_pptx,
)


def test_parse_slide_order_via_rels():
    data = build_pptx([["slide one title", "body text"],
                       ["slide two & more"]])
    paras = parse_pptx(data)
    assert [(p["slide"], p["text"]) for p in paras] == [
        (1, "slide one title"), (1, "body text"), (2, "slide two & more")]


def test_parse_split_runs_concatenate():
    data = build_pptx([["concatenated paragraph"]], split_runs=True)
    assert [p["text"] for p in parse_pptx(data)] == [
        "concatenated paragraph"]


def test_empty_paragraphs_counted_dropped():
    data = build_pptx([["kept", ""]])
    r = extract_pptx(data, JOINER)
    assert r["extracted_text"] == "kept"
    assert (r["n_blocks_kept"], r["n_blocks_dropped"]) == (1, 1)


def test_rels_indirection_is_load_bearing():
    """Scrambled slide targets in the rels part reorder the text —
    proof the parser resolves r:id → Target rather than guessing
    sequential part names."""
    base = build_pptx([["first"], ["second"]])
    rels = zip_read(base, "ppt/_rels/presentation.xml.rels").decode()
    swapped = (rels.replace("slides/slide1.xml", "slides/slideX.xml")
                   .replace("slides/slide2.xml", "slides/slide1.xml")
                   .replace("slides/slideX.xml", "slides/slide2.xml"))
    members = [(n, swapped.encode()
                if n == "ppt/_rels/presentation.xml.rels"
                else zip_read(base, n)) for n in zip_entries(base)]
    assert [p["text"] for p in parse_pptx(build_zip(members))] == [
        "second", "first"]


@given(st.lists(
    st.lists(st.text(st.characters(min_codepoint=32, max_codepoint=591),
                     min_size=1, max_size=40), min_size=1, max_size=4),
    min_size=1, max_size=4),
    st.booleans(), st.booleans())
@settings(max_examples=40, deadline=None)
def test_build_extract_roundtrip_property(slides, deflate, split_runs):
    from text_extraction_ray.core.dom import collapse_ws

    data = build_pptx(slides, deflate=deflate, split_runs=split_runs)
    r = extract_pptx(data, JOINER)
    assert r["parse_ok"]
    want = [collapse_ws(t).strip() for sl in slides for t in sl]
    want = [t for t in want if t]
    assert r["extracted_text"] == JOINER.join(want)


def test_extract_pptx_total_on_garbage():
    for payload in [b"", b"PK\x03\x04junk", b"not a zip",
                    build_zip([("ppt/presentation.xml", b"<p/>")])]:
        r = extract_pptx(payload, JOINER)
        assert not r["parse_ok"]
        assert r["error"].startswith("pptx:")


def test_sniff_routes_pptx_after_docx_xlsx():
    data = build_pptx([["hello"]])
    assert is_pptx(data)
    assert sniff_doc_type(data) == "pptx"


def test_extract_document_pptx_contract():
    body = ("the quick brown fox jumps over the lazy dog while the "
            "sun is high and the day is long")
    row = extract_document(build_pptx([["Deck Title", body]]))
    assert row["doc_type"] == "pptx"
    assert row["parse_ok"]
    assert row["lang"] == "en"
    assert row["n_blocks_kept"] == 2
    text = row["extracted_text"]
    assert [text[a:b] for a, b in row["spans"]] == ["Deck Title", body]


def test_extract_document_corrupt_pptx_error_routed():
    data = build_pptx([["hello world slide"]])
    row = extract_document(data[: len(data) - 6])
    assert row["doc_type"] == "pptx"
    assert not row["parse_ok"]
    assert row["error"].startswith("pptx:")
