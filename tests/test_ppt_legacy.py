"""M39: legacy PowerPoint binary (.ppt) extraction."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.encoding import sniff_doc_type
from text_extraction_ray.core.extract import extract_document
from text_extraction_ray.core.ppt_legacy import (
    build_ppt,
    extract_ppt,
    parse_ppt,
)


def _by_slide(rows):
    out = {}
    for r in rows:
        out.setdefault(r["slide"], []).append(r["text"])
    return out


def test_chars_and_bytes_atoms_roundtrip():
    slides = [["Title", "bullet one"], ["äöü latin-1 text"]]
    for ca in (True, False):
        got = _by_slide(parse_ppt(build_ppt(slides, chars_atoms=ca)))
        assert got == {1: slides[0], 2: slides[1]}, ca


def test_non_latin1_forces_chars_atom():
    slides = [["東京 スライド …"]]
    got = _by_slide(parse_ppt(build_ppt(slides, chars_atoms=False)))
    assert got == {1: slides[0]}


def test_cr_paragraphs_and_vt_linebreak():
    blob = build_ppt([["a\x0bb", "", "c"]])
    rows = parse_ppt(blob)
    assert [r["text"] for r in rows] == ["a b", "", "c"]
    r = extract_ppt(blob, "\n\n")
    assert r["extracted_text"] == "a b\n\nc"
    assert r["n_blocks_dropped"] == 1


def test_slide_order_is_document_order():
    slides = [[f"slide {k}"] for k in range(5)]
    rows = parse_ppt(build_ppt(slides))
    assert [(r["slide"], r["text"]) for r in rows] == [
        (k + 1, f"slide {k}") for k in range(5)]


def test_malformed_routes_value_error():
    r = extract_ppt(b"\xd0\xcf\x11\xe0 junk", "\n\n")
    assert not r["parse_ok"] and r["error"].startswith("ppt:")
    with pytest.raises(ValueError):
        parse_ppt(b"not cfb")


def test_sniff_and_extract_document_contract():
    blob = build_ppt([["Deck title", "first bullet"]])
    assert sniff_doc_type(blob) == "ppt"
    r = extract_document(blob, "en")
    assert r["doc_type"] == "ppt" and r["parse_ok"]
    assert r["extracted_text"] == "Deck title\n\nfirst bullet"


def test_truncated_total():
    blob = build_ppt([["hello world"] * 4] * 3)
    for cut in (8, 512, 600, len(blob) - 13):
        r = extract_ppt(blob[:cut], "\n\n")
        assert isinstance(r["parse_ok"], bool)


@given(st.lists(
    st.lists(st.text(st.characters(min_codepoint=32, max_codepoint=0x2122,
                                   blacklist_categories=("Cs",)),
                     min_size=1, max_size=30)
             .map(lambda s: " ".join(s.split()))
             .filter(lambda s: s),
             min_size=1, max_size=4),
    min_size=1, max_size=4),
    st.booleans())
@settings(max_examples=40, deadline=None)
def test_build_parse_roundtrip_property(slides, ca):
    got = _by_slide(parse_ppt(build_ppt(slides, chars_atoms=ca)))
    assert got == {k + 1: s for k, s in enumerate(slides)}
