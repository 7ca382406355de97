"""RTF extraction (SURVEY §2.2 M35): control-word grammar, escape
protocols, destination skipping, writer/reader closure, routing,
totality."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.encoding import sniff_doc_type
from text_extraction_ray.core.extract import extract_document
from text_extraction_ray.core.html_extract import JOINER
from text_extraction_ray.core.rtf import build_rtf, extract_rtf, parse_rtf


def test_parse_basic_paragraphs_and_furniture_skipped():
    d = build_rtf(["First paragraph", "Second one"])
    assert parse_rtf(d) == ["First paragraph", "Second one"]
    # font table / color table / generator info never leak
    text = " ".join(parse_rtf(d))
    assert "Times" not in text and "generator" not in text


def test_hex_escapes_decode_via_declared_codepage():
    """cp1252-specific points (0x80-0x9F differ from latin-1)."""
    raw = rb"{\rtf1\ansi\ansicpg1252 caf\'e9 \'80 \'93dash\'94\par}"
    assert parse_rtf(raw) == ["café € “dash”"]


def test_unicode_escape_uc_protocol():
    """\\uN with \\ucN fallback skipping, signed 16-bit form."""
    raw = rb"{\rtf1\uc2 a\u233ZZb\uc1 \u-10179\'3f c\par}"
    # \u-10179 = 55357 — a surrogate half; readers replace it
    paras = parse_rtf(raw)
    assert paras[0].startswith("aéb")
    assert "ZZ" not in paras[0] and "?" not in paras[0].replace("�", "")


def test_unicode_cjk_roundtrip():
    d = build_rtf(["数据 系统 test"], unicode_form=True)
    assert parse_rtf(d) == ["数据 系统 test"]


def test_footnote_and_star_destinations_excluded():
    d = build_rtf(["visible body"], with_footnote="hidden footnote")
    assert parse_rtf(d) == ["visible body"]
    raw = rb"{\rtf1 a{\*\mystery ignored stuff}b{\footnote gone}c\par}"
    assert parse_rtf(raw) == ["abc"]


def test_tabs_cells_rows_fold():
    raw = rb"{\rtf1 a\tab b\cell c\cell\row next\par}"
    assert parse_rtf(raw) == ["a b c", "next"]


def test_literal_braces_and_special_symbols():
    raw = rb"{\rtf1 \{x\} \\ \~ \emdash\endash\lquote q\rquote\par}"
    assert parse_rtf(raw) == ["{x} \\ —–‘q’"]


def test_not_rtf_raises():
    with pytest.raises(ValueError):
        parse_rtf(b"plain text")
    r = extract_rtf(b"\\rtf no brace", JOINER)
    assert not r["parse_ok"] and r["error"].startswith("rtf:")


def test_parse_total_on_truncations_and_junk():
    base = build_rtf(["hello world truncated doc"], with_footnote="x")
    for cut in [6, 10, 20, len(base) // 2, len(base) - 2]:
        paras = parse_rtf(base[:cut])      # never raises past the magic
        assert isinstance(paras, list)


@given(st.lists(st.text(st.characters(min_codepoint=32, max_codepoint=700),
                        min_size=1, max_size=50), min_size=1, max_size=6),
       st.booleans())
@settings(max_examples=50, deadline=None)
def test_build_extract_roundtrip_property(paras, unicode_form):
    from text_extraction_ray.core.dom import collapse_ws

    d = build_rtf(paras, unicode_form=unicode_form)
    r = extract_rtf(d, JOINER)
    assert r["parse_ok"]
    want = [collapse_ws(t).strip() for t in paras]
    want = [t for t in want if t]
    assert r["extracted_text"] == JOINER.join(want)


def test_sniff_routes_rtf():
    d = build_rtf(["hello"])
    assert sniff_doc_type(d) == "rtf"
    assert sniff_doc_type(b"{\\rtf1 x}") == "rtf"


def test_extract_document_rtf_contract():
    body = ("the quick brown fox jumps over the lazy dog while the sun "
            "is high in the sky")
    row = extract_document(build_rtf(["A Title", body]))
    assert row["doc_type"] == "rtf"
    assert row["parse_ok"]
    assert row["lang"] == "en"
    assert row["n_blocks_kept"] == 2
    text = row["extracted_text"]
    assert [text[a:b] for a, b in row["spans"]] == ["A Title", body]
