"""M37: legacy Word binary (.doc) piece-table extraction."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.doc_legacy import (
    build_doc,
    doc_text_chars,
    extract_doc,
    parse_doc,
)
from text_extraction_ray.core.encoding import sniff_doc_type
from text_extraction_ray.core.extract import extract_document


def test_cp1252_and_unicode_pieces_roundtrip():
    paras = ["Smart “quotes” — and em-dash.", "Plain ascii line."]
    for uni in (False, True):
        got = parse_doc(build_doc(paras, unicode_pieces=uni))
        assert got == paras, uni


def test_non_cp1252_text_forces_unicode_piece():
    """CJK can't ride a compressed piece even when unicode_pieces=False
    — the writer must fall back per piece and the reader must decode."""
    paras = ["東京 テスト", "ascii"]
    got = parse_doc(build_doc(paras, unicode_pieces=False))
    assert got == paras


def test_split_pieces_reassemble_exactly():
    paras = ["One paragraph split across two pieces mid-word."]
    blob = build_doc(paras, split_pieces=True)
    assert parse_doc(blob) == paras


def test_both_table_streams():
    for which in (0, 1):
        blob = build_doc(["x y z"], which_tbl=which)
        assert parse_doc(blob) == ["x y z"]


def test_field_instruction_excluded_result_kept():
    blob = build_doc(["After."], field=("HYPERLINK http://evil", "shown"))
    got = parse_doc(blob)
    assert got == ["shown After."]
    assert "evil" not in " ".join(got)


def test_control_chars_fold_like_rtf():
    """0x07 cell / 0x0B line → space; 0x0C page → paragraph break;
    0x1E nb-hyphen → '-'; 0x1F soft hyphen dropped — the cross-format
    policy shared with core/rtf.py."""
    text = "a\x07b\x0bc\x0cnext\x1epage\x1fs"
    blob = build_doc([text])
    assert parse_doc(blob) == ["a b c", "next-pages"]


def test_malformed_routes_value_error():
    r = extract_doc(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 600,
                    "\n\n")
    assert not r["parse_ok"] and r["error"].startswith("doc:")
    with pytest.raises(ValueError):
        doc_text_chars(b"not a doc at all")


def test_sniff_and_extract_document_contract():
    blob = build_doc(["Corpus body paragraph here.", "Second one."])
    assert sniff_doc_type(blob) == "doc"
    r = extract_document(blob, "en")
    assert r["doc_type"] == "doc" and r["parse_ok"]
    assert "Corpus body paragraph here." in r["extracted_text"]
    # spans reassemble exactly
    for a, b in r["spans"]:
        seg = r["extracted_text"][a:b]
        assert seg and seg == seg.strip()


def test_truncated_doc_total():
    blob = build_doc(["hello world"] * 3)
    for cut in (8, 512, 700, len(blob) - 9):
        r = extract_doc(blob[:cut], "\n\n")
        assert isinstance(r["parse_ok"], bool)


@given(st.lists(
    st.text(st.characters(min_codepoint=32, max_codepoint=0x2122,
                          blacklist_categories=("Cs",)),
            min_size=1, max_size=40).map(lambda s: " ".join(s.split())),
    min_size=1, max_size=5),
    st.booleans(), st.booleans(), st.integers(0, 1))
@settings(max_examples=40, deadline=None)
def test_build_parse_roundtrip_property(paras, uni, split, tbl):
    paras = [p for p in (q.strip() for q in paras) if p]
    if not paras:
        paras = ["x"]
    got = parse_doc(build_doc(paras, unicode_pieces=uni,
                              split_pieces=split, which_tbl=tbl))
    assert got == paras


def test_corpus_carries_extractable_legacy_office():
    """Corpus v=20's [0.68, 0.687) band plants .doc/.xls/.ppt; every
    planted document must route to its legacy type and extract
    non-empty text (totality + routing end-to-end)."""
    from collections import Counter

    from text_extraction_ray.sources.synth import make_row

    seen = Counter()
    for i in range(3000):
        row = make_row(i)
        res = extract_document(row["html"], row["lang"])
        if res["doc_type"] in ("doc", "xls", "ppt"):
            seen[res["doc_type"]] += 1
            assert res["parse_ok"] and res["extracted_text"], (
                i, res["doc_type"], res["error"])
    assert seen["doc"] >= 3 and seen["xls"] >= 2 and seen["ppt"] >= 2, seen
