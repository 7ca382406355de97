"""EPUB extraction (SURVEY §2.2 M44): OCF/OPF package semantics,
spine ordering, writer/reader closure, routing, totality."""

from __future__ import annotations

import io
import zipfile

from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.docx import build_zip
from text_extraction_ray.core.encoding import sniff_doc_type
from text_extraction_ray.core.epub import (
    _resolve,
    build_chapter_xhtml,
    build_epub,
    build_opf,
    extract_epub,
    is_epub,
    parse_container,
    parse_epub,
    parse_opf,
)
from text_extraction_ray.core.extract import extract_document
from text_extraction_ray.core.html_extract import JOINER


def test_parse_container_rootfile():
    xml = ('<?xml version="1.0"?><container><rootfiles>'
           '<rootfile full-path="OEBPS/a&amp;b.opf" '
           'media-type="application/oebps-package+xml"/>'
           '<rootfile full-path="second.opf"/></rootfiles></container>')
    assert parse_container(xml) == "OEBPS/a&b.opf"  # first wins, entities


def test_parse_opf_spine_order_and_unknown_idref():
    xml = ('<package><manifest>'
           '<item id="c2" href="two.xhtml" media-type="application/xhtml+xml"/>'
           '<item id="c1" href="one.xhtml" media-type="application/xhtml+xml"/>'
           '<item id="css" href="style.css" media-type="text/css"/>'
           '</manifest><spine>'
           '<itemref idref="c1"/><itemref idref="ghost"/>'
           '<itemref idref="c2"/></spine></package>')
    # spine order wins over manifest order; unknown idrefs are skipped
    assert parse_opf(xml) == ["one.xhtml", "two.xhtml"]


def test_parse_opf_namespaced_tags():
    xml = ('<opf:package><opf:manifest>'
           '<opf:item id="a" href="ch.xhtml"/></opf:manifest>'
           '<opf:spine><opf:itemref idref="a"/></opf:spine></opf:package>')
    assert parse_opf(xml) == ["ch.xhtml"]


def test_resolve_relative_hrefs():
    assert _resolve("OEBPS", "ch1.xhtml") == "OEBPS/ch1.xhtml"
    assert _resolve("OEBPS", "../ch1.xhtml") == "ch1.xhtml"
    assert _resolve("", "a/./b.xhtml#frag") == "a/b.xhtml"
    assert _resolve("a/b", "../c.xhtml?x=1") == "a/c.xhtml"


def test_extract_spine_order_and_blocks():
    ep = build_epub([("One", ["first & para", "second"]),
                     ("Two", ["third café"])])
    chapters = parse_epub(ep)
    assert [p for p, _ in chapters] == ["OEBPS/ch000.xhtml",
                                        "OEBPS/ch001.xhtml"]
    assert chapters[0][1] == ["One", "first & para", "second"]
    assert chapters[1][1] == ["Two", "third café"]
    r = extract_epub(ep, JOINER)
    assert r["parse_ok"] and r["n_blocks_kept"] == 5
    assert r["extracted_text"].startswith("One" + JOINER + "first & para")
    # spans reassemble exactly (the flagship span contract)
    for s, e in r["spans"]:
        assert r["extracted_text"][s:e]


def test_stdlib_zipfile_interop():
    """The writer emits archives the stdlib can read — independent
    container oracle (the docx interop discipline)."""
    ep = build_epub([("T", ["p1"])])
    zf = zipfile.ZipFile(io.BytesIO(ep))
    names = zf.namelist()
    assert names[0] == "mimetype"
    info = zf.getinfo("mimetype")
    assert info.compress_type == zipfile.ZIP_STORED  # OCF §3.3
    assert zf.read("mimetype") == b"application/epub+zip"
    assert zf.read("META-INF/container.xml").startswith(b"<?xml")


def test_missing_spine_member_errors():
    opf = build_opf(["ch000.xhtml", "missing.xhtml"])
    members = [
        ("mimetype", b"application/epub+zip"),
        ("META-INF/container.xml",
         b'<container><rootfiles><rootfile full-path="content.opf"/>'
         b"</rootfiles></container>"),
        ("content.opf", opf),
        ("ch000.xhtml", build_chapter_xhtml("T", ["p"])),
    ]
    r = extract_epub(build_zip(members), JOINER)
    assert not r["parse_ok"] and "missing spine member" in r["error"]


def test_totality_on_malformed_packages():
    cases = [
        b"PK\x03\x04 truncated application/epub+zip",
        build_zip([("mimetype", b"application/epub+zip")]),  # no container
        build_zip([("mimetype", b"application/epub+zip"),
                   ("META-INF/container.xml", b"<container/>")]),  # no root
    ]
    for payload in cases:
        r = extract_epub(payload, JOINER)
        assert not r["parse_ok"] and r["error"].startswith("epub:")


def test_sniff_routes_epub_not_other_zip():
    ep = build_epub([("T", ["p"])])
    assert is_epub(ep)
    assert sniff_doc_type(ep) == "epub"
    # a plain zip without the mimetype stays unknown
    other = build_zip([("readme.txt", b"hello")])
    assert sniff_doc_type(other) == "unknown"


def test_extract_document_contract():
    ep = build_epub([("Title One", ["alpha & beta", "gamma"])])
    r = extract_document(ep)
    assert r["doc_type"] == "epub" and r["parse_ok"]
    assert r["n_blocks_kept"] == 3
    assert r["extracted_text"].split(JOINER) == [
        "Title One", "alpha & beta", "gamma"]
    # corrupt container routes to the error row, never raises
    bad = ep[:200] + b"application/epub+zip"
    r = extract_document(bad)
    assert not r["parse_ok"]


@given(st.lists(
    st.tuples(
        st.text(st.characters(min_codepoint=32, max_codepoint=591,
                              exclude_characters="<>&"),
                min_size=1, max_size=20).map(str.strip).filter(bool),
        st.lists(st.text(st.characters(min_codepoint=32, max_codepoint=591),
                         min_size=1, max_size=60),
                 min_size=0, max_size=4)),
    min_size=1, max_size=4),
    st.booleans())
@settings(max_examples=40, deadline=None)
def test_build_extract_roundtrip(chapters, deflate):
    """build → extract recovers every chapter title + paragraph whose
    normalized text is non-empty, in spine order."""
    from text_extraction_ray.core.dom import collapse_ws

    ep = build_epub(chapters, deflate=deflate)
    r = extract_epub(ep, JOINER)
    assert r["parse_ok"]
    want = []
    for title, paras in chapters:
        for t in [title, *paras]:
            norm = collapse_ws(t).strip()
            if norm:
                want.append(norm)
    assert r["extracted_text"].split(JOINER) if want else True
    got = r["extracted_text"].split(JOINER) if r["extracted_text"] else []
    assert got == want


def test_corpus_sweep_epub_and_mhtml_rows_extract():
    """Corpus v=21 routing sweep: every planted EPUB/MHTML row in the
    3000-row corpus sniffs to its type and extracts real text (cheap:
    only the narrow band's rows run the parser)."""
    from text_extraction_ray.sources.synth import make_row

    counts = {"epub": 0, "mhtml": 0}
    for i in range(3000):
        row = make_row(i)
        t = sniff_doc_type(row["html"])
        if t in counts:
            counts[t] += 1
            res = extract_document(row["html"], row["lang"])
            assert res["doc_type"] == t and res["parse_ok"]
            assert res["extracted_text"]
    assert counts["epub"] >= 3 and counts["mhtml"] >= 3


def test_nav_document_excluded_from_spine():
    """EPUB 3 §5.4: a properties="nav" manifest item in the spine is
    the TOC — link boilerplate, not content — and must not extract."""
    xml = ('<package><manifest>'
           '<item id="nav" href="nav.xhtml" properties="nav"/>'
           '<item id="c0" href="ch.xhtml"/>'
           '</manifest><spine>'
           '<itemref idref="nav"/><itemref idref="c0"/></spine>'
           "</package>")
    assert parse_opf(xml) == ["ch.xhtml"]
    # a spine of ONLY the nav doc counts as empty (nothing readable)
    only_nav = ('<package><manifest>'
                '<item id="nav" href="nav.xhtml" properties="nav"/>'
                '</manifest><spine><itemref idref="nav"/></spine>'
                "</package>")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_opf(only_nav)
