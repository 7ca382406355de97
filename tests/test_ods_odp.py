"""OpenDocument spreadsheet/presentation extraction (SURVEY §2.2
M47/M48): ODF table + drawing-page grammars, typed cells, repeats,
notes exclusion, routing, totality, stdlib-zipfile interop."""

from __future__ import annotations

import io
import zipfile

from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.docx import zip_read
from text_extraction_ray.core.encoding import sniff_doc_type
from text_extraction_ray.core.extract import extract_document
from text_extraction_ray.core.html_extract import JOINER
from text_extraction_ray.core.ods_odp import (
    build_ods,
    build_odp,
    extract_ods,
    extract_odp,
    parse_ods,
    parse_odp,
)


def test_ods_typed_cells_and_gaps():
    ods = build_ods([("S0", [["a & b", 42, 2.5, True],
                             [None, "after gap", False]])])
    cells = parse_ods(zip_read(ods, "content.xml").decode())
    assert [(c["row"], c["col"], c["kind"], c["value"])
            for c in cells] == [
        (1, 1, "s", "a & b"), (1, 2, "n", "42"), (1, 3, "n", "2.5"),
        (1, 4, "b", "1"),
        (2, 2, "s", "after gap"), (2, 3, "b", "0")]


def test_ods_repeated_columns_expand_and_empty_repeats_advance():
    xml = ('<office:spreadsheet><table:table table:name="R">'
           "<table:table-row>"
           '<table:table-cell table:number-columns-repeated="3">'
           "<text:p>dup</text:p></table:table-cell>"
           '<table:table-cell table:number-columns-repeated="1000"/>'
           "<table:table-cell><text:p>tail</text:p></table:table-cell>"
           "</table:table-row></table:table></office:spreadsheet>")
    cells = parse_ods(xml)
    assert [(c["col"], c["value"]) for c in cells] == [
        (1, "dup"), (2, "dup"), (3, "dup"), (1004, "tail")]


def test_ods_repeated_rows_advance_cursor():
    xml = ('<table:table table:name="R">'
           "<table:table-row><table:table-cell><text:p>r1</text:p>"
           "</table:table-cell></table:table-row>"
           '<table:table-row table:number-rows-repeated="5"/>'
           "<table:table-row><table:table-cell><text:p>r7</text:p>"
           "</table:table-cell></table:table-row></table:table>")
    cells = parse_ods(xml)
    assert [(c["row"], c["value"]) for c in cells] == [(1, "r1"),
                                                       (7, "r7")]


def test_odp_slides_and_notes_exclusion():
    odp = build_odp([["Title one", "bullet & a", ""], ["Two"]],
                    with_notes=True)
    paras = parse_odp(zip_read(odp, "content.xml").decode())
    assert [(p["slide"], p["para_idx"], p["text"]) for p in paras] == [
        (1, 0, "Title one"), (1, 1, "bullet & a"), (1, 2, ""),
        (2, 0, "Two")]
    r = extract_odp(odp, JOINER)
    assert r["n_blocks_kept"] == 3 and r["n_blocks_dropped"] == 1
    assert "presenter only" not in r["extracted_text"]


def test_sniff_and_extract_document_routing():
    ods = build_ods([("S", [["x", 1]])])
    odp = build_odp([["p"]])
    assert sniff_doc_type(ods) == "ods"
    assert sniff_doc_type(odp) == "odp"
    r = extract_document(ods)
    assert r["doc_type"] == "ods" and r["parse_ok"]
    assert r["extracted_text"] == "S" + JOINER + "x" + JOINER + "1"
    r2 = extract_document(odp)
    assert r2["doc_type"] == "odp" and r2["parse_ok"]
    # deflated packages still sniff: the mimetype member is FORCED
    # stored (the longer ODF mimetypes shrink under deflate)
    assert sniff_doc_type(build_ods([("S", [["x"]])], deflate=True)) \
        == "ods"


def test_stdlib_zipfile_interop_and_stored_mimetype():
    ods = build_ods([("S", [["x"]])], deflate=True)
    zf = zipfile.ZipFile(io.BytesIO(ods))
    info = zf.getinfo("mimetype")
    assert zf.namelist()[0] == "mimetype"
    assert info.compress_type == zipfile.ZIP_STORED
    assert zf.read("mimetype") == (
        b"application/vnd.oasis.opendocument.spreadsheet")


def test_totality_on_malformed_packages():
    for payload in (b"PK\x03\x04 junk "
                    b"application/vnd.oasis.opendocument.spreadsheet",
                    b"PK\x03\x04 junk "
                    b"application/vnd.oasis.opendocument.presentation"):
        r = extract_document(payload)
        assert not r["parse_ok"] and r["error"]


@given(st.lists(st.lists(
    st.one_of(st.text(st.characters(min_codepoint=32, max_codepoint=591),
                      max_size=20),
              st.integers(-10_000, 10_000),
              st.booleans()),
    min_size=1, max_size=4), min_size=1, max_size=4),
    st.booleans())
@settings(max_examples=40, deadline=None)
def test_ods_build_parse_roundtrip(rows, deflate):
    ods = build_ods([("S0", rows)], deflate=deflate)
    cells = parse_ods(zip_read(ods, "content.xml").decode())
    from text_extraction_ray.core.dom import collapse_ws
    want = []
    for ri, r in enumerate(rows):
        for ci, v in enumerate(r):
            if isinstance(v, bool):
                want.append((ri + 1, ci + 1, "1" if v else "0"))
            elif isinstance(v, int):
                want.append((ri + 1, ci + 1, str(v)))
            else:
                norm = collapse_ws(v).strip()
                if norm:
                    want.append((ri + 1, ci + 1, norm))
    assert [(c["row"], c["col"], c["value"]) for c in cells] == want


def test_flat_odf_routes_and_extracts():
    """M50: flat ODF (single-file <office:document office:mimetype=...>)
    routes to the same odt/ods/odp extractors — the grammar inside is
    identical, only the container differs."""
    flat_odt = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document office:mimetype='
        '"application/vnd.oasis.opendocument.text" '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0">'
        "<office:body><office:text>"
        "<text:h text:outline-level=\"1\">Flat title</text:h>"
        "<text:p>flat body &amp; text</text:p>"
        "</office:text></office:body></office:document>").encode()
    assert sniff_doc_type(flat_odt) == "odt"
    r = extract_document(flat_odt)
    assert r["doc_type"] == "odt" and r["parse_ok"]
    assert r["extracted_text"] == "Flat title" + JOINER + "flat body & text"

    flat_ods = (
        '<?xml version="1.0"?><office:document office:mimetype='
        '"application/vnd.oasis.opendocument.spreadsheet">'
        '<table:table table:name="F"><table:table-row>'
        '<table:table-cell office:value-type="float" office:value="7"/>'
        "<table:table-cell><text:p>flat cell</text:p></table:table-cell>"
        "</table:table-row></table:table></office:document>").encode()
    assert sniff_doc_type(flat_ods) == "ods"
    r2 = extract_document(flat_ods)
    assert r2["doc_type"] == "ods" and r2["parse_ok"]
    assert r2["extracted_text"] == "F" + JOINER + "7" + JOINER + "flat cell"

    flat_odp = (
        '<office:document office:mimetype='
        '"application/vnd.oasis.opendocument.presentation">'
        '<draw:page draw:name="p1"><draw:frame><draw:text-box>'
        "<text:p>flat slide</text:p>"
        "</draw:text-box></draw:frame></draw:page>"
        "</office:document>").encode()
    assert sniff_doc_type(flat_odp) == "odp"
    r3 = extract_document(flat_odp)
    assert r3["doc_type"] == "odp" and r3["parse_ok"]
    assert r3["extracted_text"] == "flat slide"

    # a page merely MENTIONING office:mimetype in body text stays html
    fake = (b"<html><body><p>about office:mimetype="
            b'"application/vnd.oasis.opendocument.text" docs'
            b"</p></body></html>")
    assert sniff_doc_type(fake) == "html"
