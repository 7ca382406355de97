"""OOXML .xlsx extraction (SURVEY §2.2 M32): SpreadsheetML semantics,
writer/reader closure, routing, and totality on corrupt bytes."""

from __future__ import annotations

import io
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.docx import zip_read
from text_extraction_ray.core.encoding import sniff_doc_type
from text_extraction_ray.core.extract import extract_document
from text_extraction_ray.core.html_extract import JOINER
from text_extraction_ray.core.xlsx import (
    _col_index,
    _col_letters,
    build_xlsx,
    extract_xlsx,
    is_xlsx,
    parse_xlsx,
)


def test_col_index_and_letters_inverse():
    for col, letters in [(1, "A"), (26, "Z"), (27, "AA"), (52, "AZ"),
                         (53, "BA"), (702, "ZZ"), (703, "AAA")]:
        assert _col_index(letters) == col
        assert _col_letters(col) == letters


def test_parse_shared_inline_number_bool():
    data = build_xlsx([("S", [["alpha", 7, True], ["beta", 3.5, False]])])
    cells = parse_xlsx(data)
    assert [(c["row"], c["col"], c["value"], c["kind"]) for c in cells] == [
        (1, 1, "alpha", "s"), (1, 2, "7", "n"), (1, 3, "1", "b"),
        (2, 1, "beta", "s"), (2, 2, "3.5", "n"), (2, 3, "0", "b"),
    ]


def test_parse_inline_strings_variant():
    data = build_xlsx([("S", [["x & y", "z"]])], shared=False)
    cells = parse_xlsx(data)
    assert [(c["value"], c["kind"]) for c in cells] == [
        ("x & y", "inlineStr"), ("z", "inlineStr")]


def test_gap_cells_keep_explicit_refs():
    """None leaves a column gap; the following cell's r= reference must
    place it correctly."""
    data = build_xlsx([("S", [["a", None, "c"]])])
    cells = parse_xlsx(data)
    assert [(c["row"], c["col"], c["value"]) for c in cells] == [
        (1, 1, "a"), (1, 3, "c")]


def test_referenceless_cells_advance_columnwise():
    """Cells without r= advance column-by-column within the row
    (§18.3.1.4) — hand-built sheet, not from our writer."""
    from text_extraction_ray.core.docx import build_zip
    from text_extraction_ray.core.xlsx import build_xlsx as _b

    base = _b([("S", [["a", "b"]])], shared=False)
    import re
    sheet = zip_read(base, "xl/worksheets/sheet1.xml").decode()
    stripped = re.sub(r' r="[A-Z]+\d+"', "", sheet)
    # rebuild the package with the stripped sheet
    from text_extraction_ray.core.docx import zip_entries
    members = []
    for name in zip_entries(base):
        payload = zip_read(base, name)
        if name == "xl/worksheets/sheet1.xml":
            payload = stripped.encode()
        members.append((name, payload))
    cells = parse_xlsx(build_zip(members))
    assert [(c["row"], c["col"], c["value"]) for c in cells] == [
        (1, 1, "a"), (1, 2, "b")]


def test_formula_bodies_never_captured():
    """<f> is not a value: only <v>/<is><t> capture text."""
    data = build_xlsx([("S", [[5]])])
    sheet = zip_read(data, "xl/worksheets/sheet1.xml").decode()
    hacked = sheet.replace("<v>5</v>", "<f>SUM(A1:A9)</f><v>5</v>")
    from text_extraction_ray.core.docx import build_zip, zip_entries
    members = [(n, hacked.encode() if n == "xl/worksheets/sheet1.xml"
                else zip_read(data, n)) for n in zip_entries(data)]
    cells = parse_xlsx(build_zip(members))
    assert [(c["value"], c["kind"]) for c in cells] == [("5", "n")]


def test_multi_sheet_workbook_order_via_rels():
    data = build_xlsx([("First", [["a"]]), ("Zweite & dritte", [["b"]])])
    cells = parse_xlsx(data)
    assert [(c["sheet"], c["value"]) for c in cells] == [
        ("First", "a"), ("Zweite & dritte", "b")]


def test_shared_rich_text_runs_concatenate():
    """<si> with multiple <r><t> runs (rich text) reassembles exactly —
    hand-edited shared table."""
    data = build_xlsx([("S", [["placeholder"]])])
    ss = zip_read(data, "xl/sharedStrings.xml").decode()
    hacked = ss.replace(
        '<si><t xml:space="preserve">placeholder</t></si>',
        '<si><r><t xml:space="preserve">concat</t></r>'
        '<r><t xml:space="preserve">enated</t></r></si>')
    from text_extraction_ray.core.docx import build_zip, zip_entries
    members = [(n, hacked.encode() if n == "xl/sharedStrings.xml"
                else zip_read(data, n)) for n in zip_entries(data)]
    cells = parse_xlsx(build_zip(members))
    assert cells[0]["value"] == "concatenated"


@given(st.lists(
    st.lists(st.one_of(
        st.text(st.characters(min_codepoint=32, max_codepoint=591),
                min_size=0, max_size=20),
        st.integers(-10**6, 10**6),
        st.booleans(),
        st.none()), min_size=1, max_size=5),
    min_size=1, max_size=6),
    st.booleans(), st.booleans())
@settings(max_examples=40, deadline=None)
def test_build_parse_roundtrip_property(rows, deflate, shared):
    """build_xlsx → parse_xlsx recovers every non-None cell value at
    its (row, col), for arbitrary mixed-type grids and both container
    variants."""
    data = build_xlsx([("S", rows)], deflate=deflate, shared=shared)
    got = {(c["row"], c["col"]): c["value"] for c in parse_xlsx(data)}
    want = {}
    for r, cols in enumerate(rows, start=1):
        for ci, v in enumerate(cols, start=1):
            if v is None:
                continue
            want[(r, ci)] = (str(int(v)) if isinstance(v, bool)
                             else v if isinstance(v, str) else str(v))
    assert got == want


def test_writer_read_by_stdlib():
    data = build_xlsx([("S", [["a", 1]])])
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        assert zf.testzip() is None
        assert "xl/workbook.xml" in zf.namelist()


def test_extract_xlsx_assembly():
    data = build_xlsx([("Data", [["a", 1], ["", True]]),
                       ("Other", [["z"]])])
    r = extract_xlsx(data, JOINER)
    assert r["parse_ok"]
    assert r["extracted_text"] == JOINER.join(
        ["Data", "a", "1", "1", "Other", "z"])
    assert r["n_blocks_dropped"] == 1        # the empty string cell
    text = r["extracted_text"]
    assert [text[a:b] for a, b in r["spans"]] == [
        "Data", "a", "1", "1", "Other", "z"]


def test_extract_xlsx_total_on_garbage():
    from text_extraction_ray.core.docx import build_zip

    for payload in [b"", b"PK\x03\x04junk", b"not a zip",
                    build_zip([("xl/workbook.xml", b"<workbook/>")])]:
        r = extract_xlsx(payload, JOINER)
        assert not r["parse_ok"]
        assert r["error"].startswith("xlsx:")


def test_sniff_routes_xlsx():
    data = build_xlsx([("S", [["a"]])])
    assert is_xlsx(data)
    assert sniff_doc_type(data) == "xlsx"
    # docx wins when both member names appear (impossible in practice,
    # but the order is pinned)
    from text_extraction_ray.core.docx import build_docx
    assert sniff_doc_type(build_docx([("x", "")])) == "docx"


def test_extract_document_xlsx_contract():
    body = [["the quick brown fox", 42], ["jumps over the lazy dog", 7]]
    row = extract_document(build_xlsx([("Sheet1", body)]))
    assert row["doc_type"] == "xlsx"
    assert row["parse_ok"]
    assert row["charset"] == "utf-8"
    assert row["n_blocks_kept"] == 5
    text = row["extracted_text"]
    assert [text[a:b] for a, b in row["spans"]][:2] == [
        "Sheet1", "the quick brown fox"]


def test_extract_document_corrupt_xlsx_error_routed():
    data = build_xlsx([("S", [["hello world cell", 3]])])
    row = extract_document(data[: len(data) - 9])
    assert row["doc_type"] == "xlsx"
    assert not row["parse_ok"]
    assert row["error"].startswith("xlsx:")
    assert row["extracted_text"] == ""


def test_phonetic_rph_runs_excluded_from_cell_text():
    """ADVICE r4: <rPh> phonetic runs (furigana) and <phoneticPr> inside
    an <si> are hints, not cell text — standard readers exclude them."""
    data = build_xlsx([("S", [["placeholder"]])])
    ss = zip_read(data, "xl/sharedStrings.xml").decode()
    hacked = ss.replace(
        '<si><t xml:space="preserve">placeholder</t></si>',
        '<si><r><t xml:space="preserve">東京</t></r>'
        '<rPh sb="0" eb="2"><t>トウキョウ</t></rPh>'
        '<phoneticPr fontId="1" type="katakana"/></si>')
    assert hacked != ss
    from text_extraction_ray.core.docx import build_zip, zip_entries
    members = [(n, hacked.encode() if n == "xl/sharedStrings.xml"
                else zip_read(data, n)) for n in zip_entries(data)]
    cells = parse_xlsx(build_zip(members))
    assert cells[0]["value"] == "東京"
