"""M38: legacy Excel binary (.xls, BIFF8) extraction."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.encoding import sniff_doc_type
from text_extraction_ray.core.extract import extract_document
from text_extraction_ray.core.xls_legacy import (
    _decode_rk,
    _fmt_num,
    build_xls,
    extract_xls,
    parse_xls,
)


def _cells_map(blob):
    return {(c["sheet"], c["row"], c["col"]): (c["value"], c["kind"])
            for c in parse_xls(blob)}


def test_kind_matrix_shared_and_inline():
    rows = [["hello", 42, 2.5, True], ["wörld", -7, 0.5, False]]
    for shared in (True, False):
        got = _cells_map(build_xls([("S", rows)], shared=shared))
        sk = "s" if shared else "inlineStr"
        assert got[("S", 1, 1)] == ("hello", sk)
        assert got[("S", 1, 2)] == ("42", "n")
        assert got[("S", 1, 3)] == ("2.5", "n")
        assert got[("S", 1, 4)] == ("1", "b")
        assert got[("S", 2, 1)] == ("wörld", sk)
        assert got[("S", 2, 4)] == ("0", "b")


def test_rk_vs_number_value_invisible():
    rows = [[1, -1, 536870911, -536870912, 12345]]
    a = _cells_map(build_xls([("S", rows)], use_rk=True))
    b = _cells_map(build_xls([("S", rows)], use_rk=False))
    assert a == b


def test_rk_decoding_forms():
    assert _decode_rk((100 << 2) | 0x02) == 100.0
    assert _decode_rk((12345 << 2) | 0x03) == 123.45   # fInt + ×100
    import struct
    top30 = struct.unpack("<I", struct.pack("<d", 2.5)[4:])[0] & 0xFFFFFFFC
    assert _decode_rk(top30) == 2.5


def test_fmt_num_pinned():
    assert _fmt_num(3.0) == "3"
    assert _fmt_num(-42.0) == "-42"
    assert _fmt_num(2.5) == "2.5"
    assert _fmt_num(0.1) == "0.1"


def test_sst_continue_split_mid_chars():
    """SST overflowing the record cap splits character data across
    CONTINUE records with the re-specified flags byte — both the
    1-byte and 2-byte character forms must survive the boundary."""
    rows = [["A" * 400, "見" * 300, "B" * 500, "Ω" * 250, "C" * 600]]
    blob = build_xls([("S", rows)], shared=True, sst_cap=128)
    got = _cells_map(blob)
    for col, want in enumerate(rows[0], start=1):
        assert got[("S", 1, col)][0] == want, col


def test_multi_sheet_order_and_gaps():
    sheets = [("Alpha", [["a", None, "c"]]), ("Beta", [[None, 9]])]
    got = parse_xls(build_xls(sheets))
    assert [(c["sheet"], c["row"], c["col"]) for c in got] == [
        ("Alpha", 1, 1), ("Alpha", 1, 3), ("Beta", 1, 2)]
    r = extract_xls(build_xls(sheets), "\n\n")
    assert r["extracted_text"] == "Alpha\n\na\n\nc\n\nBeta\n\n9"


def test_malformed_routes_value_error():
    r = extract_xls(b"\xd0\xcf\x11\xe0 junk", "\n\n")
    assert not r["parse_ok"] and r["error"].startswith("xls:")
    with pytest.raises(ValueError):
        parse_xls(b"PK\x03\x04")


def test_sniff_and_extract_document_contract():
    blob = build_xls([("Sales", [["total", 99]])])
    assert sniff_doc_type(blob) == "xls"
    r = extract_document(blob, "en")
    assert r["doc_type"] == "xls" and r["parse_ok"]
    assert r["extracted_text"] == "Sales\n\ntotal\n\n99"


def test_truncated_total():
    blob = build_xls([("S", [["x", 1]] * 50)])
    for cut in (8, 512, 700, len(blob) - 11):
        r = extract_xls(blob[:cut], "\n\n")
        assert isinstance(r["parse_ok"], bool)


@given(st.lists(
    st.lists(st.one_of(
        st.text(st.characters(min_codepoint=32, max_codepoint=591),
                min_size=0, max_size=12),
        st.integers(-10**8, 10**8),
        st.booleans(),
        st.none()), min_size=1, max_size=4),
    min_size=1, max_size=5),
    st.booleans(), st.booleans(), st.integers(64, 512))
@settings(max_examples=40, deadline=None)
def test_build_parse_roundtrip_property(rows, shared, use_rk, cap):
    """Every non-None cell value is recovered at its (row, col) across
    shared/inline, RK/NUMBER and forced-small SST caps."""
    blob = build_xls([("S", rows)], shared=shared, use_rk=use_rk,
                     sst_cap=cap)
    got = _cells_map(blob)
    for ri, r in enumerate(rows):
        for ci, v in enumerate(r):
            if v is None:
                continue
            cell = got[("S", ri + 1, ci + 1)][0]
            if isinstance(v, bool):
                assert cell == str(int(v))
            elif isinstance(v, str):
                assert cell == v
            else:
                assert cell == _fmt_num(float(v))
