"""MHTML web-archive extraction (SURVEY §2.2 M45): MIME envelope
parsing, content-transfer-encodings, root selection, charset
precedence, routing, totality — and the headline property: an archived
page extracts byte-identically to its live-HTML twin."""

from __future__ import annotations

import quopri

from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.encoding import sniff_doc_type
from text_extraction_ray.core.extract import extract_document
from text_extraction_ray.core.mhtml import (
    build_mhtml,
    content_type_params,
    decode_cte,
    decode_qp,
    encode_qp,
    extract_mhtml,
    looks_like_mhtml,
    parse_headers,
    parse_mhtml,
)

_PAGE = ("<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
         "<title>t</title></head><body>"
         "<nav><a href='/'>Home</a> <a href='/x'>More</a></nav>"
         "<main><p>"
         + "the and of to in that it is was for on are as with his they "
           "at be this have from or had by but not what all were " * 4
         + "café =40 end</p></main></body></html>").encode("utf-8")


def test_qp_decode_units():
    assert decode_qp(b"a=3Db") == b"a=b"
    assert decode_qp(b"soft=\r\nbreak") == b"softbreak"
    assert decode_qp(b"bare=\nlf") == b"barelf"
    assert decode_qp(b"bad=zz escape=") == b"bad=zz escape="  # literal
    assert decode_qp(b"caf=C3=A9") == "café".encode("utf-8")


@given(st.binary(max_size=400))
@settings(max_examples=100, deadline=None)
def test_qp_roundtrip_and_stdlib_parity(data):
    enc = encode_qp(data)
    assert decode_qp(enc) == data
    # the stdlib decoder agrees on our encoder's output (independent
    # oracle for the escape grammar)
    assert quopri.decodestring(enc) == data


def test_header_folding_and_params():
    block = (b"Content-Type: multipart/related;\r\n"
             b"\tboundary=\"b o u n d\";\r\n"
             b" start=\"<r@x>\"\r\n"
             b"X-Other: v\r\n\r\nbody")
    headers = parse_headers(block)
    assert headers[0][0] == "content-type"
    media, params = content_type_params(headers[0][1])
    assert media == "multipart/related"
    assert params["boundary"] == "b o u n d"
    assert params["start"] == "<r@x>"


def test_decode_cte_base64_torn_tail():
    import binascii
    good = binascii.b2a_base64(b"hello world").strip()
    assert decode_cte(good, "base64") == b"hello world"
    # torn final group: drop it rather than raise
    assert decode_cte(good + b"x", "base64").startswith(b"hello")
    assert decode_cte(b"raw bytes", "8bit") == b"raw bytes"


def test_root_selection_start_param():
    mh = build_mhtml(_PAGE, cte="base64", start=True,
                     extra_parts=[("image/png", b"\x89PNG000")])
    parts = parse_mhtml(mh)
    assert parts[0]["media"] == "text/html"  # root first despite order
    assert parts[1]["media"] == "image/png"


def test_first_html_part_wins_without_start():
    mh = build_mhtml(_PAGE, cte="quoted-printable",
                     extra_parts=[("text/css", b"body{}")])
    parts = parse_mhtml(mh)
    assert parts[0]["media"] == "text/html"


def test_charset_param_precedence():
    # cp1252-encoded page with NO meta tag; the part header's charset
    # must drive the decode (the stored-bytes authority)
    page = ("<html><body><nav><a href='/'>Home</a></nav>"
            "<p>café "
            + "the and of to in that it is was for on are " * 8
            + "</p></body></html>").encode("cp1252")
    mh = build_mhtml(page, cte="base64", charset="windows-1252")
    r = extract_mhtml(mh)
    assert r["parse_ok"] and r["charset"] == "cp1252"
    assert "café" in r["extracted_text"]


def test_archived_page_equals_live_twin():
    """The headline invariant: wrapping a page as MHTML never changes
    its extracted bytes."""
    live = extract_document(_PAGE)
    for cte in ("quoted-printable", "base64", "7bit"):
        arch = extract_document(build_mhtml(_PAGE, cte=cte))
        assert arch["doc_type"] == "mhtml" and arch["parse_ok"]
        assert arch["extracted_text"] == live["extracted_text"]
        assert arch["spans"] == live["spans"]
        assert arch["n_blocks_kept"] == live["n_blocks_kept"]


def test_sniff_conservative():
    mh = build_mhtml(_PAGE)
    assert looks_like_mhtml(mh) and sniff_doc_type(mh) == "mhtml"
    # an HTML page MENTIONING multipart/related never routes here
    fake = b"<html><body><p>about multipart/related MIME</p></body></html>"
    assert not looks_like_mhtml(fake)
    assert sniff_doc_type(fake) == "html"
    # a bare header line without the multipart hint is not MHTML —
    # it routes down the plain-text path (M49)
    assert sniff_doc_type(b"Subject: hello\r\n\r\nplain text") == "text"


def test_totality_on_malformed_envelopes():
    cases = [
        b"MIME-Version: 1.0\r\nContent-Type: multipart/related\r\n\r\nx",
        b"MIME-Version: 1.0\r\nContent-Type: multipart/related; "
        b"boundary=b\r\n\r\nno parts here",
        b"MIME-Version: 1.0\r\nContent-Type: multipart/related; "
        b"boundary=b\r\n\r\n--b\r\nheaders only no blank line--b--",
        build_mhtml(_PAGE)[:120],
    ]
    for payload in cases:
        r = extract_mhtml(payload)
        assert not r["parse_ok"] and r["error"].startswith("mhtml:")


def test_root_not_html_errors():
    mh = build_mhtml(_PAGE, cte="base64")
    # surgically retype the html part
    mh = mh.replace(b"Content-Type: text/html", b"Content-Type: text/plain")
    r = extract_mhtml(mh)
    assert not r["parse_ok"] and "root part is text/plain" in r["error"]


@given(st.binary(max_size=300), st.sampled_from(
    ["quoted-printable", "base64", "7bit"]))
@settings(max_examples=60, deadline=None)
def test_part_body_byte_recovery(data, cte):
    """Arbitrary bytes survive the envelope + CTE round trip (7bit only
    when the bytes cannot collide with the boundary grammar)."""
    if cte == "7bit" and (b"--" in data or b"\r" in data or b"\n" in data):
        return
    mh = build_mhtml(data, cte=cte)
    parts = parse_mhtml(mh)
    assert parts[0]["body"] == data


def test_boundary_text_inside_body_does_not_split():
    """RFC 2046 §5.1.1: the delimiter is line-anchored (CRLF--boundary)
    — boundary TEXT occurring mid-line inside a 7bit body must not
    split the part."""
    evil = _PAGE.replace(b"</main>",
                         b"<p>mentioning ----=_Part_0_1234 inline</p>"
                         b"</main>")
    assert b"--" in evil
    mh = build_mhtml(evil, cte="7bit")
    parts = parse_mhtml(mh)
    assert len(parts) == 1
    assert parts[0]["body"] == evil
    live = extract_document(evil)
    arch = extract_document(mh)
    assert arch["extracted_text"] == live["extracted_text"]
