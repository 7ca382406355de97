"""Charset sniff/decode unit tests (SURVEY SS5.2)."""

from text_extraction_ray.core.encoding import decode_html, sniff_doc_type


def test_sniff_pdf_empty_unknown():
    assert sniff_doc_type(b"%PDF-1.4 junk") == "pdf"
    assert sniff_doc_type(b"") == "empty"
    assert sniff_doc_type(b"\x00\x01\x02 binary junk") == "unknown"


def test_sniff_html_variants():
    assert sniff_doc_type(b"<!DOCTYPE html><p>x</p>") == "html"
    assert sniff_doc_type(b"  <HTML><body>") == "html"
    assert sniff_doc_type(b"<div class=x>") == "html"


def test_bom_wins():
    text, cs = decode_html(b"\xef\xbb\xbf<p>caf\xc3\xa9</p>")
    assert cs == "utf-8-bom"
    assert "café" in text


def test_meta_charset_latin1():
    raw = '<meta charset="ISO-8859-1"><p>café</p>'.encode("latin-1")
    text, cs = decode_html(raw)
    assert cs == "latin-1"
    assert "café" in text


def test_meta_http_equiv():
    raw = (b'<meta http-equiv="Content-Type" '
           b'content="text/html; charset=windows-1252"><p>caf\xe9</p>')
    text, cs = decode_html(raw)
    assert cs == "cp1252"
    assert "café" in text


def test_strict_utf8_fallback():
    text, cs = decode_html("<p>日本語</p>".encode())
    assert cs == "utf-8"
    assert "日本語" in text


def test_latin1_total_fallback():
    text, cs = decode_html(b"<p>\xff\xfa bad utf8</p>")
    assert cs in ("latin-1", "utf-16-le")  # \xff\xfe would be a BOM; \xff\xfa is not
    assert cs == "latin-1"
    assert text  # never raises
