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


def test_multibyte_declared_charsets_decode():
    """Round 2 (VERDICT r1 'Missing' #3): declared multi-byte charsets
    decode through the alias table or codecs.lookup — never the latin-1
    mojibake fallback."""
    from text_extraction_ray.core.encoding import decode_html

    cases = [
        ("shift_jis", "日本語 テスト 抽出 処理", "shift_jis"),
        ("gb2312", "中文 测试 文本 处理", "gb2312"),
        ("koi8-r", "русский текст пример", "koi8-r"),
        ("cp1251", "кириллица проверка", "cp1251"),
        ("euc-kr", "한국어 테스트 문서", "euc_kr"),
        ("iso-8859-2", "čeština žluťoučký", "iso8859-2"),
    ]
    for declared, phrase, want_codec in cases:
        page = (f'<html><head><meta charset="{declared}"></head>'
                f'<body><p>{phrase}</p></body></html>').encode(declared)
        text, used = decode_html(page)
        assert used == want_codec, (declared, used)
        assert phrase in text, declared


def test_unknown_or_nontext_charset_falls_through_totally():
    """A bogus or non-text declared charset must not crash and must fall
    to the utf-8/latin-1 total path."""
    from text_extraction_ray.core.encoding import decode_html

    for declared in ("x-not-a-charset", "rot13", "base64"):
        page = (f'<html><head><meta charset="{declared}"></head>'
                f'<body><p>hello</p></body></html>').encode("utf-8")
        text, used = decode_html(page)
        assert "hello" in text
        assert used in ("utf-8", "latin-1")


def test_xml_prolog_page_mentioning_rss_stays_html():
    """ADVICE r4 (medium): an XHTML page with an XML prolog whose early
    body text merely MENTIONS '<rss ' must route html, not feed — the
    feed branch keys on the FIRST actual element after the prolog."""
    page = (b'<?xml version="1.0" encoding="utf-8"?>\n'
            b'<!DOCTYPE html>\n'
            b'<html xmlns="http://www.w3.org/1999/xhtml"><head>'
            b'<title>About &lt;rss &gt; and <rss : a primer</title></head>'
            b'<body><p>body text here</p></body></html>')
    assert sniff_doc_type(page) == "html"


def test_xml_prolog_feed_with_comments_and_doctype_routes_feed():
    """Misc nodes (PI, comment, DOCTYPE) between the prolog and the feed
    root are skipped; the root element decides."""
    feed = (b'<?xml version="1.0"?>\n'
            b'<!-- generator: hand -->\n'
            b'<?xml-stylesheet type="text/xsl" href="f.xsl"?>\n'
            b'<rss version="2.0"><channel><title>t</title></channel></rss>')
    assert sniff_doc_type(feed) == "feed"
    atom = (b'\xef\xbb\xbf<?xml version="1.0" encoding="utf-8"?>'
            b'<feed xmlns="http://www.w3.org/2005/Atom"></feed>')
    assert sniff_doc_type(atom) == "feed"
    # truncated-inside-comment head: conservative (not feed, not crash)
    assert sniff_doc_type(b'<?xml version="1.0"?><!-- ' + b"x" * 4096) \
        != "feed"


def test_gzip_transport_inflates_and_reroutes():
    """M46: gzip-wrapped payloads inflate (bounded, salvaging) and the
    inner document extracts with its OWN doc_type; garbage after the
    magic and deep nesting route to error rows."""
    import zlib

    from text_extraction_ray.core.encoding import sniff_doc_type
    from text_extraction_ray.core.extract import extract_document

    page = (b"<html><body><p>hello gzip world "
            + b"the and of to in that it is was for on are as with his "
              b"they at be this have from or had by but not what all " * 5
            + b"</p></body></html>")

    def gz(data: bytes) -> bytes:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(data) + co.flush()

    wrapped = gz(page)
    assert sniff_doc_type(wrapped) == "gzip"
    r = extract_document(wrapped)
    inner = extract_document(page)
    assert r["doc_type"] == "html" and r == inner
    # truncation salvage: torn trailer still yields the decoded prefix
    r2 = extract_document(wrapped[:-4])
    assert r2["doc_type"] == "html" and r2["extracted_text"]
    # garbage after the magic → error row, never a raise
    r3 = extract_document(b"\x1f\x8b\x08\x00junkjunkjunk")
    assert not r3["parse_ok"] and "gzip" in r3["error"]
    # nesting cap: triple-gzip stops at depth 2 with a precise error
    r4 = extract_document(gz(gz(gz(page))))
    assert not r4["parse_ok"] and "nesting too deep" in r4["error"]
    # double-gzip still resolves (depth 1 < cap)
    r5 = extract_document(gz(gz(page)))
    assert r5["doc_type"] == "html" and r5 == inner


def test_zstd_transport_inflates_and_reroutes():
    """M46 zstd twin: frame-magic payloads decode through pyarrow's
    bundled codec and the inner document extracts with its own
    doc_type; truncation salvages, garbage errors precisely."""
    import pyarrow as pa

    from text_extraction_ray.core.encoding import sniff_doc_type
    from text_extraction_ray.core.extract import extract_document

    page = (b"<html><body><p>zstd inner page "
            + b"the and of to in that it is was for on are as with " * 6
            + b"</p></body></html>")
    z = bytes(pa.Codec("zstd").compress(page))
    assert sniff_doc_type(z) == "zstd"
    r = extract_document(z)
    assert r["doc_type"] == "html" and r == extract_document(page)
    # garbage after the magic → precise error route
    r2 = extract_document(b"\x28\xb5\x2f\xfdjunkjunk")
    assert not r2["parse_ok"] and "zstd" in r2["error"]


def test_plain_text_route():
    """M49: printable utf-8 payloads route doc_type='text' and extract
    blank-line paragraphs under the shared byte conventions; random
    bytes and control-laden payloads stay unknown."""
    from text_extraction_ray.core.extract import extract_document

    txt = (b"First paragraph here.\n\n"
           b"Second paragraph after a blank line.\nStill second.\n\n"
           b"\xc3\xa9 third with accent.")
    assert sniff_doc_type(txt) == "text"
    r = extract_document(txt)
    assert r["doc_type"] == "text" and r["parse_ok"]
    assert r["n_blocks_kept"] == 3
    assert r["extracted_text"].split("\n\n")[1] == (
        "Second paragraph after a blank line. Still second.")
    for s, e in r["spans"]:
        assert r["extracted_text"][s:e]
    # conservative negatives
    assert sniff_doc_type(b"short") == "unknown"          # < 16 bytes
    assert sniff_doc_type(b"has a \x00 byte in the middle") == "unknown"
    assert sniff_doc_type(b"\xff\xfa not valid utf-8 here") == "unknown"
