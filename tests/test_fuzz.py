"""Seeded fuzz: extract_document is TOTAL — arbitrary bytes never raise,
always yield a schema-complete result (SURVEY M11)."""

from __future__ import annotations

import random

from text_extraction_ray.core.extract import extract_document

KEYS = {"doc_type", "lang", "charset", "extracted_text", "spans",
        "n_blocks_kept", "n_blocks_dropped", "parse_ok", "error"}


def _payloads(seed: int, n: int):
    rng = random.Random(seed)
    tricky_prefixes = [b"", b"%PDF-", b"<html", b"<!DOCT", b"\xef\xbb\xbf",
                       b"\xff\xfe", b"<script>", b"WARC/1.0"]
    mb_bodies = ["日本語 テスト".encode("shift_jis"),
                 "中文 测试".encode("gb2312"),
                 "русский текст".encode("koi8-r"),
                 "한국어 문서".encode("euc-kr")]
    for i in range(n):
        kind = i % 6
        if kind == 0:  # pure random bytes
            yield rng.randbytes(rng.randrange(0, 2048))
        elif kind == 1:  # random bytes with a meaningful prefix
            yield (rng.choice(tricky_prefixes)
                   + rng.randbytes(rng.randrange(0, 512)))
        elif kind == 2:  # mangled html: valid-ish tags, truncated anywhere
            html = (b"<html><head><meta charset=utf-8><script>var x='<p>';"
                    b"</script></head><body>" +
                    b"".join(b"<p>word %d &amp; &#x41; <a href=x>l</a></p>"
                             % j for j in range(20)) + b"</body></html>")
            yield html[: rng.randrange(1, len(html))]
        elif kind == 3:  # mangled pdf
            pdf = (b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"
                   b"stream\nBT (hi) Tj ET\nendstream\ntrailer\n%%EOF")
            yield pdf[: rng.randrange(1, len(pdf))]
        elif kind == 4:  # round 2: multi-byte charset pages, truncated
            cs = rng.choice([b"shift_jis", b"gb2312", b"koi8-r", b"euc-kr",
                             b"cp1251", b"x-bogus", b"rot13", b"utf-16le"])
            page = (b'<html><head><meta charset="' + cs + b'"></head><body>'
                    + rng.choice(mb_bodies) * rng.randrange(1, 5)
                    + b"</body></html>")
            yield page[: rng.randrange(1, len(page) + 1)]
        else:  # round 2: pdf robustness structures, mangled
            bits = [b"/Length 5 0 R", b"/Type /ObjStm /N 3 /First 12",
                    b"/Type /XRef", b"stream\nBT(x)Tj ET\nendstream",
                    b"1 0 obj 42 endobj"]
            pdf = (b"%PDF-1.5\n"
                   + b"\n".join(rng.choice(bits)
                                for _ in range(rng.randrange(1, 8))))
            yield pdf[: rng.randrange(1, len(pdf) + 1)]


def test_fuzz_total_function():
    for payload in _payloads(1234, 400):
        r = extract_document(payload, "en")
        assert KEYS <= set(r)
        assert isinstance(r["extracted_text"], str)
        assert r["doc_type"] in ("html", "pdf", "empty", "unknown")
        # spans must be consistent with the text
        for s, e in r["spans"]:
            assert 0 <= s <= e <= len(r["extracted_text"])


def test_fuzz_determinism():
    pays = list(_payloads(99, 120))
    a = [extract_document(p, "").get("extracted_text") for p in pays]
    b = [extract_document(p, "").get("extracted_text") for p in pays]
    assert a == b


def test_fuzz_wav_decode_total():
    """decode_wav must raise ValueError (never crash, hang, or return
    garbage silently) on arbitrary bytes, truncations of real containers,
    and bit-flipped headers."""
    import random

    import numpy as np

    from text_extraction_ray.core.wav import decode_wav, encode_wav

    rng = random.Random(7)
    x = (np.sin(np.arange(500) * 0.1) * 15000).astype(np.int16)
    real = encode_wav(x, 8000)
    cases = []
    for _ in range(150):
        cases.append(bytes(rng.randrange(256)
                           for _ in range(rng.randrange(0, 128))))
    for _ in range(100):
        cases.append(real[: rng.randrange(0, len(real))])
    for _ in range(100):
        b = bytearray(real)
        for _f in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        cases.append(bytes(b))
    ok = err = 0
    for payload in cases:
        try:
            sr, ch, samples = decode_wav(payload)
            assert sr >= 0 and ch in (1, 2)
            ok += 1
        except ValueError:
            err += 1
    assert ok + err == len(cases)
    assert err > 0  # the corpus genuinely exercises the error paths


def test_fuzz_pdf_font_maps_total():
    """_font_maps/_parse_tounicode/_parse_differences must never raise on
    arbitrary object soup — fonts simply get no map."""
    import random

    from text_extraction_ray.core.pdf import (
        _parse_differences,
        _parse_objects,
        _parse_tounicode,
        _font_maps,
    )

    rng = random.Random(11)
    frags = [b"/Font << /F1 5 0 R >>", b"/ToUnicode 9 0 R",
             b"/Differences [ 128 /uniZZZZ /x 300 /eacute ]",
             b"beginbfchar <zz> <110000> endbfchar",
             b"beginbfrange <00> <ff> [<41>] endbfrange",
             b"<< /Encoding 7 0 R >>", b"5 0 obj << >> endobj"]
    for _ in range(200):
        soup = b" ".join(rng.choice(frags)
                         for _ in range(rng.randrange(1, 6)))
        soup += bytes(rng.randrange(256) for _ in range(rng.randrange(32)))
        _parse_tounicode(soup)
        _parse_differences(soup)
        _font_maps(_parse_objects(soup))


def test_fuzz_cfb_office_total():
    """Truncations and bit-flips of real CFB .doc/.xls/.ppt containers
    never raise through extract_document — they route to parse_ok=False
    rows or degrade, schema-complete either way."""
    import numpy as np

    from text_extraction_ray.core.doc_legacy import build_doc
    from text_extraction_ray.core.ppt_legacy import build_ppt
    from text_extraction_ray.core.xls_legacy import build_xls

    rng = random.Random(77)
    blobs = [
        build_doc(["fuzz doc paragraph one.", "two"], split_pieces=True),
        build_xls([("S", [["a", 1, True], ["b", 2.5, False]])]),
        build_ppt([["slide", "line"]]),
    ]
    for blob in blobs:
        for _ in range(40):
            data = bytearray(blob)
            mode = rng.randrange(3)
            if mode == 0:
                data = data[:rng.randrange(1, len(data))]
            elif mode == 1:
                for _k in range(rng.randrange(1, 6)):
                    data[rng.randrange(len(data))] = rng.randrange(256)
            else:
                data = data[:rng.randrange(1, len(data))]
                for _k in range(rng.randrange(1, 4)):
                    if data:
                        data[rng.randrange(len(data))] = rng.randrange(256)
            r = extract_document(bytes(data), "en")
            assert KEYS <= set(r)
            assert isinstance(r["extracted_text"], str)
            np.testing.assert_equal(isinstance(r["parse_ok"], bool), True)


def test_fuzz_jbig2_embedded_total():
    """Truncations and bit-flips of a real embedded-JBIG2 stream either
    decode to a bitmap or raise ValueError — never any other exception,
    never a hang (the dimension guard bounds work)."""
    import numpy as np

    from text_extraction_ray.core.jbig2 import (decode_jbig2_embedded,
                                                encode_jbig2_embedded)

    rng = random.Random(99)
    bm = (np.arange(24 * 16).reshape(24, 16) % 7 < 2).astype(np.uint8)
    blob = encode_jbig2_embedded(bm)
    got = decode_jbig2_embedded(blob)
    assert np.array_equal(got[0] if isinstance(got, tuple) else got, bm)
    for _ in range(120):
        data = bytearray(blob)
        mode = rng.randrange(3)
        if mode == 0:
            data = data[:rng.randrange(1, len(data))]
        elif mode == 1:
            for _k in range(rng.randrange(1, 8)):
                data[rng.randrange(len(data))] = rng.randrange(256)
        else:
            data = bytearray(rng.randbytes(rng.randrange(0, 256)))
        try:
            out = decode_jbig2_embedded(bytes(data))
        except ValueError:
            continue
        arr = out[0] if isinstance(out, tuple) else out
        assert arr.dtype == np.uint8


def test_fuzz_warc_content_codings_total():
    """Arbitrary bytes under every Content-Encoding header parse without
    raising: either decoded, prefix-salvaged, or flagged — and flagged
    bodies are returned losslessly."""
    from text_extraction_ray.sources.warc import (_CRLF, _warc_record,
                                                  parse_warc)

    rng = random.Random(7)
    TSF = __import__("datetime").datetime(2025, 1, 2, 3, 4, 5)
    for enc in (b"gzip", b"deflate", b"br", b"zstd",
                b"compress", b"weirdddd"):
        for _ in range(25):
            body = rng.randbytes(rng.randrange(0, 512))
            rec = _warc_record("https://f.example/x", TSF, body,
                               http_encoding="compress")
            # pad with spaces (stripped by the header parser) so the
            # WARC Content-Length stays valid and the token is exact
            pad = b" " * (8 - len(enc))
            rec = rec.replace(b"Content-Encoding: compress" + _CRLF,
                              b"Content-Encoding: " + enc + pad + _CRLF)
            got = list(parse_warc(rec))
            assert len(got) == 1
            u, _ts, b, e = got[0]
            assert u == "https://f.example/x"
            assert isinstance(b, bytes) and isinstance(e, str)
            if e:  # flagged: bytes kept losslessly
                assert b == body


def test_fuzz_round5_containers_total():
    """Truncations and bit-flips of real EPUB / MHTML / ODS / ODP / TAR
    / gzip payloads never raise through extract_document — they route
    to error rows or degrade, schema-complete either way (M44-M49)."""
    import zlib

    from text_extraction_ray.core.epub import build_epub
    from text_extraction_ray.core.mhtml import build_mhtml
    from text_extraction_ray.core.ods_odp import build_odp, build_ods

    rng = random.Random(505)
    page = (b"<html><body><p>fuzz page "
            + b"the and of to in that it is was for " * 6
            + b"</p></body></html>")
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    blobs = [
        build_epub([("T", ["one & two", "three"]), ("U", ["four"])]),
        build_mhtml(page, cte="quoted-printable"),
        build_mhtml(page, cte="base64", start=True,
                    extra_parts=[("image/png", b"\x89PNGxx")]),
        build_ods([("S", [["a", 1, True], [None, "b"]])]),
        build_odp([["slide", "line"]], with_notes=True),
        co.compress(page) + co.flush(),
    ]
    for blob in blobs:
        for _ in range(40):
            data = bytearray(blob)
            mode = rng.randrange(3)
            if mode == 0:
                data = data[:rng.randrange(1, len(data))]
            elif mode == 1:
                for _k in range(rng.randrange(1, 6)):
                    data[rng.randrange(len(data))] = rng.randrange(256)
            else:
                data = data[:rng.randrange(1, len(data))]
                for _k in range(rng.randrange(1, 4)):
                    if data:
                        data[rng.randrange(len(data))] = rng.randrange(256)
            r = extract_document(bytes(data), "en")
            assert KEYS <= set(r)
            assert isinstance(r["extracted_text"], str)
            assert isinstance(r["parse_ok"], bool)


def test_fuzz_tar_source_total():
    """Mutated tarballs through tar_to_pages always yield a PAGES-shaped
    table (possibly empty) — never an exception (S22)."""
    from text_extraction_ray.sources.tar import tar_to_pages, write_tar

    rng = random.Random(606)
    blob = write_tar([("a/b.txt", 1_700_000_000, b"x" * 700),
                      ("c.txt", 1_700_000_001, b"y" * 10)])
    gz = write_tar([("d.txt", 0, b"z")], gzip_out=True)
    for base in (blob, gz):
        for _ in range(60):
            data = bytearray(base)
            if rng.random() < 0.5:
                data = data[:rng.randrange(1, len(data))]
            for _k in range(rng.randrange(0, 8)):
                if data:
                    data[rng.randrange(len(data))] = rng.randrange(256)
            tbl = tar_to_pages("f.tar" if base is blob else "f.tar.gz",
                               bytes(data))
            assert tbl.schema.names == ["url", "warc_ts", "html", "lang"]
