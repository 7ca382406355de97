"""M10h: inline images (BI/ID/EI) in PDF content streams."""

from text_extraction_ray.core.pdf import (
    extract_pdf,
    pdf_images,
    pdf_tables,
    split_inline_images,
)
from text_extraction_ray.core.pdf_write import build_image_pdf
from text_extraction_ray.functions.table_image import (
    render_page_image,
    render_table_image,
)


def test_inline_image_extracts_identically_to_xobject():
    """The same scan embedded BI/ID/EI must extract byte-identically to
    its XObject twin, across flate / dct / raw encodings."""
    for sid in (0, 7, 23):
        for fn in (render_table_image, render_page_image):
            imgs = [fn(sid)]
            ref = extract_pdf(build_image_pdf(imgs, image_filter="flate"))
            assert ref["extracted_text"]
            for f in ("flate", "dct", "raw"):
                got = extract_pdf(build_image_pdf(imgs, image_filter=f,
                                                  inline=True))
                assert got == ref, (sid, f)
        grids = pdf_tables(build_image_pdf([render_table_image(sid)],
                                           image_filter="flate",
                                           inline=True))
        assert grids and all("\t" in g for g in grids)


def test_inline_image_multi_page_order():
    imgs = [render_table_image(1), render_table_image(4)]
    ref = pdf_images(build_image_pdf(imgs, image_filter="flate"))
    got = pdf_images(build_image_pdf(imgs, image_filter="flate",
                                     inline=True))
    assert [(w, h) for w, h, _ in got] == [(w, h) for w, h, _ in ref]
    assert [d for *_, d in got] == [d for *_, d in ref]


def test_inline_data_never_read_as_text_operators():
    """Entropy bytes containing valid-looking show operators must not
    fabricate text: the interpreter blanks BI..EI spans."""
    evil = b"BT /F1 12 Tf (EVIL) Tj ET"
    stream = (b"q BI /W 5 /H 5 /BPC 8 /CS /G /L %d ID\n" % len(evil)
              + evil + b"\nEI Q BT /F1 12 Tf (ok) Tj ET")
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
           b"endobj\n"
           b"4 0 obj\n<< /Length " + str(len(stream)).encode()
           + b" >>\nstream\n" + stream + b"\nendstream\nendobj\n%%EOF")
    res = extract_pdf(pdf)
    assert "EVIL" not in res["extracted_text"]
    assert "ok" in res["extracted_text"]


def test_split_inline_raw_length_from_dims():
    """No /F and no /L: the data extent is ceil(W*BPC/8)*H bytes."""
    data = bytes(range(25))
    stream = (b"q BI /W 5 /H 5 /BPC 8 /CS /G ID\n" + data
              + b"\nEI Q BT ET")
    clean, imgs = split_inline_images(stream)
    assert len(imgs) == 1
    hdr, raw = imgs[0]
    assert b"/Width 5" in hdr and b"/Height 5" in hdr
    assert raw == data
    assert b"BI" not in clean and b"BT ET" in clean
    assert len(clean) == len(stream)


def test_split_inline_totality_on_garbage():
    for stream in (b"BI", b"q BI /W 5", b"q BI /W 5 /H 5 ID",
                   b"q BI /W 5 /H 5 /F /Fl ID\n\xff\xfe no terminator",
                   b"q BI /W 999999 /H 999999 /L 999999999 ID\nxx\nEI Q",
                   b"ID EI BI ID EI", b"\x00\xffBI\xfe"):
        clean, imgs = split_inline_images(stream)
        assert isinstance(clean, bytes) and isinstance(imgs, list)
        assert len(clean) == len(stream)
    # and through the full extractor: never raises
    bad = build_image_pdf([render_table_image(2)], image_filter="flate",
                          inline=True).replace(b"EI", b"XX", 1)
    assert isinstance(extract_pdf(bad), dict)


def test_inline_image_under_encryption():
    """Inline data lives INSIDE the content stream, so the standard
    security handler encrypts it along with the operators; decrypt →
    split → filter chain must round-trip to the plaintext twin."""
    imgs = [render_table_image(5)]
    ref = extract_pdf(build_image_pdf(imgs, image_filter="flate",
                                      inline=True))
    assert ref["extracted_text"]
    for enc in ("rc4-128", "aes-128"):
        got = extract_pdf(build_image_pdf(imgs, image_filter="flate",
                                          inline=True, encrypt=enc))
        assert got == ref, enc


def test_split_no_bi_is_noop():
    s = b"BT /F1 12 Tf (BIG IDEAS) Tj ET"   # 'BI'/'ID' inside words
    clean, imgs = split_inline_images(s)
    assert clean == s and imgs == []


def test_bi_inside_string_literal_never_blanks_text():
    """ADVICE r4: 'BI' matched inside a string literal ('(foo) BI (bar)
    Tj') must not be treated as an image — the header-validation guard
    skips it, so no legitimate operators are blanked."""
    stream = b"BT (alpha) Tj (x) BI (bravo) Tj (charlie) Tj ET"
    out, imgs = split_inline_images(stream)
    assert out == stream
    assert imgs == []


def test_false_bi_before_real_inline_image():
    """A false BI whose ID search lands on a REAL later image must be
    skipped (invalid header) while the real image still parses."""
    real = (b"BI /Width 2 /Height 1 /BitsPerComponent 8"
            b" /ColorSpace /DeviceGray ID \x10\x20 EI")
    stream = (b"BT (delta) BI (echo) Tj ET q " + real +
              b" Q BT (foxtrot) Tj ET")
    out, imgs = split_inline_images(stream)
    assert len(imgs) == 1
    assert imgs[0][1] == b"\x10\x20"
    assert b"(delta)" in out and b"(echo)" in out and b"(foxtrot)" in out
    assert b"/Width 2" not in out  # the real image span is blanked
