"""M30: from-scratch CCITT Group 4 (ITU-T T.6 / MMR) codec.

The office-scanner codec: /Filter /CCITTFaxDecode with /K -1 is what
real scanned-document crawl PDFs carry.  Scan rasters in this corpus
are strictly binary (0/255), so the 1-bit G4 path must round-trip them
LOSSLESSLY — the OCR route reads back byte-identical grayscale.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.ccitt import decode_g4, encode_g4
from text_extraction_ray.core.pdf import extract_pdf, pdf_images
from text_extraction_ray.core.pdf_write import build_image_pdf
from text_extraction_ray.functions.table_image import (
    render_page_image,
    render_table_image,
)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**31 - 1), st.booleans())
def test_roundtrip_random_bitmaps(seed, byte_align):
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 24))
    w = int(rng.integers(1, 100))
    # mix dense noise and run-structured rows (the fax-typical shape)
    if seed % 2:
        img = (rng.random((h, w)) < 0.5).astype(np.uint8)
    else:
        img = (np.cumsum(rng.random((h, w)) < 0.1, axis=1) % 2
               ).astype(np.uint8)
    dec = decode_g4(encode_g4(img, byte_align=byte_align), w,
                    byte_align=byte_align, black_is_1=True)
    assert dec.shape == img.shape
    assert (dec == img).all()


def test_constant_and_long_run_makeup_codes():
    """All-white / all-black pages and runs past the 2560 make-up cap."""
    for img in (np.zeros((5, 3000), np.uint8), np.ones((5, 3000), np.uint8)):
        enc = encode_g4(img)
        assert (decode_g4(enc, 3000, black_is_1=True) == img).all()
        # fax compression must actually compress constant pages
        assert len(enc) < 100
    img = np.zeros((3, 6000), np.uint8)
    img[1, 7:5991] = 1                      # single 5984-px black run
    assert (decode_g4(encode_g4(img), 6000, black_is_1=True) == img).all()


def test_blackis1_sample_semantics():
    """Default /BlackIs1 false: 0 = black (DeviceGray-natural)."""
    img = np.array([[1, 0, 1, 1]], np.uint8)     # 1 = black pixel
    enc = encode_g4(img)
    assert (decode_g4(enc, 4) == [[0, 1, 0, 0]]).all()
    assert (decode_g4(enc, 4, black_is_1=True) == [[1, 0, 1, 1]]).all()


def test_rows_cap_stops_early():
    rng = np.random.default_rng(3)
    img = (rng.random((9, 33)) < 0.4).astype(np.uint8)
    dec = decode_g4(encode_g4(img), 33, rows=5, black_is_1=True)
    assert (dec == img[:5]).all()


def test_decode_total_on_junk():
    rng = np.random.default_rng(11)
    for junk in (b"", b"\xff" * 9, b"\x00" * 17, b"\x01",
                 bytes(rng.integers(0, 256, 64, dtype=np.uint8))):
        try:
            decode_g4(junk, 64)
        except ValueError:
            pass                                 # the only legal failure


def test_decode_hand_assembled_bitstream():
    """Decoder pinned against a bitstream assembled BY HAND from the
    T.4/T.6 spec tables (independent of the encoder): row 0001100000
    = H(white 3 -> 1000, black 2 -> 11), then V0 at the row end; second
    row identical to the first = V0, V0, V0; EOFB."""
    bits = ("001" "1000" "11" "1"            # row 1: H + runs, V0
            "1" "1" "1"                       # row 2: three V0s
            "000000000001" "000000000001")    # EOFB
    padded = bits + "0" * (-len(bits) % 8)
    data = bytes(int(padded[i:i + 8], 2) for i in range(0, len(padded), 8))
    dec = decode_g4(data, 10, black_is_1=True)
    want = np.array([[0, 0, 0, 1, 1, 0, 0, 0, 0, 0]] * 2, np.uint8)
    assert (dec == want).all()


def test_scan_rasters_roundtrip_losslessly():
    """Binary scan pages through binarize -> G4 -> decode -> gray are
    byte-identical to the source raster (the lossless contract the
    corpus writer relies on)."""
    for sid in (0, 42, 77):
        for fn in (render_table_image, render_page_image):
            w, h, gray = fn(sid)
            bits = (np.frombuffer(gray, np.uint8).reshape(h, w)
                    < 128).astype(np.uint8)
            samples = decode_g4(encode_g4(bits), w)
            assert (samples * np.uint8(255)).tobytes() == gray


def test_ccitt_pdf_extracts_identically_to_flate_twin():
    """End to end: G4 XObject and BI/ID/EI inline forms, byte-aligned
    or not, all extract byte-identically to the lossless flate twin."""
    imgs = [render_table_image(42), render_page_image(7)]
    ref = extract_pdf(build_image_pdf(imgs, image_filter="flate"))
    assert ref["extracted_text"]
    for filt in ("ccitt", "ccitt-ba"):
        for inline in (False, True):
            pdf = build_image_pdf(imgs, image_filter=filt, inline=inline)
            got = pdf_images(pdf)
            assert [(w, h, d) for w, h, d in got] == imgs, (filt, inline)
            assert extract_pdf(pdf) == ref, (filt, inline)


def test_ccitt_inside_encrypted_pdf():
    imgs = [render_table_image(3)]
    ref = extract_pdf(build_image_pdf(imgs, image_filter="flate"))
    for spec in ("rc4-128", "aes-128"):
        got = extract_pdf(build_image_pdf(imgs, image_filter="ccitt",
                                          encrypt=spec))
        assert got == ref, spec


def test_g3_k_nonnegative_keeps_raw_bytes():
    """/K >= 0 (G3) is out of scope: the raw entropy bytes must reach
    the caller unchanged so its error routing sees them."""
    pdf = build_image_pdf([render_table_image(5)], image_filter="ccitt")
    k0 = pdf.replace(b"/K -1", b"/K 0")
    (w, h, data), = pdf_images(k0)
    assert len(data) != w * h                    # still entropy-coded
