"""M42: JBIG2 (MQ generic region) codec + scanned-PDF route."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.jbig2 import (
    MQDecoder,
    MQEncoder,
    _new_cx,
    decode_generic_region,
    decode_jbig2_embedded,
    encode_generic_region,
    encode_jbig2_embedded,
)


def test_mq_roundtrip_random_streams():
    rng = np.random.default_rng(17)
    for _ in range(4):
        bits = rng.integers(0, 2, size=3000).tolist()
        ctxs = rng.integers(0, 32, size=3000).tolist()
        enc = MQEncoder()
        cxe = _new_cx(32)
        for b, c in zip(bits, ctxs):
            enc.encode(cxe, c, b)
        blob = enc.flush()
        dec = MQDecoder(blob)
        cxd = _new_cx(32)
        assert [dec.decode(cxd, c) for c in ctxs] == bits


def test_mq_skewed_and_constant_streams():
    """All-zero / all-one / highly-skewed inputs hit the Qe state walk
    and the 0xFF stuffing paths."""
    for p in (0.0, 1.0, 0.02, 0.98):
        rng = np.random.default_rng(int(p * 100) + 1)
        bits = (rng.random(4000) < p).astype(int).tolist()
        enc = MQEncoder()
        cxe = _new_cx(1)
        for b in bits:
            enc.encode(cxe, 0, b)
        dec = MQDecoder(enc.flush())
        cxd = _new_cx(1)
        assert [dec.decode(cxd, 0) for _ in bits] == bits


def test_generic_region_roundtrip_shapes():
    rng = np.random.default_rng(5)
    for (w, h) in [(1, 1), (13, 7), (64, 48), (100, 30), (3, 40)]:
        bm = (rng.random((h, w)) < 0.3).astype(np.uint8)
        assert (decode_generic_region(encode_generic_region(bm), w, h)
                == bm).all()


def test_embedded_segment_layer_roundtrip():
    rng = np.random.default_rng(9)
    bm = (rng.random((40, 90)) < 0.2).astype(np.uint8)
    got = decode_jbig2_embedded(encode_jbig2_embedded(bm))
    assert (got == bm).all()


def test_unsupported_segments_raise_value_error():
    bm = np.zeros((4, 4), np.uint8)
    emb = bytearray(encode_jbig2_embedded(bm))
    # flip the region segment's type (offset: second segment header,
    # byte 4 = flags) to 4 (intermediate text region)
    second = 11 + 19   # first header (11) + page-info payload (19)
    assert emb[second + 4] & 0x3F == 39
    emb[second + 4] = (emb[second + 4] & 0xC0) | 4
    with pytest.raises(ValueError):
        decode_jbig2_embedded(bytes(emb))
    with pytest.raises(ValueError):
        decode_jbig2_embedded(b"\x00\x00")   # truncated header is fine →
    # (yields nothing → no page info)


def test_scanned_pdf_jbig2_extracts_identically_to_flate():
    """The flagship scanned-document route (cell-grid + page OCR) must
    read a JBIG2-compressed scan byte-identically to its flate twin —
    scan rasters are 0/255 so binarize→JBIG2 is lossless."""
    from text_extraction_ray.core.pdf import extract_pdf, pdf_images
    from text_extraction_ray.core.pdf_write import build_image_pdf
    from text_extraction_ray.functions.table_image import (
        render_page_image,
        render_table_image,
    )

    for sid in (0, 7):
        for fn in (render_table_image, render_page_image):
            imgs = [fn(sid)]
            ref = extract_pdf(build_image_pdf(imgs, image_filter="flate"))
            assert ref["extracted_text"]
            for enc in (False, "rc4-128"):
                got = extract_pdf(build_image_pdf(
                    imgs, image_filter="jbig2", encrypt=enc))
                assert got == ref, (sid, fn.__name__, enc)
    # raster-level: decoded bytes identical
    w, h, gray = render_table_image(3)
    blob = build_image_pdf([(w, h, gray)], image_filter="jbig2")
    assert pdf_images(blob)[0] == (w, h, gray)


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_generic_region_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    bm = (rng.random((h, w)) < rng.random()).astype(np.uint8)
    assert (decode_generic_region(encode_generic_region(bm), w, h)
            == bm).all()
