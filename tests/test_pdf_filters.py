"""PDF stream filters beyond Flate (core/pdf_filters.py, round 4):
unit roundtrips for LZW/ASCII85/ASCIIHex/RunLength (incl. the LZW
width-boundary and table-reset paths), an independent cross-check of
ASCII85 against the stdlib's Adobe variant, end-to-end byte identity of
every writer spec through core/pdf.py, predictor decode, and
error-routing tolerance on malformed filter data."""

import os
import random
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core import pdf_filters as pf
from text_extraction_ray.core.pdf import extract_pdf
from text_extraction_ray.core.pdf_write import PageBuilder, build_pdf

CASES = [
    b"",
    b"a",
    b"ababababab" * 50,
    bytes(range(256)) * 40,
    os.urandom(5000),
    b"x" * 10000,
    bytes(random.Random(7).randrange(4) for _ in range(30000)),
]


@pytest.mark.parametrize("codec", ["lzw", "a85", "ahx", "rl"])
def test_unit_roundtrips(codec):
    enc = getattr(pf, f"{codec}_encode")
    dec = getattr(pf, f"{codec}_decode")
    for d in CASES:
        assert dec(enc(d)) == d


@given(st.binary(max_size=4096))
@settings(max_examples=80, deadline=None)
def test_lzw_roundtrip_hypothesis(d):
    assert pf.lzw_decode(pf.lzw_encode(d)) == d


def test_lzw_crosses_width_boundaries_and_resets():
    """Low-entropy data forces >4095 table entries (reset path) and
    every 9->10->11->12 width transition; the decoder's EarlyChange-1
    widen rule must stay in sync with the encoder's one-later rule."""
    rnd = random.Random(3)
    d = bytes(rnd.randrange(3) for _ in range(200_000))
    enc = pf.lzw_encode(d)
    assert pf.lzw_decode(enc) == d
    assert len(enc) < len(d)                     # it actually compresses


def test_a85_cross_check_against_stdlib():
    """Our ASCII85 must interoperate with an INDEPENDENT implementation
    (stdlib base64, Adobe variant) in both directions."""
    import base64

    for d in CASES:
        assert pf.a85_decode(base64.a85encode(d, adobe=True)) == d
        assert base64.a85decode(b"<~" + pf.a85_encode(d), adobe=True) == d


def test_rl_known_forms():
    assert pf.rl_decode(bytes([2]) + b"abc" + bytes([128])) == b"abc"
    assert pf.rl_decode(bytes([254]) + b"z" + bytes([128])) == b"z" * 3
    assert pf.ahx_decode(b"48 65 6c 6C 6f>") == b"Hello"
    assert pf.ahx_decode(b"486>") == b"H`"      # odd length pads 0


def _mk(compress):
    pb = PageBuilder()
    pb.text_lines(["Hello filter world, a paragraph of page text.",
                   "Second line with more content for the stream."])
    pb.table([["a", "b"], ["c", "d"]])
    return build_pdf([pb], compress=compress)


SPECS = [True, "flate", "lzw", "a85", "ahx", "rl",
         "a85+flate", "ahx+lzw", "rl+flate", "a85+lzw", "flate-pred"]


@pytest.mark.parametrize("spec", SPECS)
def test_every_writer_spec_extracts_byte_identically(spec):
    plain = extract_pdf(_mk(False))
    assert plain["extracted_text"]
    assert extract_pdf(_mk(spec)) == plain


def test_predictor_roundtrip_all_filter_types():
    """flate-pred cycles PNG row filters 0-4; the decode side reuses
    the raster unfilter and must invert every type exactly."""
    data = bytes((i * 37 + (i >> 3)) & 0xFF for i in range(1000))
    body, entry = pf.encode_stream(data, "flate-pred")
    header = b"<< /Length 0" + entry + b" >>"
    got = pf.apply_stream_filters(header, body)
    assert got[: len(data)] == data
    assert set(got[len(data):]) <= {0x20}        # space padding only


def test_malformed_filter_data_is_total():
    """The extraction contract: garbage behind a /Filter entry either
    decodes to SOME bytes (RunLength/Hex accept much junk by design)
    or yields b'' (error-routed) — never an exception."""
    rnd = random.Random(9)
    for name in (b"/LZWDecode", b"/ASCII85Decode", b"/ASCIIHexDecode",
                 b"/RunLengthDecode", b"/FlateDecode",
                 b"[/ASCII85Decode /FlateDecode]"):
        header = b"<< /Length 64 /Filter " + name + b" >>"
        for junk in (b"\xff\xfe\xfd" * 20, b"",
                     bytes(rnd.randrange(256) for _ in range(64))):
            out = pf.apply_stream_filters(header, junk)
            assert isinstance(out, bytes)
    # zlib junk must take the error route specifically
    assert pf.apply_stream_filters(
        b"<< /Filter /FlateDecode >>", b"\x00garbage") == b""
    assert pf.apply_stream_filters(b"<< /Filter /NoSuchFilter >>",
                                   b"abc") == b""


def test_image_codecs_end_the_chain_with_raw_bytes():
    jpeg_ish = b"\xff\xd8\xff\xe0" + os.urandom(32)
    hdr = b"<< /Filter [/ASCII85Decode /DCTDecode] >>"
    wrapped = pf.a85_encode(jpeg_ish)
    assert pf.apply_stream_filters(hdr, wrapped) == jpeg_ish


def test_flate_without_filter_entry_still_inflates():
    """Pre-round-4 tolerance in _parse_objects: /FlateDecode named
    outside a /Filter key (malformed but seen in the wild)."""
    from text_extraction_ray.core.pdf import _parse_objects

    content = b"BT /F1 11 Tf 50 700 Td (hi) Tj ET"
    data = zlib.compress(content)
    raw = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(data)).encode()
           + b" /FlateDecode >>\nstream\n" + data
           + b"\nendstream\nendobj\ntrailer\n")
    objs = _parse_objects(raw)
    assert objs[1][1] == content
