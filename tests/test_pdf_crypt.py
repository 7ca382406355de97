"""PDF standard security handler (core/pdf_crypt.py, round 4 M10f):
RC4 against its public test vectors, spec-algorithm self-consistency,
end-to-end extract parity of encrypted vs plaintext fixtures across
filter/encoding combinations, scanned-image PDFs, and graceful refusal
(tampered /U, password-protected, AES/V4) — the extractor must stay
total and never emit RC4 noise as text."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core import pdf_crypt as pc
from text_extraction_ray.core.pdf import extract_pdf, pdf_images, pdf_tables
from text_extraction_ray.core.pdf_write import (
    PageBuilder,
    build_image_pdf,
    build_pdf,
    make_cid_map,
    make_code_map,
)


# --- RC4 kernel -----------------------------------------------------------

def test_rc4_public_vectors():
    # the three canonical published RC4 vectors
    assert pc.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert pc.rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert pc.rc4(b"Secret", b"Attack at dawn").hex() == \
        "45a01f645fc35b383552544b9bf5"


@given(st.binary(min_size=1, max_size=16), st.binary(max_size=2048))
@settings(max_examples=60, deadline=None)
def test_rc4_symmetric(key, data):
    assert pc.rc4(key, pc.rc4(key, data)) == data


def test_object_key_truncation():
    # RC4-40: 5-byte file key -> 10-byte object key; RC4-128 caps at 16
    assert len(pc.object_key(b"\x01" * 5, 7)) == 10
    assert len(pc.object_key(b"\x01" * 16, 7)) == 16


# --- end-to-end parity ----------------------------------------------------

def _page(tag=""):
    pb = PageBuilder()
    pb.text_lines([f"Encrypted fixture{tag} line one with real words.",
                   "Second line keeps the paragraph together."])
    pb.table([["alpha", "beta"], ["gamma", "delta"]])
    return pb


@pytest.mark.parametrize("enc", ["rc4-40", "rc4-128", "aes-128", True])
@pytest.mark.parametrize("comp", [False, True, "lzw", "a85+flate"])
def test_extract_parity_encrypted_vs_plain(enc, comp):
    plain = extract_pdf(build_pdf([_page()], compress=comp))
    got = extract_pdf(build_pdf([_page()], compress=comp, encrypt=enc))
    assert got["extracted_text"] == plain["extracted_text"]
    assert got["extracted_text"]
    assert got["spans"] == plain["spans"]
    assert pdf_tables(build_pdf([_page()], compress=comp, encrypt=enc)) \
        == pdf_tables(build_pdf([_page()], compress=comp))


def test_aes_stream_layout():
    """/AESV2 streams are IV-prefixed CBC with PKCS#7: the written
    stream length is 16 (IV) + padded size, and the header /Length
    was rewritten to the ciphertext size."""
    import re

    payload = build_pdf([_page()], encrypt="aes-128")
    assert b"/AESV2" in payload and b"/StmF /StdCF" in payload
    m = re.search(rb"/Length (\d+) >>\nstream\n", payload)
    declared = int(m.group(1))
    assert declared % 16 == 0 and declared >= 32  # IV + >=1 block


@pytest.mark.parametrize("style,maker", [
    ("tounicode", make_code_map), ("cid", make_cid_map)])
def test_encrypted_unicode_fonts(style, maker):
    """The ToUnicode CMap is itself a stream — its decryption is what
    makes non-ASCII text survive; a cipher CMap would mojibake."""
    lines = ["Grüße aus dem verschlüsselten Dokument.",
             "日本語の暗号化された段落です。"]
    cmap = maker(lines)
    pb = PageBuilder()
    if style == "cid":
        pb.text_lines_cid(lines, cmap)
    else:
        pb.text_lines_encoded(lines, cmap)
    plain = build_pdf([pb], code_map=cmap, encoding_style=style)
    pb2 = PageBuilder()
    if style == "cid":
        pb2.text_lines_cid(lines, cmap)
    else:
        pb2.text_lines_encoded(lines, cmap)
    enc = build_pdf([pb2], code_map=cmap, encoding_style=style,
                    encrypt="rc4-128")
    assert extract_pdf(enc)["extracted_text"] == \
        extract_pdf(plain)["extracted_text"]
    assert lines[0] in extract_pdf(enc)["extracted_text"]


@pytest.mark.parametrize("enc", ["rc4-128", "aes-128"])
@pytest.mark.parametrize("img_filter", ["flate", "dct"])
def test_encrypted_scanned_pdf(img_filter, enc):
    rng = np.random.default_rng(11)
    gray = rng.integers(200, 256, size=(64, 96), dtype=np.uint8).tobytes()
    plain = build_image_pdf([(96, 64, gray)], image_filter=img_filter)
    got = build_image_pdf([(96, 64, gray)], image_filter=img_filter,
                          encrypt=enc)
    assert pdf_images(got) == pdf_images(plain) != []


@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           blacklist_characters="\\()"),
    min_size=1, max_size=40), min_size=1, max_size=5))
@settings(max_examples=25, deadline=None)
def test_encrypted_roundtrip_hypothesis(lines):
    pb1, pb2 = PageBuilder(), PageBuilder()
    pb1.text_lines(lines)
    pb2.text_lines(lines)
    assert extract_pdf(build_pdf([pb2], encrypt="rc4-128")
                       )["extracted_text"] == \
        extract_pdf(build_pdf([pb1]))["extracted_text"]


# --- refusal paths --------------------------------------------------------

def test_tampered_u_refused():
    """Wrong /U means a real user password is required: the decryptor
    must refuse (None) and extraction must not crash or emit noise."""
    payload = bytearray(build_pdf([_page()], encrypt="rc4-128"))
    i = payload.find(b"/U <")
    payload[i + 4:i + 12] = b"00000000"
    assert pc.build_decryptor(bytes(payload)) is None
    res = extract_pdf(bytes(payload))
    assert res["extracted_text"] == ""  # cipher never surfaces as text


def test_unsupported_v4_variants_refused():
    """V4 with a non-StdCF stream filter, EncryptMetadata false, a
    crypt-filter method outside {AESV2, V2}, or AESV3/R5+ must all
    refuse — only the exact supported envelope decrypts."""
    aes_pdf = build_pdf([_page()], encrypt="aes-128")
    assert pc.build_decryptor(aes_pdf) is not None
    assert pc.build_decryptor(
        aes_pdf.replace(b"/StmF /StdCF", b"/StmF /Other")) is None
    assert pc.build_decryptor(
        aes_pdf.replace(b"/P -4", b"/EncryptMetadata false /P -4")) is None
    assert pc.build_decryptor(
        aes_pdf.replace(b"/AESV2", b"/AESV3")) is None
    rc4_pdf = build_pdf([_page()], encrypt="rc4-128")
    assert pc.build_decryptor(
        rc4_pdf.replace(b"/V 2 /R 3", b"/V 5 /R 6")) is None


def test_tampered_aes_stream_totality():
    """Bit-flipped AES ciphertext must still extract without raising
    (CBC decrypt of garbage -> filter salvage -> empty/partial text)."""
    payload = bytearray(build_pdf([_page()], compress=True,
                                  encrypt="aes-128"))
    i = payload.find(b"\nstream\n") + 8 + 20
    payload[i] ^= 0xFF
    res = extract_pdf(bytes(payload))
    assert isinstance(res["extracted_text"], str)


def test_unencrypted_passthrough():
    assert pc.build_decryptor(build_pdf([_page()])) is None


def test_real_password_file_refused():
    """A file keyed to a NON-empty user password: /U won't verify
    against the empty password, so the decryptor refuses."""
    from text_extraction_ray.core.pdf_write import _assemble_pdf

    # hand-build with a non-empty user password
    o = pc.owner_value(b"owner-secret", b"user-secret", 3, 16)
    fkey = pc.file_key(o, -4, b"\x01" * 16, 3, 16, user_pw=b"user-secret")
    u = pc.user_value(fkey, b"\x01" * 16, 3)
    body = (f"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -4 "
            f"/O <{o.hex()}> /U <{u.hex()}> >>").encode()
    doc = (b"%PDF-1.4\n1 0 obj\n" + body + b"\nendobj\ntrailer\n"
           b"<< /Size 2 /Root 1 0 R /Encrypt 1 0 R /ID [<"
           + b"01" * 16 + b"> <" + b"01" * 16 + b">] >>\n%%EOF\n")
    assert pc.build_decryptor(doc) is None


# --- R6 / AES-256 (PDF 2.0, /AESV3) ---------------------------------
# Kept OUT of the corpus/parity cycle: Algorithm 2.B costs ~0.2 s per
# call in pure Python (64+ AES-CBC rounds), so R6 is a tested decode
# capability, not a bulk fixture arm — each case below is one file.

def test_aes256_roundtrip():
    plain = extract_pdf(build_pdf([_page()], compress=True))
    enc_pdf = build_pdf([_page()], compress=True, encrypt="aes-256")
    assert b"/AESV3" in enc_pdf and b"/UE <" in enc_pdf \
        and b"/Perms <" in enc_pdf
    got = extract_pdf(enc_pdf)
    assert got["extracted_text"] == plain["extracted_text"]
    assert got["extracted_text"]
    assert got["spans"] == plain["spans"]


def test_aes256_tampered_u_refused():
    payload = bytearray(build_pdf([_page()], encrypt="aes-256"))
    i = payload.find(b"/U <")
    payload[i + 4:i + 12] = b"00000000"
    assert pc.build_decryptor(bytes(payload)) is None
    assert extract_pdf(bytes(payload))["extracted_text"] == ""


def test_hash_2b_properties():
    a = pc.hash_2b(b"", b"saltsalt")
    assert len(a) == 32 and a == pc.hash_2b(b"", b"saltsalt")
    assert a != pc.hash_2b(b"", b"SALTSALT")
    assert pc.hash_2b(b"pw", b"saltsalt") != a
    assert pc.hash_2b(b"", b"saltsalt", b"udata") != a


def test_literal_string_o_u_accepted():
    """Real writers often emit /O and /U as literal (escaped) strings;
    the parser must read those too, not just hex."""
    payload = build_pdf([_page()], encrypt="rc4-40")
    # recover the hex forms and re-emit as literal strings
    import re

    m = re.search(rb"/O <([0-9a-f]+)> /U <([0-9a-f]+)>", payload)
    o_raw = bytes.fromhex(m.group(1).decode())
    u_raw = bytes.fromhex(m.group(2).decode())

    def lit(b: bytes) -> bytes:
        out = bytearray()
        for c in b:
            if c in (0x28, 0x29, 0x5C):
                out += b"\\" + bytes([c])
            elif 32 <= c < 127:
                out.append(c)
            else:
                out += ("\\%03o" % c).encode()
        return bytes(out)

    swapped = payload[:m.start()] + b"/O (" + lit(o_raw) + b") /U (" \
        + lit(u_raw) + b")" + payload[m.end():]
    assert extract_pdf(swapped)["extracted_text"] == \
        extract_pdf(build_pdf([_page()]))["extracted_text"]
