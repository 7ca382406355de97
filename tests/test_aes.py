"""From-scratch AES (core/aes.py, round 4 M10g support): FIPS-197
appendix C block vectors for all three key sizes, NIST SP 800-38A CBC
vectors, PKCS#7 padding behavior, malformed-input totality, and
hypothesis roundtrips — the generated S-box/T-tables must agree with
the published standard exactly."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core import aes

PT = bytes.fromhex("00112233445566778899aabbccddeeff")
FIPS = [
    ("000102030405060708090a0b0c0d0e0f",
     "69c4e0d86a7b0430d8cdb78070b4c55a"),
    ("000102030405060708090a0b0c0d0e0f1011121314151617",
     "dda97ca4864cdfe06eaf70a0ec0d7191"),
    ("000102030405060708090a0b0c0d0e0f"
     "101112131415161718191a1b1c1d1e1f",
     "8ea2b7ca516745bfeafc49904b496089"),
]


@pytest.mark.parametrize("key_hex,want", FIPS)
def test_fips197_appendix_c(key_hex, want):
    key = bytes.fromhex(key_hex)
    assert aes.encrypt_block(key, PT).hex() == want
    assert aes.decrypt_block(key, bytes.fromhex(want)) == PT


def test_sp800_38a_cbc_aes128():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    plain = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
        "30c81c46a35ce411e5fbc1191a0a52ef"
        "f69f2445df4f9b17ad2b417be66c3710")
    want = bytes.fromhex(
        "7649abac8119b246cee98e9b12e9197d"
        "5086cb9b507219ee95db113a917678b2"
        "73bed6b8e3c1743b7116e69e22229516"
        "3ff1caa1681fac09120eca307586e1a7")
    got = aes.cbc_encrypt(key, iv, plain)
    # SP 800-38A has no padding; our PKCS#7 output appends one extra
    # block (plain is block-aligned) — the vector blocks must match
    assert got[:64] == want
    assert aes.cbc_decrypt(key, iv, got) == plain


def test_padding_sizes():
    key = b"0123456789abcdef"
    iv = b"\x00" * 16
    for n in (0, 1, 15, 16, 17, 31, 32, 100):
        d = bytes((i * 7) & 0xFF for i in range(n))
        c = aes.cbc_encrypt(key, iv, d)
        assert len(c) % 16 == 0 and len(c) == (n // 16 + 1) * 16
        assert aes.cbc_decrypt(key, iv, c) == d


def test_malformed_totality():
    key = b"0123456789abcdef"
    iv = b"\x00" * 16
    assert aes.cbc_decrypt(key, iv, b"") == b""
    assert aes.cbc_decrypt(key, iv, b"short") == b""  # not block-aligned
    # corrupt padding: decode returns the unpadded plaintext, no raise
    c = bytearray(aes.cbc_encrypt(key, iv, b"hello"))
    c[-1] ^= 0xFF
    out = aes.cbc_decrypt(key, iv, bytes(c))
    assert isinstance(out, bytes)
    with pytest.raises(ValueError):
        aes.expand_key(b"badlen")


@given(st.binary(min_size=16, max_size=16),
       st.binary(min_size=16, max_size=16),
       st.binary(max_size=1024))
@settings(max_examples=40, deadline=None)
def test_cbc_roundtrip_hypothesis(key, iv, data):
    assert aes.cbc_decrypt(key, iv, aes.cbc_encrypt(key, iv, data)) == data


@given(st.sampled_from([16, 24, 32]), st.binary(min_size=32, max_size=64))
@settings(max_examples=30, deadline=None)
def test_block_roundtrip_all_key_sizes(klen, seed):
    key = (seed * 2)[:klen]
    block = (seed[::-1] * 2)[:16]
    assert aes.decrypt_block(key, aes.encrypt_block(key, block)) == block
