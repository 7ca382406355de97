"""From-scratch AES-128/192/256 + CBC mode (SURVEY §2.2 M10g support).

Modern encrypted crawl PDFs use the /AESV2 (AES-128-CBC, PDF 1.6 R4) and
/AESV3 (AES-256-CBC, PDF 2.0 R6) crypt filters; the sandbox has no crypto
libraries, so this is FIPS-197 implemented directly — table-free key
schedule, numpy-vectorized block layer (all blocks of a stream decrypt in
parallel: SubBytes/ShiftRows are pure gathers, MixColumns is xtime
arithmetic over the whole block array), used by core/pdf_crypt.py.

Decrypt-oriented: the inverse cipher is the hot path (reading crawl
PDFs); the forward cipher exists to keep the writer↔parser pair closed
(pdf_write.py emits AES fixtures) and to implement CBC encryption.

Public test vectors pinned in tests/test_aes.py: FIPS-197 appendix
C.1/C.2/C.3 single blocks and NIST SP 800-38A CBC cases.
"""

from __future__ import annotations

import numpy as np

# --- S-box generated from first principles (no transcribed tables): ----
# multiplicative inverse in GF(2^8) via exp/log tables over generator 3,
# then the affine transform of FIPS-197 §5.1.1.


def _build_sbox() -> tuple[np.ndarray, np.ndarray]:
    exp = np.zeros(256, np.uint8)
    log = np.zeros(256, np.uint8)
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by generator 0x03 = x * 2 ^ x
        x2 = (x << 1) ^ (0x1B if x & 0x80 else 0)
        x = (x2 ^ x) & 0xFF
    inv = np.zeros(256, np.uint8)
    for v in range(1, 256):
        inv[v] = exp[(255 - int(log[v])) % 255]
    sbox = np.zeros(256, np.uint8)
    for v in range(256):
        b = int(inv[v])
        r = 0x63
        for sh in (0, 1, 2, 3, 4):
            r ^= ((b << sh) | (b >> (8 - sh))) & 0xFF
        sbox[v] = r
    inv_sbox = np.zeros(256, np.uint8)
    inv_sbox[sbox] = np.arange(256, dtype=np.uint8)
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()

# round constants: successive doublings of 1 in GF(2^8)
_RCON = [1]
for _ in range(13):
    _r = _RCON[-1] << 1
    _RCON.append((_r ^ 0x1B) & 0xFF if _r & 0x100 else _r)


def _xtime(a: np.ndarray) -> np.ndarray:
    return ((a << 1) ^ np.where(a & 0x80, 0x1B, 0)).astype(np.uint8)


def _gmul(a: np.ndarray, k: int) -> np.ndarray:
    """Multiply byte array by constant k in GF(2^8) (k ≤ 14 needed)."""
    out = np.zeros_like(a)
    p = a
    while k:
        if k & 1:
            out = out ^ p
        p = _xtime(p)
        k >>= 1
    return out


def expand_key(key: bytes) -> np.ndarray:
    """FIPS-197 §5.2 key schedule → (rounds+1, 4, 4) round keys
    (column-major state convention: state[r, c] = byte r of word c)."""
    nk = len(key) // 4
    if len(key) not in (16, 24, 32):
        raise ValueError(f"aes: bad key length {len(key)}")
    nr = {4: 10, 6: 12, 8: 14}[nk]
    words = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [int(_SBOX[b]) for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    w = np.array(words, np.uint8).reshape(nr + 1, 4, 4)
    return w.transpose(0, 2, 1)  # → state[round, byte_row, column]


_SHIFT_COLS = np.array([[(c + r) % 4 for c in range(4)] for r in range(4)])
_INV_SHIFT_COLS = np.array([[(c - r) % 4 for c in range(4)] for r in range(4)])
_ROWS = np.arange(4)[:, None]


def _cipher_blocks(states: np.ndarray, rks: np.ndarray) -> np.ndarray:
    """Forward cipher over (n, 4, 4) states, all blocks at once."""
    nr = len(rks) - 1
    s = states ^ rks[0]
    for rnd in range(1, nr + 1):
        s = _SBOX[s]
        s = s[:, _ROWS, _SHIFT_COLS]
        if rnd < nr:
            col2 = _gmul(s, 2)
            xall = s[:, 0] ^ s[:, 1] ^ s[:, 2] ^ s[:, 3]
            # new[r] = 2·s[r] ⊕ 3·s[r+1] ⊕ s[r+2] ⊕ s[r+3]
            #        = s[r] ⊕ xall ⊕ xtime(s[r] ⊕ s[r+1])
            s = np.stack([s[:, r] ^ xall
                          ^ col2[:, r] ^ col2[:, (r + 1) % 4]
                          for r in range(4)], axis=1)
        s = s ^ rks[rnd]
    return s


# InvMixColumns constant multipliers as 256-byte LUTs (derived from
# _gmul, so still generated): one gather per term instead of the 3-4
# xtime passes _gmul costs per call — the inverse cipher runs once per
# encrypted PDF stream and was the crypt-path hot spot.
_GM9, _GM11, _GM13, _GM14 = (
    _gmul(np.arange(256, dtype=np.uint8), k) for k in (9, 11, 13, 14))


def _inv_cipher_blocks(states: np.ndarray, rks: np.ndarray) -> np.ndarray:
    """Inverse cipher over (n, 4, 4) states, all blocks at once."""
    nr = len(rks) - 1
    s = states ^ rks[nr]
    for rnd in range(nr - 1, -1, -1):
        s = s[:, _ROWS, _INV_SHIFT_COLS]
        s = _INV_SBOX[s]
        s = s ^ rks[rnd]
        if rnd > 0:
            s = np.stack(
                [_GM14[s[:, r]] ^ _GM11[s[:, (r + 1) % 4]]
                 ^ _GM13[s[:, (r + 2) % 4]] ^ _GM9[s[:, (r + 3) % 4]]
                 for r in range(4)], axis=1)
    return s


# --- T-table forward cipher (pure Python, for the serial CBC-encrypt
# chain: per-16-byte-block numpy dispatch costs ~40µs/block, the u32
# table path ~2µs; tables are DERIVED from the generated S-box) --------


def _build_te() -> list[list[int]]:
    te0 = []
    for x in range(256):
        s = int(_SBOX[x])
        s2 = ((s << 1) ^ 0x1B if s & 0x80 else s << 1) & 0xFF
        s3 = s2 ^ s
        te0.append((s2 << 24) | (s << 16) | (s << 8) | s3)
    # Te1..Te3 are byte rotations of Te0
    rot = lambda v, n: ((v >> n) | (v << (32 - n))) & 0xFFFFFFFF  # noqa: E731
    return [te0, [rot(v, 8) for v in te0], [rot(v, 16) for v in te0],
            [rot(v, 24) for v in te0]]


_TE = _build_te()
_SBOX_INT = [int(v) for v in _SBOX]


def _rk_words(rks: np.ndarray) -> list[int]:
    """Round keys as big-endian u32 column words for the T-table path."""
    cols = rks.transpose(0, 2, 1).reshape(-1, 4)  # (rounds*4, bytes)
    return [(int(a) << 24) | (int(b) << 16) | (int(c) << 8) | int(d)
            for a, b, c, d in cols]


def _cipher_block_words(w: list[int], rkw: list[int], nr: int) -> list[int]:
    te0, te1, te2, te3 = _TE
    s0 = w[0] ^ rkw[0]
    s1 = w[1] ^ rkw[1]
    s2 = w[2] ^ rkw[2]
    s3 = w[3] ^ rkw[3]
    k = 4
    for _ in range(nr - 1):
        t0 = (te0[s0 >> 24] ^ te1[(s1 >> 16) & 0xFF]
              ^ te2[(s2 >> 8) & 0xFF] ^ te3[s3 & 0xFF] ^ rkw[k])
        t1 = (te0[s1 >> 24] ^ te1[(s2 >> 16) & 0xFF]
              ^ te2[(s3 >> 8) & 0xFF] ^ te3[s0 & 0xFF] ^ rkw[k + 1])
        t2 = (te0[s2 >> 24] ^ te1[(s3 >> 16) & 0xFF]
              ^ te2[(s0 >> 8) & 0xFF] ^ te3[s1 & 0xFF] ^ rkw[k + 2])
        t3 = (te0[s3 >> 24] ^ te1[(s0 >> 16) & 0xFF]
              ^ te2[(s1 >> 8) & 0xFF] ^ te3[s2 & 0xFF] ^ rkw[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    sb = _SBOX_INT
    return [
        ((sb[s0 >> 24] << 24) | (sb[(s1 >> 16) & 0xFF] << 16)
         | (sb[(s2 >> 8) & 0xFF] << 8) | sb[s3 & 0xFF]) ^ rkw[k],
        ((sb[s1 >> 24] << 24) | (sb[(s2 >> 16) & 0xFF] << 16)
         | (sb[(s3 >> 8) & 0xFF] << 8) | sb[s0 & 0xFF]) ^ rkw[k + 1],
        ((sb[s2 >> 24] << 24) | (sb[(s3 >> 16) & 0xFF] << 16)
         | (sb[(s0 >> 8) & 0xFF] << 8) | sb[s1 & 0xFF]) ^ rkw[k + 2],
        ((sb[s3 >> 24] << 24) | (sb[(s0 >> 16) & 0xFF] << 16)
         | (sb[(s1 >> 8) & 0xFF] << 8) | sb[s2 & 0xFF]) ^ rkw[k + 3],
    ]


def _to_states(data: bytes) -> np.ndarray:
    a = np.frombuffer(data, np.uint8).reshape(-1, 4, 4)
    return a.transpose(0, 2, 1)  # bytes are column-major in the state


def _from_states(s: np.ndarray) -> bytes:
    return s.transpose(0, 2, 1).tobytes()


def encrypt_block(key: bytes, block: bytes) -> bytes:
    return _from_states(_cipher_blocks(_to_states(block), expand_key(key)))


def decrypt_block(key: bytes, block: bytes) -> bytes:
    return _from_states(_inv_cipher_blocks(_to_states(block),
                                           expand_key(key)))


def cbc_encrypt(key: bytes, iv: bytes, plain: bytes,
                pad: bool = True) -> bytes:
    """CBC with PKCS#7 padding (the PDF /AESV2//AESV3 stream
    convention); output does NOT include the IV — callers prepend it
    per spec.  ``pad=False`` is the no-padding mode the R6 key wrapping
    (/UE //OE, hash Algorithm 2.B) requires — input must be aligned.
    Chaining is inherently serial, so this runs the T-table block
    cipher (~20× the per-block numpy dispatch)."""
    if pad:
        n = 16 - len(plain) % 16
        data = plain + bytes([n]) * n
    else:
        if len(plain) % 16:
            raise ValueError("aes: unaligned no-pad CBC input")
        data = plain
    rks = expand_key(key)
    rkw = _rk_words(rks)
    nr = len(rks) - 1
    import struct as _st

    prev = list(_st.unpack(">4I", iv))
    out = bytearray()
    for i in range(0, len(data), 16):
        w = _st.unpack(">4I", data[i:i + 16])
        prev = _cipher_block_words([a ^ b for a, b in zip(w, prev)],
                                   rkw, nr)
        out += _st.pack(">4I", *prev)
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, cipher: bytes,
                strip_padding: bool = True) -> bytes:
    """CBC decrypt — ALL blocks through the inverse cipher at once
    (the XOR chain needs only the shifted ciphertext), then unpad.
    Tolerates malformed padding by returning the unpadded plaintext
    (error-routing convention: never raise on untrusted bytes)."""
    if not cipher or len(cipher) % 16:
        return b""
    states = _to_states(cipher)
    plain = _inv_cipher_blocks(states, expand_key(key))
    prevs = np.concatenate([_to_states(iv), states[:-1]], axis=0)
    out = _from_states(plain ^ prevs)
    if strip_padding and out:
        pad = out[-1]
        if 1 <= pad <= 16 and out[-pad:] == bytes([pad]) * pad:
            return out[:-pad]
    return out
