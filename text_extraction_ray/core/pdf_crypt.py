"""PDF standard security handler (SURVEY §2.2 M10f/M10g): RC4 + AES.

Real-crawl PDFs are frequently encrypted with an EMPTY user password
(viewable-by-anyone, owner-restricted printing/copying) — per the PDF 1.7
spec §7.6.3 such files must still open and extract.  Before this module
an /Encrypt'ed payload parsed to cipher bytes and extracted nothing; now
the standard security handler revisions 2–4 and 6 (V1 RC4-40 / V2
RC4-128 / V4 crypt filters with /CFM /AESV2 AES-128-CBC or /V2 RC4 /
V5 R6 /AESV3 AES-256 with SHA-2 key derivation, Algorithm 2.B) is
decrypted from scratch (hashlib + from-scratch RC4 here + FIPS-197 AES
in core/aes.py), matching the repo's closed writer↔parser discipline:
pdf_write.py emits the same handlers so fixtures round-trip.

Spec algorithms implemented (PDF 1.7 §7.6.3.3–7.6.3.5):
  - Algorithm 2: file encryption key from (padded) password, /O, /P, ID[0]
  - Algorithm 3: the /O (owner) value
  - Algorithm 4 (R2) / 5 (R3): the /U (user) value, used to VERIFY the
    empty-user-password assumption before touching any stream — a file
    that needs a real password is left untouched so extraction degrades
    to the usual empty-text routing instead of emitting RC4 noise.
  - Algorithm 1: per-object key = MD5(file_key + objnum[3 LE] + gen[2 LE])
    truncated to min(n+5, 16).

Scope: streams only.  Strings outside streams carry no extracted content
in this engine (page text lives inside content streams, which are
decrypted whole before the Tj/TJ interpreter runs), so string decryption
is deliberately out of scope and documented here.  Outside the subset —
R5 (the withdrawn Adobe revision), EncryptMetadata false, non-/StdCF
stream filters, any non-empty user password — detection refuses cleanly
(returns None → payload handled as undecryptable, extraction degrades
to empty text).
"""

from __future__ import annotations

import hashlib
import re
import struct

# PDF 1.7 §7.6.3.3 — the 32-byte standard padding string.
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])

_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+\d+\s+R")
_ID_HEX_RE = re.compile(rb"/ID\s*\[\s*<([0-9a-fA-F]*)>")
_NUM_ENTRY_RE = {
    k: re.compile(rb"/" + k + rb"\s+(-?\d+)")
    for k in (b"V", b"R", b"P", b"Length")
}


def rc4(key: bytes, data: bytes) -> bytes:
    """From-scratch RC4 (KSA + PRGA).  Symmetric: encrypt == decrypt."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = byte ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def file_key(o_value: bytes, p: int, id0: bytes, rev: int,
             key_bytes: int, user_pw: bytes = b"") -> bytes:
    """Algorithm 2: the file encryption key (empty user pw by default)."""
    h = hashlib.md5()
    h.update(_pad_password(user_pw))
    h.update(o_value[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    digest = h.digest()
    if rev >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:key_bytes]).digest()
    return digest[:key_bytes]


def owner_value(owner_pw: bytes, user_pw: bytes, rev: int,
                key_bytes: int) -> bytes:
    """Algorithm 3: the /O entry (owner_pw falls back to user_pw)."""
    digest = hashlib.md5(_pad_password(owner_pw or user_pw)).digest()
    if rev >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    key = digest[:key_bytes]
    out = rc4(key, _pad_password(user_pw))
    if rev >= 3:
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in key), out)
    return out


def user_value(fkey: bytes, id0: bytes, rev: int) -> bytes:
    """Algorithm 4 (R2) / Algorithm 5 (R3): the /U entry."""
    if rev == 2:
        return rc4(fkey, PAD)
    digest = hashlib.md5(PAD + id0).digest()
    out = rc4(fkey, digest)
    for i in range(1, 20):
        out = rc4(bytes(b ^ i for b in fkey), out)
    return out + b"\x00" * 16  # 16 bytes of arbitrary padding (spec)


def object_key(fkey: bytes, num: int, gen: int = 0,
               aes: bool = False) -> bytes:
    """Algorithm 1: the per-object key (RC4, or AES with the spec's
    extra ``sAlT`` suffix for /AESV2)."""
    h = hashlib.md5()
    h.update(fkey)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(fkey) + 5, 16)]


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R6 password hash.

    SHA-256 seed, then ≥64 rounds of AES-128-CBC (key/iv from the
    running hash, no padding) over 64 repetitions of (pw ‖ K ‖ udata),
    the digest algorithm for the next round chosen by the first 16
    cipher bytes mod 3; terminates once round ≥ 64 and the last cipher
    byte ≤ round − 32."""
    from .aes import cbc_encrypt

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    e = b"\xff"
    while i < 64 or e[-1] > i - 32:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
    return k[:32]


def r6_file_key(u_val: bytes, ue_val: bytes,
                user_pw: bytes = b"") -> bytes | None:
    """R6 empty-user-password validation + file-key unwrap.

    /U = hash(32) ‖ validation-salt(8) ‖ key-salt(8); the password
    validates iff Algorithm 2.B(pw, validation-salt) == hash, then the
    file key is the no-pad AES-256-CBC decrypt of /UE under the
    intermediate key Algorithm 2.B(pw, key-salt) with a zero IV."""
    from .aes import cbc_decrypt

    if len(u_val) < 48 or len(ue_val) < 32:
        return None
    if hash_2b(user_pw, u_val[32:40]) != u_val[:32]:
        return None
    ikey = hash_2b(user_pw, u_val[40:48])
    return cbc_decrypt(ikey, b"\x00" * 16, ue_val[:32],
                       strip_padding=False)


def _pdf_string(body: bytes, name: bytes) -> bytes | None:
    """Value of ``/name <hex>`` or ``/name (literal)`` in a dict body.

    Literal strings handle the escapes a binary /O//U value needs
    (backslash pairs + octal); hex is the writer's canonical form.
    """
    m = re.search(rb"/" + name + rb"\s*<([0-9a-fA-F\s]*)>", body)
    if m:
        hx = re.sub(rb"\s+", b"", m.group(1))
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    m = re.search(rb"/" + name + rb"\s*\(", body)
    if not m:
        return None
    out = bytearray()
    i = m.end()
    depth = 1
    while i < len(body) and depth:
        c = body[i]
        if c == 0x5C and i + 1 < len(body):  # backslash escape
            nxt = body[i + 1]
            if 0x30 <= nxt <= 0x37:  # octal, 1-3 digits
                j = i + 1
                oct_digits = b""
                while j < len(body) and len(oct_digits) < 3 \
                        and 0x30 <= body[j] <= 0x37:
                    oct_digits += body[j:j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8,
                        0x66: 12}.get(nxt, nxt))
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if not depth:
                break
        out.append(c)
        i += 1
    return bytes(out)


class PdfDecryptor:
    """Resolved standard-security-handler state for one payload.

    ``decrypt(num, data)`` is handed to pdf._parse_objects and applied to
    each raw stream slice BEFORE filters run (spec order: decrypt, then
    decode filters).  The /Encrypt dictionary's own (hypothetical) stream
    and xref streams are never routed here by the writer subset.

    ``mode``: "rc4" (V1/V2, or a V4 /V2 crypt filter) or "aes" (V4
    /AESV2) — AES streams carry their CBC IV in the first 16 bytes and
    PKCS#7 padding (PDF 1.7 §7.6.2), both handled by core/aes.py.
    """

    def __init__(self, fkey: bytes, encrypt_num: int,
                 mode: str = "rc4") -> None:
        self.fkey = fkey
        self.encrypt_num = encrypt_num
        self.mode = mode

    def decrypt(self, num: int, data: bytes) -> bytes:
        if num == self.encrypt_num:
            return data
        if self.mode in ("aes", "aes256"):
            if len(data) < 16:
                return b""  # malformed: no room for the IV
            from .aes import cbc_decrypt

            # R6 (aes256) uses the FILE key directly for every object;
            # R4 (aes) derives a per-object key with the sAlT suffix
            key = (self.fkey if self.mode == "aes256"
                   else object_key(self.fkey, num, aes=True))
            return cbc_decrypt(key, data[:16], data[16:])
        return rc4(object_key(self.fkey, num), data)


def build_decryptor(payload: bytes) -> PdfDecryptor | None:
    """Inspect the trailer; return a verified decryptor or None.

    None means "nothing to decrypt" — either the file is not encrypted,
    the handler/algorithm is unsupported (AES, crypt filters), the
    empty-user-password check against /U fails, or the /Encrypt object
    can't be located.  Callers proceed on the raw payload in every None
    case, preserving extractor totality (core/extract.py M11).
    """
    em = None
    for em in _ENCRYPT_REF_RE.finditer(payload):
        pass  # last trailer wins (incremental updates)
    if em is None:
        return None
    num = int(em.group(1))
    om = re.search(str(num).encode() + rb"\s+\d+\s+obj(.*?)endobj",
                   payload, re.S)
    if not om:
        return None
    body = om.group(1)
    if b"/Standard" not in body:
        return None
    nums = {}
    for k, pat in _NUM_ENTRY_RE.items():
        m = pat.search(body)
        nums[k] = int(m.group(1)) if m else None
    v = nums[b"V"] or 1
    rev = nums[b"R"] or (2 if v == 1 else 3)
    mode = "rc4"
    if v == 5 and rev == 6:
        # PDF 2.0: AES-256 under /CFM /AESV3, SHA-2 key derivation
        # (Algorithm 2.B) — the file key decrypts every stream directly
        stmf = re.search(rb"/StmF\s*/(\w+)", body)
        if stmf and stmf.group(1) != b"StdCF":
            return None
        if b"/AESV3" not in body or b"/EncryptMetadata false" in body:
            return None
        u_val = _pdf_string(body, b"U")
        ue_val = _pdf_string(body, b"UE")
        if u_val is None or ue_val is None:
            return None
        fkey = r6_file_key(u_val, ue_val)
        if fkey is None or len(fkey) != 32:
            return None  # real user password required
        return PdfDecryptor(fkey, num, "aes256")
    if v == 4 and rev == 4:
        # crypt filters: the default /StdCF applied to streams (/StmF).
        # /AESV2 → AES-128-CBC; /V2 → RC4 under the V4 envelope.
        # Non-/StdCF stream filters and /AESV3 (R5/6, AES-256 + SHA-2
        # key derivation) are not in this subset → untouched.
        stmf = re.search(rb"/StmF\s*/(\w+)", body)
        if stmf and stmf.group(1) != b"StdCF":
            return None
        if b"/AESV2" in body:
            mode = "aes"
        elif b"/V2" not in body:
            return None
        if b"/EncryptMetadata false" in body or \
                b"/EncryptMetadata\x20false" in body.replace(b"\n", b" "):
            return None  # changes key derivation; out of subset
    elif v not in (1, 2) or rev not in (2, 3):
        return None  # AESV3 / R5+ etc.: unsupported, untouched
    key_bits = nums[b"Length"] or (40 if v == 1 else 128)
    key_bytes = max(5, min(16, key_bits // 8))
    p = nums[b"P"]
    o_val = _pdf_string(body, b"O")
    u_val = _pdf_string(body, b"U")
    if p is None or o_val is None or u_val is None:
        return None
    idm = _ID_HEX_RE.search(payload)
    id0 = bytes.fromhex(idm.group(1).decode("ascii")) if idm else b""
    fkey = file_key(o_val, p, id0, rev, key_bytes)
    expect = user_value(fkey, id0, rev)
    got, want = u_val[:16], expect[:16]
    if rev == 2:
        got, want = u_val[:32], expect[:32]
    if got != want:
        return None  # real user password required — leave ciphertext be
    return PdfDecryptor(fkey, num, mode)
