"""From-scratch CCITT Group 4 (ITU-T T.6 / MMR) fax codec.

CCITT G4 is THE canonical 1-bit scanned-document compression in real
crawl PDFs (/Filter /CCITTFaxDecode with /K -1): virtually every
office-scanner PDF and every TIFF fax carries it, so the extraction
engine's scanned-table OCR route (functions/table_image.py) must read
it natively — SURVEY §2.3b "noisy-image tabular extraction".  Like the
other media codecs in this repo (core/jpeg.py, core/gif.py,
core/raster.py), both directions are implemented from the spec so the
synthetic corpus stays closed under the repo's own writer:

- ``decode_g4`` — T.6 two-dimensional (MMR) decoding: per-row changing
  elements, pass / horizontal / vertical(±3) modes, T.4 white/black
  terminating + make-up run-length code tables plus the shared extended
  make-up codes (1792..2560), EOFB termination, optional
  /EncodedByteAlign row alignment and /BlackIs1 sample inversion.
- ``encode_g4`` — the matching encoder (greedy mode selection exactly
  as T.6 §2.2.3 prescribes: pass when b2 < a1, vertical when
  |a1-b1| <= 3, else horizontal), EOFB appended.

Scope (documented, honestly routed): K >= 0 (G3 1-D / mixed 2-D) and
the T.6 extension codes (0000001xxx) raise ValueError — the caller's
error routing keeps the raw bytes, same convention as every other
unsupported branch in core/.  /Decode [1 0] array inversion is the
renderer's job, not the filter's, and is out of scope here.

Decoding works on CHANGING ELEMENTS (transition positions), never on
per-pixel Python loops: cost is O(transitions) per row + one vectorized
numpy fill, so a mostly-white 1728-wide fax row costs a handful of code
reads.  Code tables are validated prefix-free at import time (a
mis-transcribed codeword that collides would break the build, not
silently mis-decode).
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

# --- ITU-T T.4 run-length code tables (terminating 0-63, make-up 64+) -------
# (run, codeword-as-bit-string); make-up codes 1792..2560 are shared
# between colours (T.4 Table 3).

_WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

_BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

_EXT_MAKEUP = {  # shared between colours (T.4 Table 3, continued)
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# --- T.6 §2.2.4 mode codes ---------------------------------------------------

_MODE_CODES = {
    "1": ("V", 0), "011": ("V", 1), "010": ("V", -1), "001": ("H", 0),
    "0001": ("P", 0), "000011": ("V", 2), "000010": ("V", -2),
    "0000011": ("V", 3), "0000010": ("V", -3),
}
_EOL = "000000000001"


def _build_decode(tables: tuple[dict, ...]) -> dict[tuple[int, int], int]:
    """(bit-length, value) -> run; import-time prefix-freeness check."""
    out: dict[tuple[int, int], int] = {}
    words: list[str] = []
    for t in tables:
        for run, code in t.items():
            key = (len(code), int(code, 2))
            if key in out:
                raise AssertionError(f"duplicate codeword {code}")
            out[key] = run
            words.append(code)
    words.sort()
    for a, b in zip(words, words[1:]):
        if b.startswith(a):
            raise AssertionError(f"{a} is a prefix of {b}")
    return out


_WHITE_DEC = _build_decode((_WHITE_CODES, _EXT_MAKEUP))
_BLACK_DEC = _build_decode((_BLACK_CODES, _EXT_MAKEUP))
_MAX_CODE_BITS = 14


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0                      # bit position
        self.nbits = 8 * len(data)

    def read_bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("CCITT: bit stream exhausted")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        """True when only zero-bit padding (if anything) remains."""
        if self.pos >= self.nbits:
            return True
        if self.nbits - self.pos >= 8:
            return False
        rest = self.data[self.pos >> 3] & ((1 << (8 - (self.pos & 7))) - 1)
        return rest == 0


def _read_mode(br: _BitReader) -> tuple[str, int]:
    """One T.6 mode code, or ('EOFB', 0) at the EOL/EOFB escape."""
    bits = ""
    for _ in range(7):
        bits += str(br.read_bit())
        if bits in _MODE_CODES:
            return _MODE_CODES[bits]
    # 7 zeros: the only legal continuations are EOL (EOFB = EOL EOL);
    # extension codes (0000001xxx) were consumed above as no-match.
    if bits != "0000000":
        raise ValueError(f"CCITT: bad mode code {bits}")
    for want in _EOL[7:]:
        if str(br.read_bit()) != want:
            raise ValueError("CCITT: bad EOL in EOFB")
    return ("EOFB", 0)


def _read_run(br: _BitReader, dec: dict[tuple[int, int], int]) -> int:
    """One 1-D run length: make-up codes accumulate until a terminator."""
    total = 0
    while True:
        length = 0
        value = 0
        run = None
        while length < _MAX_CODE_BITS:
            value = (value << 1) | br.read_bit()
            length += 1
            run = dec.get((length, value))
            if run is not None:
                break
        if run is None:
            raise ValueError("CCITT: bad run-length code")
        total += run
        if run < 64:                      # terminating code ends the run
            return total


def _transitions_to_row(trans: list[int], cols: int) -> np.ndarray:
    row = np.zeros(cols, dtype=np.uint8)
    for i in range(0, len(trans), 2):
        start = trans[i]
        stop = trans[i + 1] if i + 1 < len(trans) else cols
        row[start:stop] = 1
    return row


def decode_g4(data: bytes, columns: int, rows: int | None = None,
              byte_align: bool = False,
              black_is_1: bool = False) -> np.ndarray:
    """T.6 MMR decode -> (n_rows, columns) uint8 array of SAMPLES as the
    PDF filter emits them: with the default /BlackIs1 false, 0 = black
    (DeviceGray-natural); with /BlackIs1 true, 1 = black.  Stops at
    EOFB, at /Rows when given, or at clean end-of-data on a row
    boundary; anything malformed raises ValueError for the caller's
    error routing."""
    if columns <= 0:
        raise ValueError("CCITT: bad /Columns")
    br = _BitReader(data)
    ref: list[int] = []                   # imaginary all-white row
    lines: list[np.ndarray] = []
    while rows is None or len(lines) < rows:
        if br.exhausted():
            break
        if byte_align:
            br.align()
            if br.exhausted():
                break
        cur: list[int] = []
        color = 0                          # rows start white
        a0 = -1
        while a0 < columns:
            mode, delta = _read_mode(br)
            if mode == "EOFB":
                if cur:
                    raise ValueError("CCITT: EOFB mid-row")
                return _finish(lines, columns, black_is_1)
            i = bisect_right(ref, a0)
            if (i & 1) != color:
                i += 1
            b1 = ref[i] if i < len(ref) else columns
            b2 = ref[i + 1] if i + 1 < len(ref) else columns
            if mode == "P":
                a0 = b2
            elif mode == "H":
                dec_a = _BLACK_DEC if color else _WHITE_DEC
                dec_b = _WHITE_DEC if color else _BLACK_DEC
                r1 = _read_run(br, dec_a)
                r2 = _read_run(br, dec_b)
                a1 = max(a0, 0) + r1
                a2 = a1 + r2
                cur.extend((a1, a2))
                a0 = a2
            else:                          # vertical
                a1 = b1 + delta
                if a1 < 0 or (cur and a1 < cur[-1]):
                    raise ValueError("CCITT: transitions out of order")
                cur.append(a1)
                a0 = a1
                color ^= 1
        trans = [min(t, columns) for t in cur]
        if any(b < a for a, b in zip(trans, trans[1:])):
            raise ValueError("CCITT: transitions out of order")
        lines.append(_transitions_to_row(trans, columns))
        ref = trans
    return _finish(lines, columns, black_is_1)


def _finish(lines: list[np.ndarray], columns: int,
            black_is_1: bool) -> np.ndarray:
    if not lines:
        return np.zeros((0, columns), dtype=np.uint8)
    img = np.vstack(lines)                 # 1 = black internally
    return img if black_is_1 else (1 - img)


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: str) -> None:
        for c in code:
            self.acc = (self.acc << 1) | (c == "1")
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        if self.n:
            self.buf.append(self.acc << (8 - self.n))
            self.acc = 0
            self.n = 0

    def getvalue(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _emit_run(bw: _BitWriter, run: int, codes: dict[int, str]) -> None:
    while run > 2623:                      # 2560 make-up + max 63 term
        bw.write(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        makeup = (run // 64) * 64
        bw.write(codes[makeup] if makeup <= 1728 else _EXT_MAKEUP[makeup])
        run -= makeup
    bw.write(codes[run])


def _row_transitions(row: np.ndarray) -> list[int]:
    t = (np.flatnonzero(row[1:] != row[:-1]) + 1).tolist()
    if row[0]:
        t.insert(0, 0)
    return t


def encode_g4(img: np.ndarray, byte_align: bool = False) -> bytes:
    """T.6 MMR encode of a binary image (uint8/bool, 1 = BLACK pixel);
    EOFB appended.  The greedy mode choice is the one the standard
    prescribes, so output is what any conforming fax encoder produces."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("CCITT: encode expects a 2-D bitmap")
    _, cols = img.shape
    bw = _BitWriter()
    ref: list[int] = []
    for row in img:
        if byte_align:
            bw.align()
        cur = _row_transitions(row)
        a0 = -1
        color = 0
        while a0 < cols:
            i = bisect_right(cur, a0)
            if (i & 1) != color:
                i += 1
            a1 = cur[i] if i < len(cur) else cols
            a2 = cur[i + 1] if i + 1 < len(cur) else cols
            j = bisect_right(ref, a0)
            if (j & 1) != color:
                j += 1
            b1 = ref[j] if j < len(ref) else cols
            b2 = ref[j + 1] if j + 1 < len(ref) else cols
            if b2 < a1:
                bw.write("0001")           # pass
                a0 = b2
            elif abs(a1 - b1) <= 3:
                bw.write({0: "1", 1: "011", -1: "010", 2: "000011",
                          -2: "000010", 3: "0000011",
                          -3: "0000010"}[a1 - b1])
                a0 = a1
                color ^= 1
            else:                          # horizontal
                first = _BLACK_CODES if color else _WHITE_CODES
                second = _WHITE_CODES if color else _BLACK_CODES
                bw.write("001")
                _emit_run(bw, a1 - max(a0, 0), first)
                _emit_run(bw, a2 - a1, second)
                a0 = a2
        ref = cur
    if byte_align:                         # EOFB starts a line position too
        bw.align()
    bw.write(_EOL)
    bw.write(_EOL)                         # EOFB
    return bw.getvalue()
