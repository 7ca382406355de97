"""From-scratch JBIG2 (ITU-T T.88) — the third office-scanner codec in
scanned PDFs, after CCITT G4 and DCT (VERDICT r4 Missing #3).

Scope: the GENERIC REGION with arithmetic (MQ) coding — the form
bilevel scanner output takes when the producer doesn't run symbol
matching.  Segment types this module does NOT implement (symbol
dictionaries, text/halftone/refinement regions, MMR-coded generic
regions — MMR is already ``core/ccitt.py`` but producers practically
always pick MQ here) raise ValueError so callers keep their error
routing.  All semantics below are pinned to the published spec:

- **MQ arithmetic coder** (T.88 Annex E, shared with JPEG 2000): the
  47-state Qe table, decoder (INITDEC/BYTEIN/DECODE with the software
  conventions) and the matching encoder (INITENC/BYTEOUT/FLUSH with
  0xFF bit-stuffing), so the fixture cycle is closed under the repo's
  own writer like every other codec here.
- **Generic region decoding** (T.88 §6.2): GB template 0 with nominal
  AT pixels — the 16-pixel context assembled in the spec's sorted
  (y, x) order, maintained incrementally as three sliding row windows
  (5/7/4 bits); TPGDON typical-prediction rows (context 0x9B25 toggles
  LTP; an LTP row copies the row above) are decoded because real
  producers emit them.
- **Embedded-organization segment layer** (T.88 Annex §7 / PDF 32000-1
  §7.4.7): segment headers (long-form referred counts, 1/2/4-byte
  referred numbers, 1/4-byte page association), page-information and
  immediate generic-region segments; region bitmaps composite onto the
  page by OR.  ``/JBIG2Globals`` streams are accepted and scanned; any
  segment type outside the scope raises.

Bit convention: decoded bitmaps are (h, w) uint8 with **1 = black**
(JBIG2-natural); the PDF layer converts to DeviceGray.
"""

from __future__ import annotations

import struct

import numpy as np

# T.88 Table E.1 — (Qe, NMPS, NLPS, SWITCH)
_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)

_TPGDON_CTX = 0x9B25     # template-0 typical-prediction context (§6.2.5.7)


class MQDecoder:
    """T.88 Annex E decoder (software conventions)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        d, bp = self.data, self.bp
        cur = d[bp] if bp < len(d) else 0xFF
        if cur == 0xFF:
            nxt = d[bp + 1] if bp + 1 < len(d) else 0xFF
            if nxt > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += nxt << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            nxt = d[bp + 1] if bp + 1 < len(d) else 0xFF
            self.c += nxt << 8
            self.ct = 8

    def decode(self, cx: "CXStates", k: int) -> int:
        """cx = context-state store, k = context index → decision bit."""
        ci, cmps = cx.i, cx.mps
        qe, nmps, nlps, switch = _QE[ci[k]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            if self.a < qe:
                self.a = qe
                d = cmps[k]
                ci[k] = nmps
            else:
                self.a = qe
                d = 1 - cmps[k]
                if switch:
                    cmps[k] = 1 - cmps[k]
                ci[k] = nlps
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return cmps[k]
            if self.a < qe:
                d = 1 - cmps[k]
                if switch:
                    cmps[k] = 1 - cmps[k]
                ci[k] = nlps
            else:
                d = cmps[k]
                ci[k] = nmps
        while True:       # RENORMD
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 Annex E encoder — exact inverse of MQDecoder."""

    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.b: list[int] = []        # emitted bytes; b[-1] mutable

    def _byteout(self) -> None:
        if self.b and self.b[-1] == 0xFF:
            self.b.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self.b.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            if self.b:
                self.b[-1] += 1
            else:
                self.b.append(1)      # carry into a leading byte
            if self.b[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                self.b.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.b.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, cx: "CXStates", k: int, d: int) -> None:
        ci, cmps = cx.i, cx.mps
        qe, nmps, nlps, switch = _QE[ci[k]]
        if d == cmps[k]:              # CODEMPS
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                ci[k] = nmps
                self._renorm()
            else:
                self.c += qe
        else:                         # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cmps[k] = 1 - cmps[k]
            ci[k] = nlps
            self._renorm()

    def flush(self) -> bytes:
        temp = self.c + self.a - 1    # SETBITS
        temp &= 0xFFFF0000
        if temp < self.c:
            temp += 0x8000
        self.c = temp
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        out = bytes(self.b)
        while out.endswith(b"\xff"):  # discard optional trailing 0xFF
            out = out[:-1]
        return out


class CXStates:
    """Per-context (index, MPS) adaptive state for the full 16-bit
    template-0 context space.  Two flat bytearrays, not 2^16 Python
    lists — the list-of-lists allocation alone cost ~30 ms per region,
    dominating small scanner regions."""

    __slots__ = ("i", "mps")

    def __init__(self, n: int = 1 << 16) -> None:
        self.i = bytearray(n)
        self.mps = bytearray(n)


def _new_cx(n: int = 1 << 16) -> CXStates:
    return CXStates(n)


def decode_generic_region(data: bytes, width: int, height: int,
                          tpgdon: bool = False) -> np.ndarray:
    """MQ-coded generic region, template 0, nominal AT → (h, w) uint8
    (1 = black)."""
    if width <= 0 or height <= 0 or width * height > 1 << 26:
        raise ValueError("jbig2: unreasonable region dimensions")
    dec = MQDecoder(data)
    cx = _new_cx()
    bm = np.zeros((height, width), dtype=np.uint8)
    ltp = 0

    def px(y: int, x: int) -> int:
        if y < 0 or x < 0 or x >= width:
            return 0
        return int(bm[y, x])

    for y in range(height):
        if tpgdon:
            ltp ^= dec.decode(cx, _TPGDON_CTX)
            if ltp:
                if y > 0:
                    bm[y] = bm[y - 1]
                continue
        # sliding windows: r2 = row y-2 @ x-2..x+2 (5b),
        # r1 = row y-1 @ x-3..x+3 (7b), r0 = row y @ x-4..x-1 (4b)
        r2 = (px(y - 2, 0) << 2) | (px(y - 2, 1) << 1) | px(y - 2, 2)
        r1 = ((px(y - 1, 0) << 3) | (px(y - 1, 1) << 2)
              | (px(y - 1, 2) << 1) | px(y - 1, 3))
        r0 = 0
        row = bm[y]
        for x in range(width):
            bit = dec.decode(cx, (r2 << 11) | (r1 << 4) | r0)
            row[x] = bit
            r2 = ((r2 << 1) | px(y - 2, x + 3)) & 0x1F
            r1 = ((r1 << 1) | px(y - 1, x + 4)) & 0x7F
            r0 = ((r0 << 1) | bit) & 0x0F
    return bm


def encode_generic_region(bm: np.ndarray) -> bytes:
    """Inverse of ``decode_generic_region`` (template 0, nominal AT,
    no TPGDON)."""
    bm = np.ascontiguousarray(bm, dtype=np.uint8)
    height, width = bm.shape
    enc = MQEncoder()
    cx = _new_cx()

    def px(y: int, x: int) -> int:
        if y < 0 or x < 0 or x >= width:
            return 0
        return int(bm[y, x])

    for y in range(height):
        r2 = (px(y - 2, 0) << 2) | (px(y - 2, 1) << 1) | px(y - 2, 2)
        r1 = ((px(y - 1, 0) << 3) | (px(y - 1, 1) << 2)
              | (px(y - 1, 2) << 1) | px(y - 1, 3))
        r0 = 0
        row = bm[y]
        for x in range(width):
            bit = int(row[x])
            enc.encode(cx, (r2 << 11) | (r1 << 4) | r0, bit)
            r2 = ((r2 << 1) | px(y - 2, x + 3)) & 0x1F
            r1 = ((r1 << 1) | px(y - 1, x + 4)) & 0x7F
            r0 = ((r0 << 1) | bit) & 0x0F
    return enc.flush()


# --------------------------------------------------------------------------
# embedded-organization segment layer
# --------------------------------------------------------------------------

_GENERIC_TYPES = (36, 38, 39)     # intermediate / immediate / lossless
_PAGE_INFO = 48
_IGNORABLE = (49, 50, 51, 62)     # end-of-page/stripe/file, extension


def _parse_segments(data: bytes):
    """Yield (type, page, payload) for each segment header+data."""
    pos, n = 0, len(data)
    while pos + 11 <= n:
        _num, = struct.unpack_from(">I", data, pos)
        flags = data[pos + 4]
        stype = flags & 0x3F
        page_4 = bool(flags & 0x40)
        pos += 5
        rts = data[pos]
        if (rts >> 5) == 7:
            count, = struct.unpack_from(">I", data, pos)
            count &= 0x1FFFFFFF
            pos += 4 + (count + 8) // 8      # retain bits
        else:
            count = rts >> 5
            pos += 1
        ref_size = 1 if _num <= 256 else (2 if _num <= 65536 else 4)
        pos += count * ref_size
        if page_4:
            page, = struct.unpack_from(">I", data, pos)
            pos += 4
        else:
            page = data[pos]
            pos += 1
        length, = struct.unpack_from(">I", data, pos)
        pos += 4
        if length == 0xFFFFFFFF:
            raise ValueError("jbig2: unknown-length segment unsupported")
        if pos + length > n:
            raise ValueError("jbig2: truncated segment data")
        yield stype, page, data[pos:pos + length]
        pos += length


def _segments_total(blob: bytes):
    """_parse_segments with the totality contract: any malformed header
    (truncated struct field, offset past EOF) raises ValueError, never
    struct.error/IndexError — callers error-route ValueError only."""
    try:
        yield from _parse_segments(blob)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"jbig2: malformed segment header ({exc})") \
            from exc


def decode_jbig2_embedded(data: bytes,
                          globals_data: bytes = b"") -> np.ndarray:
    """PDF-embedded JBIG2 stream → page bitmap (1 = black).

    Generic-region segments composite onto the page by OR; segment
    types outside the generic scope raise ValueError (error-routed by
    the caller, the multimodal stub policy)."""
    page_w = page_h = None
    regions: list[tuple[int, int, np.ndarray]] = []
    for blob in (globals_data, data):
        if not blob:
            continue
        for stype, _page, payload in _segments_total(blob):
            if stype == _PAGE_INFO:
                if len(payload) < 8:
                    raise ValueError("jbig2: short page-info segment")
                page_w, page_h = struct.unpack_from(">II", payload, 0)
            elif stype in _GENERIC_TYPES:
                if len(payload) < 18:
                    raise ValueError("jbig2: short region segment")
                w, h, x, y = struct.unpack_from(">IIII", payload, 0)
                gflags = payload[17]
                if gflags & 0x01:
                    raise ValueError("jbig2: MMR generic region "
                                     "unsupported (use CCITT path)")
                template = (gflags >> 1) & 0x03
                if template != 0:
                    raise ValueError(
                        f"jbig2: GB template {template} unsupported")
                tpgdon = bool(gflags & 0x08)
                at_n = 4   # template 0 carries 4 AT pairs
                at = payload[18:18 + 2 * at_n]
                if at != b"\x03\xff\xfd\xff\x02\xfe\xfe\xfe":
                    raise ValueError("jbig2: non-nominal AT pixels "
                                     "unsupported")
                mq = payload[18 + 2 * at_n:]
                regions.append(
                    (x, y, decode_generic_region(mq, w, h, tpgdon)))
            elif stype in _IGNORABLE:
                continue
            else:
                raise ValueError(
                    f"jbig2: segment type {stype} unsupported "
                    "(symbol/text/halftone)")
    if page_w is None:
        if len(regions) == 1 and regions[0][:2] == (0, 0):
            return regions[0][2]
        raise ValueError("jbig2: no page information segment")
    if page_h == 0xFFFFFFFF:          # striped page: height from regions
        page_h = max((y + r.shape[0] for _x, y, r in regions), default=0)
    if page_w * max(page_h, 1) > 1 << 26:
        raise ValueError("jbig2: unreasonable page dimensions")
    page = np.zeros((page_h, page_w), dtype=np.uint8)
    for x, y, r in regions:
        h, w = r.shape
        if y + h > page_h or x + w > page_w:
            raise ValueError("jbig2: region outside page bounds")
        page[y:y + h, x:x + w] |= r
    return page


_NOMINAL_AT = b"\x03\xff\xfd\xff\x02\xfe\xfe\xfe"


def _segment(num: int, stype: int, page: int, payload: bytes) -> bytes:
    head = struct.pack(">IB", num, stype & 0x3F)
    head += b"\x00"                   # 0 referred segments, short form
    head += bytes([page])             # 1-byte page association
    head += struct.pack(">I", len(payload))
    return head + payload


def encode_jbig2_embedded(bm: np.ndarray) -> bytes:
    """Page-info + immediate lossless generic region (template 0,
    nominal AT) — the writer half that keeps the corpus closed."""
    bm = np.ascontiguousarray(bm, dtype=np.uint8)
    h, w = bm.shape
    page_info = struct.pack(">IIIIB", w, h, 0, 0, 0) + b"\x00\x00"
    out = _segment(0, _PAGE_INFO, 1, page_info)
    region_info = struct.pack(">IIIIB", w, h, 0, 0, 0)
    gflags = bytes([0x00])            # MQ, template 0, no TPGDON
    mq = encode_generic_region(bm)
    out += _segment(1, 39, 1, region_info + gflags + _NOMINAL_AT + mq)
    return out
