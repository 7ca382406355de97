"""From-scratch GIF87a/89a codec (grayscale): the third real raster
codec next to BMP and PNG (core/raster.py), upgrading the round-3
"gif: recognized but no decoder" sniff route to an actual decode.

Scope (documented, honest): single image frame, global color table,
no interlace, extensions skipped.  The LZW layer is complete — variable
code width 9→12 with the early-change rule, CLEAR-on-full-table,
sub-block framing — and closed under this module's own encoder, which
exists to build fixtures and to let property tests roundtrip arbitrary
rasters (the same strategy as the PDF and WAV codecs).

The width-synchronization subtlety, derived rather than cargo-culted:
the decoder's string table lags the encoder's by exactly one entry
(the encoder adds after each emit; the decoder adds only after reading
the FOLLOWING code), so the decoder must widen when `next + pending ==
1 << width`, where pending is 1 once a previous code exists — the
classic "early change" off-by-one that breaks naive implementations.
"""

from __future__ import annotations

import struct

_CLEAR = 256
_EOI = 257
_FIRST = 258
_MAX_CODE = 4096


class _BitWriter:
    """LSB-first bit packing into 255-byte sub-blocks."""

    def __init__(self) -> None:
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc & 0xFF)
        out = bytearray()
        data = bytes(self.bytes)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
        return bytes(out)


class _BitReader:
    """LSB-first bit reading from concatenated sub-block payloads."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("gif: truncated LZW stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def _lzw_encode(indices: bytes) -> bytes:
    w = _BitWriter()
    width = 9
    table: dict[bytes, int] = {}
    nxt = _FIRST
    w.write(_CLEAR, width)
    if not indices:
        w.write(_EOI, width)
        return w.finish()
    seq = indices[:1]
    for b in indices[1:]:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        w.write(table[seq] if len(seq) > 1 else seq[0], width)
        if nxt < _MAX_CODE:
            table[cand] = nxt
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        else:
            w.write(_CLEAR, width)
            table.clear()
            nxt, width = _FIRST, 9
        seq = bytes([b])
    w.write(table[seq] if len(seq) > 1 else seq[0], width)
    w.write(_EOI, width)
    return w.finish()


def _lzw_decode(data: bytes, n_pixels: int) -> bytes:
    r = _BitReader(data)
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    nxt, width = _FIRST, 9
    prev: bytes | None = None
    while len(out) < n_pixels:
        pending = 0 if prev is None else 1
        if nxt + pending == (1 << width) and width < 12:
            width += 1
        code = r.read(width)
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nxt, width, prev = _FIRST, 9, None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("gif: bad first code after clear")
            entry = table[code]
        elif code < nxt:
            entry = table[code]
        elif code == nxt:
            entry = prev + prev[:1]
        else:
            raise ValueError("gif: code beyond table")
        if prev is not None and nxt < _MAX_CODE:
            table.append(prev + entry[:1])
            nxt += 1
        out += entry
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("gif: pixel data ends early")
    return bytes(out[:n_pixels])


def encode_gif(width: int, height: int, gray: bytes) -> bytes:
    """GIF89a with a 256-entry grayscale global palette, one image."""
    if len(gray) != width * height:
        raise ValueError("gif: raster size mismatch")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | 0x70 | 0x07,  # global table, 256 entries
                       0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW min code size
    out += _lzw_encode(gray)
    out += b"\x3B"
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """(w, h, grayscale raster) — palette entries map to luminance
    ((r+g+b)//3; exact for the gray palettes this module writes)."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("gif: truncated global color table")
        palette = payload[pos:pos + 3 * n]
        pos += 3 * n
    while True:
        if pos >= len(payload):
            raise ValueError("gif: missing image descriptor")
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("gif: truncated extension")
                n = payload[pos]
                pos += 1
                if n == 0:
                    break
                pos += n
            continue
        if block == 0x2C:
            break
        if block == 0x3B:
            raise ValueError("gif: trailer before image data")
        raise ValueError(f"gif: unknown block 0x{block:02x}")
    if pos + 9 > len(payload):
        raise ValueError("gif: truncated image descriptor")
    left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload,
                                                    pos)
    pos += 9
    interlaced = bool(ipacked & 0x40)
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        palette = payload[pos:pos + 3 * n]
        pos += 3 * n
    if palette is None:
        raise ValueError("gif: no color table")
    if pos >= len(payload):
        raise ValueError("gif: missing LZW min code size")
    min_code = payload[pos]
    pos += 1
    if min_code != 8:
        raise ValueError(f"gif: unsupported min code size {min_code}")
    lzw = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("gif: truncated image sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        lzw += payload[pos:pos + n]
        pos += n
    indices = _lzw_decode(bytes(lzw), iw * ih)
    if interlaced:
        indices = _deinterlace(indices, iw, ih)
    lum = bytes((palette[3 * i] + palette[3 * i + 1]
                 + palette[3 * i + 2]) // 3
                for i in range(len(palette) // 3))
    gray = bytes(lum[i] for i in indices)
    return iw, ih, gray


def _interlace_rows(h: int) -> list[int]:
    """GIF Adam-style 4-pass row order: every 8th from 0, every 8th
    from 4, every 4th from 2, every 2nd from 1."""
    order: list[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


def _deinterlace(indices: bytes, w: int, h: int) -> bytes:
    out = bytearray(len(indices))
    for stored, actual in enumerate(_interlace_rows(h)):
        out[actual * w:(actual + 1) * w] = \
            indices[stored * w:(stored + 1) * w]
    return bytes(out)
