"""PDF stream filters beyond /FlateDecode (round 4) — stdlib + the
repo's own kernels, no reference citations possible (/root/reference is
an empty checkout, SURVEY §0); semantics pinned by the published PDF
spec (ISO 32000 §7.4).

Decode side — ``apply_stream_filters(header, data)``: reads the
``/Filter`` entry (name or array) from a stream dictionary and applies
the chain in decode order: ASCIIHexDecode, ASCII85Decode,
RunLengthDecode, LZWDecode (the TIFF/PDF variable-width variant,
MSB-first, EarlyChange honoured via /DecodeParms), FlateDecode, plus
PNG predictors (/Predictor >= 10) after Flate/LZW — reusing the
vectorized unfilter from ``core.raster``.  Image codecs (DCTDecode,
JPXDecode, CCITTFaxDecode, JBIG2Decode) END the chain with the data as
delivered — image XObjects carry their own container and are decoded
by the raster layer, not here (DCT via core/jpeg.py, CCITT G4 via
core/ccitt.py, JBIG2 generic regions via core/jbig2.py since round 5;
JPXDecode remains raw → error-routed).  Any malformed filter input yields
``b""`` (the pre-round-4 zlib-failure convention): extraction routes
the object to its error column instead of crashing.

Encode side — ``encode_stream(data, spec)``: the writer-side inverses
(flate / lzw / a85 / ahx / rl, chainable "a85+flate" in decode order,
"flate-pred" = PNG-Up predictor then Flate) keep the synthetic fixture
cycle closed under the repo's own writer, the same discipline as the
GIF-LZW and JPEG codecs.
"""

from __future__ import annotations

import re
import zlib

_FILTER_RE = re.compile(rb"/Filter\s*(?:\[([^\]]*)\]|/([A-Za-z0-9]+))")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_PRED_RE = re.compile(rb"/Predictor\s+(\d+)")
_COLUMNS_RE = re.compile(rb"/Columns\s+(\d+)")
_COLORS_RE = re.compile(rb"/Colors\s+(\d+)")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)")
_EARLY_RE = re.compile(rb"/EarlyChange\s+(\d+)")

_IMAGE_CODECS = (b"DCTDecode", b"JPXDecode", b"CCITTFaxDecode",
                 b"JBIG2Decode")


# --- LZW (TIFF/PDF variant: MSB-first, 9->12 bit codes, 256=Clear,
# --- 257=EOD, EarlyChange default 1) ------------------------------------------

def lzw_decode(data: bytes, early: int = 1) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            acc &= (1 << nbits) - 1
            if code == 256:                     # ClearTable
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:                     # EOD
                return bytes(out)
            if prev is None:
                if code > 255:
                    raise ValueError("pdf-lzw: first code not a literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if code >= 256 and not entry:
                    raise ValueError("pdf-lzw: reserved code in stream")
                table.append(prev + entry[:1])
            elif code == len(table):            # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("pdf-lzw: code beyond table")
            out += entry
            prev = entry
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)                            # tolerate missing EOD


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    d: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    emit(256)                                    # leading ClearTable
    w = b""
    for i in range(len(data)):
        ch = data[i: i + 1]
        wc = w + ch
        if wc in d:
            w = wc
            continue
        emit(d[w])
        d[wc] = nxt
        nxt += 1
        # the decoder's table lags ONE entry behind the encoder's (it
        # learns entry k while processing code k+1), so the encoder
        # widens one assignment later than the decoder's
        # len(table)+early >= 2^width rule — the interop convention of
        # pdf.js/Ghostscript; a symmetric condition here would desync
        # widths at every 2^w boundary
        if nxt + early > (1 << width) and width < 12:
            width += 1
        w = ch
        if nxt >= 4095:                          # table nearly full: reset
            emit(d[w])
            emit(256)
            d = {bytes([j]): j for j in range(256)}
            nxt = 258
            width = 9
            w = b""
    if w:
        emit(d[w])
    emit(257)                                    # EOD
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)  # pad final byte
    return bytes(out)


# --- ASCIIHex / ASCII85 / RunLength ------------------------------------------

_WS = b" \t\r\n\f\x00"


def ahx_decode(data: bytes) -> bytes:
    end = data.find(b">")
    if end != -1:
        data = data[:end]
    hexs = bytes(c for c in data if c not in _WS)
    if len(hexs) % 2:
        hexs += b"0"                             # spec: odd length pads 0
    try:
        return bytes.fromhex(hexs.decode("ascii"))
    except (ValueError, UnicodeDecodeError) as exc:
        raise ValueError(f"pdf-ahx: {exc}") from exc


def ahx_encode(data: bytes) -> bytes:
    return data.hex().encode("ascii") + b">"


def a85_decode(data: bytes) -> bytes:
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end != -1:
        data = data[:end]
    out = bytearray()
    group: list[int] = []
    for c in data:
        if c in _WS:
            continue
        if c == 0x7A:                            # 'z' = 4 zero bytes
            if group:
                raise ValueError("pdf-a85: z inside group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= c <= 0x75:
            raise ValueError("pdf-a85: byte out of range")
        group.append(c - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            if v > 0xFFFFFFFF:
                raise ValueError("pdf-a85: group overflow")
            out += v.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            raise ValueError("pdf-a85: lone trailing digit")
        k = len(group)
        v = 0
        for g in group + [84] * (5 - k):         # pad with 'u'
            v = v * 85 + g
        out += v.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def a85_encode(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i: i + 4]
        k = len(chunk)
        v = int.from_bytes(chunk + b"\x00" * (4 - k), "big")
        if v == 0 and k == 4:
            out.append(0x7A)                     # 'z'
            continue
        digits = []
        for _ in range(5):
            digits.append(v % 85)
            v //= 85
        out += bytes(0x21 + d for d in reversed(digits))[: k + 1]
    return bytes(out) + b"~>"


def rl_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ln = data[i]
        i += 1
        if ln == 128:                            # EOD
            break
        if ln < 128:                             # literal run of ln+1
            if i + ln + 1 > n:
                raise ValueError("pdf-rl: truncated literal run")
            out += data[i: i + ln + 1]
            i += ln + 1
        else:                                    # repeat next byte 257-ln
            if i >= n:
                raise ValueError("pdf-rl: truncated repeat run")
            out += data[i: i + 1] * (257 - ln)
            i += 1
    return bytes(out)


def rl_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        j = i
        while j < n and j - i < 127 and data[j] == data[i]:
            j += 1
        if j - i >= 3:                           # repeat run
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        j = i                                    # literal run
        while j < n and j - i < 128:
            if (j + 2 < n and data[j] == data[j + 1] == data[j + 2]):
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    out.append(128)                              # EOD
    return bytes(out)


# --- PNG predictors (/Predictor >= 10) ---------------------------------------

def _unpredict_png(data: bytes, header: bytes) -> bytes:
    cm = _COLUMNS_RE.search(header)
    columns = int(cm.group(1)) if cm else 1
    colm = _COLORS_RE.search(header)
    colors = int(colm.group(1)) if colm else 1
    bm = _BPC_RE.search(header)
    bpc = int(bm.group(1)) if bm else 8
    bpp = max(1, colors * bpc // 8)
    rowbytes = (columns * colors * bpc + 7) // 8
    if rowbytes <= 0 or len(data) % (rowbytes + 1):
        raise ValueError("pdf-pred: data not a whole number of rows")
    height = len(data) // (rowbytes + 1)
    from .raster import _unfilter

    mat = _unfilter(data, rowbytes // max(1, bpp), height, bpp)
    return mat.tobytes()


# --- the chain ----------------------------------------------------------------

def apply_stream_filters(header: bytes, data: bytes) -> bytes:
    """Decode a stream's /Filter chain; b"" on any malformed input
    (the caller's error-routing convention).  Image codecs end the
    chain with the bytes as delivered."""
    m = _FILTER_RE.search(header)
    if not m:
        return data
    names = (_NAME_RE.findall(m.group(1)) if m.group(1) is not None
             else [m.group(2)])
    em = _EARLY_RE.search(header)
    early = int(em.group(1)) if em else 1
    pm = _PRED_RE.search(header)
    predictor = int(pm.group(1)) if pm else 1
    try:
        for nm in names:
            if nm == b"FlateDecode":
                data = zlib.decompress(data)
                if predictor >= 10:
                    data = _unpredict_png(data, header)
            elif nm == b"LZWDecode":
                data = lzw_decode(data, early=early)
                if predictor >= 10:
                    data = _unpredict_png(data, header)
            elif nm == b"ASCIIHexDecode":
                data = ahx_decode(data)
            elif nm == b"ASCII85Decode":
                data = a85_decode(data)
            elif nm == b"RunLengthDecode":
                data = rl_decode(data)
            elif nm in _IMAGE_CODECS:
                break                            # raster layer's job
            else:                                # unknown filter name
                return b""
        return data
    except Exception:
        return b""


_ENCODERS = {
    "flate": (lambda d: zlib.compress(d, 6), "/FlateDecode"),
    "lzw": (lzw_encode, "/LZWDecode"),
    "a85": (a85_encode, "/ASCII85Decode"),
    "ahx": (ahx_encode, "/ASCIIHexDecode"),
    "rl": (rl_encode, "/RunLengthDecode"),
}


def encode_stream(data: bytes, spec: str) -> tuple[bytes, bytes]:
    """Writer-side inverse: ``spec`` lists filters in DECODE order
    ("a85+flate" → decoder applies ASCII85 then Flate), so encoding
    applies them right-to-left.  "flate-pred" PNG-predicts rows
    (/Columns 40, cycling filter types 0–4) before Flate.  Returns
    (encoded bytes, dictionary-entry bytes for the stream header)."""
    if spec == "flate-pred":
        cols = 40
        pad = (-len(data)) % cols
        rows = bytearray()
        prev = b"\x00" * cols
        # pad with SPACES: predictor rows are fixed-width, and a PDF
        # content stream tolerates trailing whitespace byte-identically
        padded = data + b" " * pad
        for r, i in enumerate(range(0, len(padded), cols)):
            row = padded[i: i + cols]
            ft = r % 5
            rows.append(ft)
            if ft == 0:
                rows += row
            elif ft == 1:                        # Sub
                rows += bytes((row[j] - (row[j - 1] if j else 0)) & 0xFF
                              for j in range(cols))
            elif ft == 2:                        # Up
                rows += bytes((row[j] - prev[j]) & 0xFF
                              for j in range(cols))
            elif ft == 3:                        # Average
                rows += bytes(
                    (row[j] - (((row[j - 1] if j else 0) + prev[j]) >> 1))
                    & 0xFF for j in range(cols))
            else:                                # Paeth
                enc = bytearray()
                for j in range(cols):
                    a = row[j - 1] if j else 0
                    b = prev[j]
                    c = prev[j - 1] if j else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    enc.append((row[j] - pred) & 0xFF)
                rows += enc
            prev = row
        body = zlib.compress(bytes(rows), 6)
        entry = (f" /Filter /FlateDecode /DecodeParms "
                 f"<< /Predictor 15 /Columns {cols} >>").encode()
        return body, entry
    names = []
    for part in reversed(spec.split("+")):
        enc, name = _ENCODERS[part]
        data = enc(data)
        names.append(name)
    names.reverse()                              # decode order
    joined = (names[0] if len(names) == 1
              else "[" + " ".join(names) + "]")
    return data, f" /Filter {joined}".encode()
