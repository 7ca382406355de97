"""Minimal deterministic PDF writer for synthetic fixtures (SURVEY SS2.3(b)).

The sandbox has no PDF libraries and no external data, so fixture PDFs are
emitted by this writer and parsed by core/pdf.py — the pair is closed under
the subset below (SURVEY SS7 hard part #3):

  - one content stream per page, optionally Flate-compressed
  - text via BT/ET, /F1 Tf, Td positioning, Tj show (ASCII / latin-1 only)
  - ruled tables drawn as thin ``re`` rectangles (the cell grid)
  - classic letter pages, y axis up, top margin at y=720

Page layout model (mirrored by the parser's constants in params.py):
14pt leading inside a paragraph, >=28pt gap between regions, tables as
fully ruled grids, optional two-column pages.
"""

from __future__ import annotations

import zlib

PAGE_W = 612
PAGE_H = 792
TOP_Y = 720.0
LEFT_X = 72.0
LINE_LEADING = 14.0
REGION_GAP = 32.0
CELL_W = 110.0
CELL_H = 18.0


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class PageBuilder:
    """Accumulates content-stream ops for one page, tracking a y cursor."""

    def __init__(self) -> None:
        self.ops: list[str] = []
        self.y = TOP_Y

    def text_lines(self, lines: list[str], x: float = LEFT_X) -> None:
        """A paragraph region: consecutive lines at LINE_LEADING."""
        for line in lines:
            self.ops.append(
                f"BT /F1 11 Tf {x:.1f} {self.y:.1f} Td ({_esc(line)}) Tj ET"
            )
            self.y -= LINE_LEADING
        self.y -= REGION_GAP - LINE_LEADING

    def text_lines_at(self, lines: list[str], x: float, y: float) -> None:
        """Positioned paragraph (used for the second column)."""
        for i, line in enumerate(lines):
            self.ops.append(
                f"BT /F1 11 Tf {x:.1f} {y - i * LINE_LEADING:.1f} Td "
                f"({_esc(line)}) Tj ET"
            )

    def text_lines_encoded(self, lines: list[str], cmap: dict[str, int],
                           x: float = LEFT_X) -> None:
        """Paragraph shown as hex strings under a custom single-byte code
        map (pair with build_pdf(code_map=...))."""
        for line in lines:
            self.ops.append(
                f"BT /F1 11 Tf {x:.1f} {self.y:.1f} Td "
                f"{encode_text(line, cmap)} Tj ET"
            )
            self.y -= LINE_LEADING
        self.y -= REGION_GAP - LINE_LEADING

    def text_lines_codec(self, lines: list[str], codec: str,
                         x: float = LEFT_X) -> None:
        """Paragraph shown as single-byte strings under a NAMED base
        encoding (pair with build_pdf(base_encoding='WinAnsiEncoding' /
        'MacRomanEncoding'); codec 'cp1252' / 'mac_roman') — the
        real-world Type1 form with no ToUnicode and no Differences."""
        for line in lines:
            raw = line.encode(codec, "replace").decode("latin-1")
            self.ops.append(
                f"BT /F1 11 Tf {x:.1f} {self.y:.1f} Td "
                f"({_esc(raw)}) Tj ET"
            )
            self.y -= LINE_LEADING
        self.y -= REGION_GAP - LINE_LEADING

    def text_lines_cid(self, lines: list[str], cmap: dict[str, int],
                       x: float = LEFT_X) -> None:
        """Paragraph shown as TWO-BYTE hex strings under a CID code map
        (pair with build_pdf(code_map=..., encoding_style='cid'))."""
        for line in lines:
            self.ops.append(
                f"BT /F1 11 Tf {x:.1f} {self.y:.1f} Td "
                f"{encode_text_cid(line, cmap)} Tj ET"
            )
            self.y -= LINE_LEADING
        self.y -= REGION_GAP - LINE_LEADING

    def table(self, rows: list[list[str]], x: float = LEFT_X) -> None:
        """Fully ruled cell grid + cell text — the reference's tabular case."""
        n_rows = len(rows)
        n_cols = max(len(r) for r in rows) if rows else 0
        top = self.y
        w = n_cols * CELL_W
        h = n_rows * CELL_H
        # horizontal rulings (n_rows+1), thin rects
        for r in range(n_rows + 1):
            yy = top - r * CELL_H
            self.ops.append(f"{x:.1f} {yy:.1f} {w:.1f} 0.5 re f")
        # vertical rulings (n_cols+1)
        for c in range(n_cols + 1):
            xx = x + c * CELL_W
            self.ops.append(f"{xx:.1f} {top - h:.1f} 0.5 {h:.1f} re f")
        # cell text, baseline 5pt above cell bottom, 3pt right inset
        for r, row in enumerate(rows):
            for c, cell in enumerate(row):
                cx = x + c * CELL_W + 3.0
                cy = top - (r + 1) * CELL_H + 5.0
                self.ops.append(
                    f"BT /F1 10 Tf {cx:.1f} {cy:.1f} Td ({_esc(cell)}) Tj ET"
                )
        self.y = top - h - REGION_GAP

    def content(self) -> bytes:
        return "\n".join(self.ops).encode("latin-1", "replace")


# --- non-ASCII text via single-byte custom encodings (round 3) --------------
# Closed under core/pdf.py's ToUnicode + /Differences subset: non-ASCII
# chars get codes 128.. and the mapping is declared either as a ToUnicode
# CMap stream (bfrange identity for ASCII + bfchar per custom code) or as
# an /Encoding /Differences array of uniXXXX glyph names.

def make_code_map(texts: list[str]) -> dict[str, int]:
    """char → single-byte code: printable ASCII is identity, every other
    char takes the next free code from 128 (deterministic: sorted)."""
    cmap: dict[str, int] = {}
    nxt = 128
    for ch in sorted({c for t in texts for c in t}):
        if 32 <= ord(ch) < 127:
            cmap[ch] = ord(ch)
        else:
            if nxt > 255:
                raise ValueError("more than 128 distinct non-ASCII chars")
            cmap[ch] = nxt
            nxt += 1
    return cmap


def encode_text(s: str, cmap: dict[str, int]) -> str:
    """Hex-string form of ``s`` under the custom code map."""
    return "<" + "".join(f"{cmap[c]:02x}" for c in s) + ">"


def make_cid_map(texts: list[str]) -> dict[str, int]:
    """char → TWO-BYTE code (Type0/CID fonts, the real-PDF CJK case):
    every distinct char takes the next code from 0x0100 (deterministic:
    sorted), leaving the low range unused so a decoder that wrongly
    reads single bytes produces visible mojibake, not silent overlap."""
    cmap: dict[str, int] = {}
    nxt = 0x0100
    for ch in sorted({c for t in texts for c in t}):
        if nxt > 0xFFFF:
            raise ValueError("more than 65279 distinct chars")
        cmap[ch] = nxt
        nxt += 1
    return cmap


def encode_text_cid(s: str, cmap: dict[str, int]) -> str:
    """Hex-string form of ``s`` under the two-byte code map."""
    return "<" + "".join(f"{cmap[c]:04x}" for c in s) + ">"


def tounicode_cmap_cid(cmap: dict[str, int]) -> bytes:
    """Two-byte ToUnicode CMap: <0000><ffff> codespace; contiguous
    (code, unicode) runs emit bfrange triples (exercising the 2-byte
    range path), the rest bfchar entries."""
    pairs = sorted((code, ch) for ch, code in cmap.items())
    runs: list[list[tuple[int, str]]] = []
    for code, ch in pairs:
        if (runs and code == runs[-1][-1][0] + 1
                and ord(ch) == ord(runs[-1][-1][1]) + 1):
            runs[-1].append((code, ch))
        else:
            runs.append([(code, ch)])
    ranges = [r for r in runs if len(r) >= 2]
    chars = [rc for r in runs if len(r) < 2 for rc in r]
    lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin begincmap",
        "1 begincodespacerange <0000> <ffff> endcodespacerange",
    ]
    if ranges:
        lines.append(f"{len(ranges)} beginbfrange")
        for r in ranges:
            lo, hi = r[0][0], r[-1][0]
            dst = r[0][1].encode("utf-16-be").hex()
            lines.append(f"<{lo:04x}> <{hi:04x}> <{dst}>")
        lines.append("endbfrange")
    if chars:
        lines.append(f"{len(chars)} beginbfchar")
        for code, ch in chars:
            dst = ch.encode("utf-16-be").hex()
            lines.append(f"<{code:04x}> <{dst}>")
        lines.append("endbfchar")
    lines += ["endcmap end end"]
    return "\n".join(lines).encode("ascii")


def tounicode_cmap(cmap: dict[str, int]) -> bytes:
    """Minimal ToUnicode CMap: ASCII identity bfrange + one bfchar per
    custom code (UTF-16BE destinations)."""
    chars = [(code, ch) for ch, code in sorted(cmap.items(),
                                               key=lambda kv: kv[1])
             if code >= 128]
    lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin begincmap",
        "1 begincodespacerange <00> <ff> endcodespacerange",
        "1 beginbfrange <20> <7e> <0020> endbfrange",
    ]
    if chars:
        lines.append(f"{len(chars)} beginbfchar")
        for code, ch in chars:
            dst = ch.encode("utf-16-be").hex()
            lines.append(f"<{code:02x}> <{dst}>")
        lines.append("endbfchar")
    lines += ["endcmap end end"]
    return "\n".join(lines).encode("ascii")


def differences_array(cmap: dict[str, int]) -> str:
    """/Differences entry naming each custom code as uniXXXX."""
    parts = []
    prev = None
    for code, ch in sorted(((code, ch) for ch, code in cmap.items()
                            if code >= 128)):
        if prev is None or code != prev + 1:
            parts.append(str(code))
        parts.append(f"/uni{ord(ch):04X}")
        prev = code
    return "[ " + " ".join(parts) + " ]"


def build_pdf(pages: list[PageBuilder], compress: bool | str = False,
              code_map: dict[str, int] | None = None,
              encoding_style: str = "tounicode",
              base_encoding: str | None = None,
              encrypt: str | bool = False,
              as_form: bool = False,
              split_contents: bool = False) -> bytes:
    """Assemble a complete PDF with xref table and trailer.

    ``compress``: False = plain streams; True = /FlateDecode; or a
    filter spec string for ``pdf_filters.encode_stream`` ("lzw",
    "a85+flate", "ahx", "rl", "flate-pred", ...) — content streams
    round-trip through core/pdf.py's filter chain either way.

    ``code_map``: char→code map; when given, /F1 becomes a custom font
    whose mapping is declared per ``encoding_style`` — 'tounicode'
    (single-byte CMap stream, pair with ``make_code_map``),
    'differences' (/Encoding /Differences with uniXXXX names), or 'cid'
    (Type0/Identity-H with a TWO-BYTE ToUnicode CMap, pair with
    ``make_cid_map`` + ``text_lines_cid``).  Content built with the
    matching encoder then round-trips through core/pdf.py as unicode.
    """
    objects: list[bytes] = []  # 1-indexed object bodies (without N 0 obj wrapper)
    n_pages = len(pages)
    if as_form and split_contents:
        raise ValueError("as_form and split_contents are exclusive")
    per_page = 3 if (as_form or split_contents) else 2
    font_num = 3 + per_page * n_pages
    kids = " ".join(f"{3 + per_page * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2

    def stream_obj(data: bytes, extra: bytes = b"") -> bytes:
        if compress:
            from .pdf_filters import encode_stream

            spec = "flate" if compress is True else compress
            data, entry = encode_stream(data, spec)
            head = (f"<< /Length {len(data)}".encode() + extra + entry
                    + b" >>")
        else:
            head = f"<< /Length {len(data)}".encode() + extra + b" >>"
        return head + b"\nstream\n" + data + b"\nendstream"

    for i, page in enumerate(pages):
        content_num = 4 + per_page * i
        if as_form:
            # M10k: the page's entire content lives in a /Subtype /Form
            # XObject invoked via Do — the real-world generator shape
            # (letterheads, stamps, whole-page forms) whose text the
            # reader splices in place (core/pdf.py _expand_forms)
            form_num = 5 + per_page * i
            objects.append(
                (
                    f"<< /Type /Page /Parent 2 0 R "
                    f"/MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                    f"/Contents {content_num} 0 R "
                    f"/Resources << /Font << /F1 {font_num} 0 R >> "
                    f"/XObject << /Fm0 {form_num} 0 R >> >> >>"
                ).encode()
            )
            objects.append(stream_obj(b"q /Fm0 Do Q"))
            objects.append(stream_obj(
                page.content(),
                (f" /Type /XObject /Subtype /Form "
                 f"/BBox [0 0 {PAGE_W} {PAGE_H}] "
                 f"/Resources << /Font << /F1 {font_num} 0 R >> >>"
                 ).encode()))
            continue
        if split_contents:
            # M10l: /Contents as a two-stream ARRAY — the multi-stream
            # page shape real generators emit; streams concatenate in
            # array order (PDF 32000-1 §7.8.2)
            data = page.content()
            cut = data.find(b"ET", len(data) // 2)
            cut = cut + 2 if cut >= 0 else len(data)
            objects.append(
                (
                    f"<< /Type /Page /Parent 2 0 R "
                    f"/MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                    f"/Contents [{content_num} 0 R {content_num + 1} 0 R] "
                    f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
                ).encode()
            )
            objects.append(stream_obj(data[:cut]))
            objects.append(stream_obj(data[cut:].lstrip()))
            continue
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                f"/Contents {content_num} 0 R "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        objects.append(stream_obj(page.content()))
    if code_map is None and base_encoding is not None:
        # named base encoding, no ToUnicode/Differences — pair with
        # PageBuilder.text_lines_codec (VERDICT r4 Missing #5)
        if base_encoding not in ("WinAnsiEncoding", "MacRomanEncoding"):
            raise ValueError(f"unknown base_encoding {base_encoding!r}")
        objects.append(
            (f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
             f"/Encoding /{base_encoding} >>").encode())
    elif code_map is None:
        objects.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )  # font
    elif encoding_style == "tounicode":
        cmap_data = tounicode_cmap(code_map)
        objects.append(
            (f"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
             f"/ToUnicode {font_num + 1} 0 R >>").encode())
        objects.append(
            f"<< /Length {len(cmap_data)} >>".encode()
            + b"\nstream\n" + cmap_data + b"\nendstream")
    elif encoding_style == "differences":
        objects.append(
            (f"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
             f"/Encoding << /Type /Encoding /Differences "
             f"{differences_array(code_map)} >> >>").encode())
    elif encoding_style == "cid":
        cmap_data = tounicode_cmap_cid(code_map)
        objects.append(
            (f"<< /Type /Font /Subtype /Type0 /BaseFont /Custom "
             f"/Encoding /Identity-H "
             f"/DescendantFonts [{font_num + 2} 0 R] "
             f"/ToUnicode {font_num + 1} 0 R >>").encode())
        objects.append(
            f"<< /Length {len(cmap_data)} >>".encode()
            + b"\nstream\n" + cmap_data + b"\nendstream")
        objects.append(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Custom "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> >>")
    else:
        raise ValueError(f"unknown encoding_style {encoding_style!r}")

    return _assemble_pdf(objects, encrypt=encrypt)


_ENCRYPT_SPECS = {  # spec → (V, R, key bits)
    "rc4-40": (1, 2, 40),
    "rc4-128": (2, 3, 128),
    "aes-128": (4, 4, 128),
    "aes-256": (5, 6, 256),  # PDF 2.0 /AESV3; ~0.7s/file (Alg 2.B ×4)
}

_LENGTH_SUB_RE = None  # lazy-compiled in _encrypt_objects


def _encrypt_objects(objects: list[bytes],
                     spec: str) -> tuple[list[bytes], bytes]:
    """Encrypt every stream body in place (M10f/M10g writer half).

    Returns (objects + the /Encrypt dict appended, trailer additions).
    Encryption is the OUTERMOST layer — applied after filter encoding,
    mirroring core/pdf.py's decrypt-then-defilter order.  RC4 preserves
    length so every already-written direct /Length stays valid; AES
    (IV prefix + PKCS#7 padding) grows the stream, so the header's
    direct /Length is REWRITTEN to the ciphertext size (the spec's
    /Length is the file-bytes length, post-encryption).  Uses empty
    owner AND user passwords (the dominant real-crawl case this subset
    exists to exercise); /P -4 (all permissions); AES IVs derived
    deterministically from (file ID, object number) so fixtures stay
    byte-reproducible.
    """
    import re as _re
    from hashlib import md5

    from .pdf_crypt import file_key, object_key, owner_value, rc4, user_value

    global _LENGTH_SUB_RE
    if _LENGTH_SUB_RE is None:
        _LENGTH_SUB_RE = _re.compile(rb"/Length\s+\d+")

    v, rev, bits = _ENCRYPT_SPECS[spec]
    aes = spec in ("aes-128", "aes-256")
    key_bytes = bits // 8
    id0 = md5(b"".join(objects)).digest()  # deterministic fixture ID
    p = -4
    if spec == "aes-256":
        # R6: the file key is random per spec — here derived from the
        # file ID so fixtures stay byte-reproducible; /U //UE //O //OE
        # per ISO 32000-2 Algorithms 8/9, /Perms per Algorithm 10
        import hashlib as _hl

        from .pdf_crypt import hash_2b

        fkey = _hl.sha256(id0 + b"filekey").digest()
        vs_u = _hl.sha256(id0 + b"vsu").digest()[:8]
        ks_u = _hl.sha256(id0 + b"ksu").digest()[:8]
        vs_o = _hl.sha256(id0 + b"vso").digest()[:8]
        ks_o = _hl.sha256(id0 + b"kso").digest()[:8]
        from .aes import cbc_encrypt, encrypt_block

        u_val = hash_2b(b"", vs_u) + vs_u + ks_u
        ue_val = cbc_encrypt(hash_2b(b"", ks_u), b"\x00" * 16, fkey,
                             pad=False)
        o_val = hash_2b(b"", vs_o, u_val) + vs_o + ks_o
        oe_val = cbc_encrypt(hash_2b(b"", ks_o, u_val), b"\x00" * 16,
                             fkey, pad=False)
        import struct as _struct

        perms_plain = (_struct.pack("<i", p) + b"\xff\xff\xff\xff"
                       + b"Tadb" + b"\x00" * 4)
        perms = encrypt_block(fkey, perms_plain)
        extra_entries = (f" /OE <{oe_val.hex()}> /UE <{ue_val.hex()}>"
                         f" /Perms <{perms.hex()}>")
        cfm = "/AESV3"
        cf_len = 32
    else:
        o_val = owner_value(b"", b"", rev, key_bytes)
        fkey = file_key(o_val, p, id0, rev, key_bytes)
        u_val = user_value(fkey, id0, rev)
        extra_entries = ""
        cfm = "/AESV2"
        cf_len = 16
    out: list[bytes] = []
    for num, body in enumerate(objects, start=1):
        sk = body.find(b"\nstream\n")
        if sk != -1:
            data_start = sk + len(b"\nstream\n")
            data_end = body.rfind(b"\nendstream")
            plain = body[data_start:data_end]
            if aes:
                from .aes import cbc_encrypt

                iv = md5(id0 + num.to_bytes(4, "little")).digest()
                key = (fkey if spec == "aes-256"
                       else object_key(fkey, num, aes=True))
                data = iv + cbc_encrypt(key, iv, plain)
                header = _LENGTH_SUB_RE.sub(
                    b"/Length " + str(len(data)).encode(),
                    body[:sk], count=1)
            else:
                data = rc4(object_key(fkey, num), plain)
                header = body[:sk]
            body = header + b"\nstream\n" + data + body[data_end:]
        out.append(body)
    cf = (f" /CF << /StdCF << /CFM {cfm} /Length {cf_len} >> >> "
          "/StmF /StdCF /StrF /StdCF" if aes else "")
    out.append(
        (f"<< /Filter /Standard /V {v} /R {rev} /Length {bits}{cf} "
         f"/P {p} /O <{o_val.hex()}> /U <{u_val.hex()}>"
         f"{extra_entries} >>").encode())
    trailer_extra = (
        f" /Encrypt {len(out)} 0 R /ID [<{id0.hex()}> <{id0.hex()}>]"
    ).encode()
    return out, trailer_extra


def _assemble_pdf(objects: list[bytes],
                  encrypt: str | bool = False) -> bytes:
    """Serialize 1-indexed object bodies + xref table + trailer.

    ``encrypt``: False, or "rc4-40" / "rc4-128" (True = "rc4-128") —
    standard security handler, empty user password (see pdf_crypt.py).
    """
    trailer_extra = b""
    if encrypt:
        spec = "rc4-128" if encrypt is True else encrypt
        objects, trailer_extra = _encrypt_objects(objects, spec)
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    n_obj = len(objects) + 1
    out += f"xref\n0 {n_obj}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_obj} /Root 1 0 R".encode() + trailer_extra
        + f" >>\nstartxref\n{xref_pos}\n%%EOF\n".encode()
    )
    return bytes(out)


def build_image_pdf(images: list[tuple[int, int, bytes]],
                    image_filter: str = "flate",
                    encrypt: str | bool = False,
                    inline: bool = False) -> bytes:
    """A 'scanned' PDF: one page per (w, h, grayscale raster), each an
    /XObject /Image (8-bit /DeviceGray) drawn full-page — the shape of
    a real scanned-document crawl PDF, closing the loop for the
    scanned-table OCR pipeline (functions/table_image.py reads the
    tables back out of the extracted images).  ``image_filter``:
    'flate' (lossless zlib), 'dct' (baseline JPEG via core/jpeg.py,
    flat quant = near-lossless ±2 — REAL scanned PDFs are
    DCT-compressed) or 'dct-prog' (progressive JPEG).

    ``inline=True`` embeds each raster as a BI/ID/EI inline image with
    abbreviated dict keys (PDF 32000-1 §8.9.7) inside the page content
    stream instead of an XObject — the form small real-world scans take
    — exercising ``core/pdf.py split_inline_images`` end to end."""
    objects: list[bytes] = []
    n_pages = len(images)
    per_page = 2 if inline else 3
    kids = " ".join(f"{3 + per_page * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")          # 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i, (w, h, gray) in enumerate(images):
        page_num = 3 + per_page * i
        content_num = page_num + 1
        if image_filter == "flate":
            data = zlib.compress(gray, 6)
            filt, abbrev = "/FlateDecode", "/Fl"
        elif image_filter in ("dct", "dct-prog"):
            from .jpeg import encode_jpeg

            data = encode_jpeg(w, h, gray, subsampling="gray",
                               progressive=image_filter == "dct-prog")
            filt, abbrev = "/DCTDecode", "/DCT"
        elif image_filter == "raw" and inline:
            data, filt, abbrev = gray, "", ""
        elif image_filter == "jbig2":
            # round 5 (M42): MQ-coded generic region; scan rasters are
            # strictly 0/255 so binarize→JBIG2 is LOSSLESS like G4
            import numpy as np

            from .jbig2 import encode_jbig2_embedded

            bits = (np.frombuffer(gray, np.uint8).reshape(h, w)
                    < 128).astype(np.uint8)
            data = encode_jbig2_embedded(bits)
            filt, abbrev = "/JBIG2Decode", ""
        elif image_filter in ("ccitt", "ccitt-ba"):
            # the real scanned-document codec: 1-bit G4/MMR (round 4,
            # M30); scan rasters are strictly 0/255 so binarize->G4 is
            # LOSSLESS and the OCR route reads back identical bytes
            import numpy as np

            from .ccitt import encode_g4

            ba = image_filter == "ccitt-ba"
            bits = (np.frombuffer(gray, np.uint8).reshape(h, w)
                    < 128).astype(np.uint8)
            data = encode_g4(bits, byte_align=ba)
            filt, abbrev = "/CCITTFaxDecode", "/CCF"
        else:
            raise ValueError(f"unknown image_filter {image_filter!r}")
        ccitt = image_filter.startswith("ccitt")
        if image_filter == "jbig2" and inline:
            raise ValueError("jbig2: not a permitted inline-image filter "
                             "(PDF 32000-1 Table 94)")
        bpc = 1 if (ccitt or image_filter == "jbig2") else 8
        dparms = ""
        if ccitt:
            ba_part = (" /EncodedByteAlign true"
                       if image_filter == "ccitt-ba" else "")
            dparms = (f" /DecodeParms << /K -1 /Columns {w} /Rows {h}"
                      f"{ba_part} >>")
        if inline:
            fpart = f" /F {abbrev} /L {len(data)}" if abbrev else ""
            if ccitt:
                fpart += dparms.replace("/DecodeParms", "/DP")
            content = (
                f"q {PAGE_W} 0 0 {PAGE_H} 0 0 cm "
                f"BI /W {w} /H {h} /BPC {bpc} /CS /G{fpart} ID\n".encode()
                + data + b"\nEI Q")
            objects.append(
                (f"<< /Type /Page /Parent 2 0 R "
                 f"/MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                 f"/Contents {content_num} 0 R >>").encode())
            objects.append(
                f"<< /Length {len(content)} >>".encode()
                + b"\nstream\n" + content + b"\nendstream")
            continue
        image_num = page_num + 2
        objects.append(
            (f"<< /Type /Page /Parent 2 0 R "
             f"/MediaBox [0 0 {PAGE_W} {PAGE_H}] "
             f"/Contents {content_num} 0 R "
             f"/Resources << /XObject << /Im1 {image_num} 0 R >> >> >>"
             ).encode())
        content = (f"q {PAGE_W} 0 0 {PAGE_H} 0 0 cm /Im1 Do Q"
                   ).encode()
        objects.append(
            f"<< /Length {len(content)} >>".encode()
            + b"\nstream\n" + content + b"\nendstream")
        objects.append(
            (f"<< /Type /XObject /Subtype /Image /Width {w} "
             f"/Height {h} /ColorSpace /DeviceGray /BitsPerComponent {bpc} "
             f"/Length {len(data)} /Filter {filt}{dparms} >>").encode()
            + b"\nstream\n" + data + b"\nendstream")
    return _assemble_pdf(objects, encrypt=encrypt)
