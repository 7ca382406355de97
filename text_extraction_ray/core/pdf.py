"""From-scratch PDF layout parser (SURVEY.md SS2.2 M10, SS2.3(b)).

Echoes the reference's noisy-image tabular extraction via cell-grid
detection (BASELINE.json north_star): positioned text runs are collected
from page content streams, ruling lines are detected from thin ``re``
rectangles, >=2 horizontal x >=2 vertical rulings form a table region whose
cells are filled by snapping runs into the grid (rows top->bottom, cells
left->right, tab-joined); remaining runs become text regions via
y-clustering with reading-order reconstruction (two-column aware).

Stdlib only (re + zlib).  Pure function of the payload bytes — shared by
the oracle and the Ray actor pool, so per-url byte-identity holds.

Supported subset (round 2 widened toward real-crawl PDFs, VERDICT r1
'Missing' #5): direct AND indirect (``N 0 R``) /Length, /FlateDecode,
object streams (/Type /ObjStm — embedded dictionary objects are expanded
so fully-compressed PDFs resolve their page tree), xref-stream files
(tolerated: the linear object scan never needs the xref table, and
/XRef / /ObjStm binary streams are excluded from the BT-containing
last-resort heuristic), BT/ET Td/TD/Tm/T* Tj/TJ, ``re`` + f/S.  Anything
else degrades gracefully (runs are simply skipped).
"""

from __future__ import annotations

import re
import zlib

from ..params import (
    JOINER,
    PDF_CELL_JOIN,
    PDF_COLUMN_GAP,
    PDF_LINE_MAX_THICKNESS,
    PDF_PARA_GAP,
    PDF_ROW_JOIN,
    PDF_Y_CLUSTER_TOL,
)

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_LENGTH_IND_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R")
_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
# array form (M10l): /Contents [4 0 R 7 0 R] — streams CONCATENATE in
# array order with whitespace between (PDF 32000-1 §7.8.2: the division
# into streams is a storage artifact, the content is one stream)
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")

_NUM = r"[-+]?\d*\.?\d+"
_TOKEN_RE = re.compile(
    r"\((?:[^()\\]|\\.)*\)"          # literal string
    r"|<[0-9a-fA-F\s]*>"              # hex string
    r"|/[A-Za-z0-9#._\-]+"            # name
    r"|" + _NUM +                      # number
    r"|\[|\]"
    r"|[A-Za-z'\"*]+"                 # operator
)
_STR_ESC_RE = re.compile(r"\\([nrtbf()\\]|[0-7]{1,3})")

_ESC_MAP = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
            "(": "(", ")": ")", "\\": "\\"}


def _unescape_pdf_string(s: str) -> str:
    def repl(m: re.Match) -> str:
        g = m.group(1)
        if g in _ESC_MAP:
            return _ESC_MAP[g]
        return chr(int(g, 8) & 0xFF)
    return _STR_ESC_RE.sub(repl, s)


# --- font encodings: ToUnicode CMaps + /Differences (round 3/4) --------------
# Round 3 (VERDICT-r2 next #5): single-byte ToUnicode bfchar/bfrange
# entries (UTF-16BE destinations) and /Encoding /Differences with
# uniXXXX/uXXXX or common-AGL glyph names.  Round 4 (VERDICT-r3 next
# #7): TWO-BYTE codes — Type0/CID fonts (the common real-PDF case for
# CJK) whose ToUnicode CMap declares <0000><FFFF>-style codespaces and
# 4-hex-digit bfchar/bfrange sources; show strings then decode in
# 2-byte code units.  Fonts with no usable map keep the latin-1
# passthrough, exactly as before.

_FONT_DICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONT_BIND_RE = re.compile(rb"/([A-Za-z0-9#._\-]+)\s+(\d+)\s+\d+\s+R")
_TOUNI_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_ENC_REF_RE = re.compile(rb"/Encoding\s+(\d+)\s+\d+\s+R")
_DIFF_RE = re.compile(rb"/Differences\s*\[(.*?)\]", re.S)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_CODESPACE_RE = re.compile(
    rb"begincodespacerange(.*?)endcodespacerange", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_TOK_RE = re.compile(rb"<([0-9a-fA-F]+)>")
_BFRANGE_ARR_RE = re.compile(
    rb"<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*\[((?:\s*<[0-9a-fA-F]+>)+)\s*\]")
_BFRANGE_TRIPLE_RE = re.compile(
    rb"<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>")
_DIFF_TOK_RE = re.compile(rb"(\d+)|/([A-Za-z0-9#._\-]+)")

# tiny Adobe-Glyph-List subset: enough for Latin accents the synthetic
# corpus and common European crawl text use; uniXXXX names cover the rest
_AGL_SUBSET = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "ampersand": "&", "quotesingle": "'", "parenleft": "(",
    "parenright": ")", "comma": ",", "hyphen": "-", "period": ".",
    "eacute": "é", "egrave": "è", "ecircumflex": "ê",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "adieresis": "ä", "ccedilla": "ç", "ntilde": "ñ",
    "odieresis": "ö", "oacute": "ó", "ucircumflex": "û",
    "udieresis": "ü", "uacute": "ú", "igrave": "ì",
    "iacute": "í", "idieresis": "ï", "oslash": "ø",
    "aring": "å", "ae": "æ", "germandbls": "ß",
    "Eacute": "É", "Agrave": "À", "Ccedilla": "Ç",
    "Odieresis": "Ö", "Udieresis": "Ü", "Adieresis": "Ä",
    "euro": "€", "bullet": "•", "emdash": "—",
    "endash": "–", "quotedblleft": "“",
    "quotedblright": "”", "quoteleft": "‘",
    "quoteright": "’",
}


def _glyph_to_char(name: str) -> str | None:
    """Glyph name → unicode: uniXXXX / uXXXX[XX] forms, AGL subset,
    single-char names map to themselves."""
    if name.startswith("uni") and len(name) == 7:
        try:
            return chr(int(name[3:], 16))
        except ValueError:
            return None
    if name.startswith("u") and len(name) in (5, 7):
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            pass
    if name in _AGL_SUBSET:
        return _AGL_SUBSET[name]
    if len(name) == 1:
        return name
    return None


def _utf16be(hexs: bytes) -> str:
    h = hexs.decode("ascii")
    if len(h) % 4:
        h = h.ljust((len(h) + 3) // 4 * 4, "0")
    try:
        return bytes.fromhex(h).decode("utf-16-be", "ignore")
    except ValueError:
        return ""


class _CodeMap(dict):
    """code → unicode map; ``two_byte`` selects the show-string code
    unit (1 byte for simple fonts, 2 for Type0/CID)."""

    two_byte = False


_RANGE_CAP = 1 << 16   # defensive bound on bfrange expansion


def _parse_tounicode(data: bytes) -> "_CodeMap":
    """bfchar/bfrange blocks → {code: unicode str}.  The code width is
    inferred from the declared codespace and the source token widths:
    any source wider than 2 hex digits marks the font two-byte."""
    cmap = _CodeMap()
    two = False
    for blk in _CODESPACE_RE.finditer(data):
        for tok in _HEX_TOK_RE.findall(blk.group(1)):
            if len(tok) > 2:
                two = True
    max_code = 0xFFFF if two else 0xFF

    def note_width(tok: bytes) -> None:
        nonlocal two, max_code
        if len(tok) > 2 and not two:
            two = True
            max_code = 0xFFFF

    for blk in _BFRANGE_RE.finditer(data):
        body = blk.group(1)
        for am in _BFRANGE_ARR_RE.finditer(body):
            note_width(am.group(1))
            lo, hi = int(am.group(1), 16), int(am.group(2), 16)
            dsts = _HEX_TOK_RE.findall(am.group(3))
            for i, d in enumerate(dsts):
                if lo + i <= hi and lo + i <= max_code:
                    cmap[lo + i] = _utf16be(d)
        body_wo_arrays = _BFRANGE_ARR_RE.sub(b"", body)
        for tm in _BFRANGE_TRIPLE_RE.finditer(body_wo_arrays):
            note_width(tm.group(1))
            lo, hi = int(tm.group(1), 16), int(tm.group(2), 16)
            base = _utf16be(tm.group(3))
            if not base or hi < lo:
                continue
            start = ord(base[-1])
            for code in range(lo, min(hi, max_code, lo + _RANGE_CAP) + 1):
                cmap[code] = base[:-1] + chr(start + code - lo)
    for blk in _BFCHAR_RE.finditer(data):
        hexes = _HEX_TOK_RE.findall(blk.group(1))
        for src, dst in zip(hexes[0::2], hexes[1::2]):
            note_width(src)
            code = int(src, 16)
            if code <= max_code:
                cmap[code] = _utf16be(dst)
    cmap.two_byte = two
    return cmap


_NAMED_ENC_RE = re.compile(
    rb"/(?:Base)?Encoding\s*/(WinAnsiEncoding|MacRomanEncoding)")


def _named_encoding_map(token: bytes) -> dict[int, str]:
    """Standard named single-byte encodings (PDF 32000-1 Annex D) for
    fonts that declare a base encoding with no /Differences and no
    /ToUnicode — the common real-world Type1 case (VERDICT r4 Missing
    #5).  WinAnsiEncoding is cp1252; MacRomanEncoding is the stdlib
    mac_roman table (one historic divergence: 0xDB reads as the euro
    sign, matching post-8.5 Mac OS Roman — Annex D's original table had
    the currency sign there).  Only 0x80..0xFF entries are emitted:
    ASCII is the identity under both, same as the latin-1 passthrough."""
    codec = "cp1252" if token == b"WinAnsiEncoding" else "mac_roman"
    out: dict[int, str] = {}
    for b in range(128, 256):
        try:
            out[b] = bytes([b]).decode(codec)
        except UnicodeDecodeError:
            continue                   # cp1252 holes keep passthrough
    return out


def _parse_differences(enc_body: bytes) -> dict[int, str]:
    """/Differences [ code /name /name code /name ... ] → byte map."""
    dm = _DIFF_RE.search(enc_body)
    if not dm:
        return {}
    cmap: dict[int, str] = {}
    code = 0
    for tok in _DIFF_TOK_RE.finditer(dm.group(1)):
        if tok.group(1) is not None:
            code = int(tok.group(1))
            continue
        ch = _glyph_to_char(tok.group(2).decode("ascii", "replace"))
        if ch is not None and code <= 0xFF:
            cmap[code] = ch
        code += 1
    return cmap


def _font_maps(objects: dict[int, tuple[bytes, bytes | None]]
               ) -> dict[str, dict[int, str]]:
    """Resource font name ('/F1') → byte-code→unicode map, for every font
    bound in any /Font resource dict.  ToUnicode wins over /Differences
    (the PDF spec's own precedence for text extraction); fonts with
    neither get no entry and keep the latin-1 passthrough."""
    binds: dict[str, int] = {}
    for _num, (hdr, _s) in sorted(objects.items()):
        for fm in _FONT_DICT_RE.finditer(hdr):
            for bm in _FONT_BIND_RE.finditer(fm.group(1)):
                binds[bm.group(1).decode("ascii", "replace")] = \
                    int(bm.group(2))
    maps: dict[str, dict[int, str]] = {}
    for name, onum in binds.items():
        if onum not in objects:
            continue
        fhdr = objects[onum][0]
        cmap: dict[int, str] = {}
        tm = _TOUNI_RE.search(fhdr)
        if tm and int(tm.group(1)) in objects:
            cmap = _parse_tounicode(objects[int(tm.group(1))][1] or b"")
        if not cmap:
            em = _ENC_REF_RE.search(fhdr)
            enc_body = (objects[int(em.group(1))][0]
                        if em and int(em.group(1)) in objects else fhdr)
            # base named encoding first (/Encoding /WinAnsiEncoding
            # direct, or /BaseEncoding inside an /Encoding dict), then
            # /Differences overlays it — the spec's own layering
            nm = (_NAMED_ENC_RE.search(enc_body)
                  or _NAMED_ENC_RE.search(fhdr))
            cmap = _named_encoding_map(nm.group(1)) if nm else {}
            cmap.update(_parse_differences(enc_body))
        if cmap:
            maps["/" + name] = cmap
    return maps


def _parse_objects(payload: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """Scan ``N g obj ... endobj`` bodies → {num: (header, stream_bytes)}.

    Uses /Length to slice streams exactly, so binary stream data can never
    be misread as markup.  Tolerates a truncated trailing object.

    Encrypted files (M10f): when the trailer names a standard-security
    /Encrypt dict openable with the EMPTY user password, each raw stream
    slice is RC4-decrypted with its per-object key BEFORE filters run
    (spec order, PDF 1.7 §7.6.2); files needing a real password or an
    unsupported handler parse on the raw bytes and degrade as before.
    """
    decryptor = None
    if b"/Encrypt" in payload:
        from .pdf_crypt import build_decryptor

        decryptor = build_decryptor(payload)
    objects: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    n = len(payload)
    while pos < n:
        m = _OBJ_RE.search(payload, pos)
        if not m:
            break
        num = int(m.group(1))
        body_start = m.end()
        sk = payload.find(b"stream", body_start)
        ek = payload.find(b"endobj", body_start)
        if sk != -1 and (ek == -1 or sk < ek):
            header = payload[body_start:sk]
            lm = _LENGTH_RE.search(header)
            data_start = sk + len(b"stream")
            if payload[data_start : data_start + 2] == b"\r\n":
                data_start += 2
            elif payload[data_start : data_start + 1] == b"\n":
                data_start += 1
            length = None
            if lm:
                length = int(lm.group(1))
            else:
                im = _LENGTH_IND_RE.search(header)
                if im:  # indirect /Length N 0 R → resolve the int object
                    length = _resolve_int_object(payload, int(im.group(1)))
            if length is not None:
                data = payload[data_start : data_start + length]
                tail = payload.find(b"endobj", data_start + length)
                pos = tail + 6 if tail != -1 else n
            else:  # no usable length: scan for endstream
                es = payload.find(b"endstream", data_start)
                data = payload[data_start : es if es != -1 else n]
                tail = payload.find(b"endobj", es if es != -1 else n)
                pos = tail + 6 if tail != -1 else n
            if decryptor is not None:
                data = decryptor.decrypt(num, data)
            if b"/Filter" in header:
                from .pdf_filters import apply_stream_filters

                data = apply_stream_filters(header, data)
            elif b"/FlateDecode" in header:      # pre-round-4 tolerance:
                try:                             # Flate named outside a
                    data = zlib.decompress(data)  # /Filter entry
                except zlib.error:
                    data = b""
            objects[num] = (header, data)
        else:
            header = payload[body_start : ek if ek != -1 else n]
            objects[num] = (header, None)
            pos = ek + 6 if ek != -1 else n
    _expand_object_streams(objects)
    return objects


def _resolve_int_object(payload: bytes, num: int) -> int | None:
    """Value of ``num g obj <int> endobj`` (indirect /Length target)."""
    m = re.search(
        rb"(?<![0-9])" + str(num).encode()
        + rb"\s+\d+\s+obj\s*(\d+)\s*endobj", payload)
    return int(m.group(1)) if m else None


def _expand_object_streams(
        objects: dict[int, tuple[bytes, bytes | None]]) -> None:
    """Unpack /Type /ObjStm members (PDF 1.5 compressed object streams):
    the decoded stream holds ``num offset`` pairs then the object bodies
    (dictionaries only, per spec) — each becomes a header-only entry so
    fully-compressed page trees resolve.  Existing entries win."""
    for onum, (hdr, data) in list(objects.items()):
        if b"/ObjStm" not in hdr or not data:
            continue
        nm = _OBJSTM_N_RE.search(hdr)
        fm = _OBJSTM_FIRST_RE.search(hdr)
        if not nm or not fm:
            continue
        count, first = int(nm.group(1)), int(fm.group(1))
        pairs_raw = data[:first].split()
        if len(pairs_raw) < 2 * count:
            continue
        try:
            nums = [int(pairs_raw[2 * i]) for i in range(count)]
            offs = [int(pairs_raw[2 * i + 1]) for i in range(count)]
        except ValueError:
            continue
        for i, (sub_num, off) in enumerate(zip(nums, offs)):
            end = offs[i + 1] if i + 1 < count else len(data) - first
            body = data[first + off : first + end]
            if sub_num not in objects:
                objects[sub_num] = (body, None)


_XOBJ_REF_RE = re.compile(rb"/([A-Za-z0-9#._\-]+)\s+(\d+)\s+\d+\s+R")
_DO_RE = re.compile(rb"/([A-Za-z0-9#._\-]+)\s+Do(?![0-9A-Za-z])")


def _balanced_dict(buf: bytes, start: int) -> bytes:
    """``buf[start:]`` beginning at ``<<`` → the balanced dict slice."""
    depth = 0
    i, n = start, len(buf)
    while i < n - 1:
        two = buf[i:i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return buf[start:i]
        else:
            i += 1
    return buf[start:]


def _xobject_map(hdr: bytes,
                 objects: dict[int, tuple[bytes, bytes | None]]
                 ) -> dict[str, int]:
    """Page/form header → {XObject resource name: object number},
    following one level of indirection for /Resources and /XObject."""
    k = hdr.find(b"/Resources")
    if k >= 0:
        m = re.match(rb"\s*(\d+)\s+\d+\s+R", hdr[k + 10:])
        if m and int(m.group(1)) in objects:
            hdr = objects[int(m.group(1))][0]
    x = hdr.find(b"/XObject")
    if x < 0:
        return {}
    m = re.match(rb"\s*(\d+)\s+\d+\s+R", hdr[x + 8:])
    if m and int(m.group(1)) in objects:
        body = objects[int(m.group(1))][0]
    else:
        j = hdr.find(b"<<", x)
        if j < 0:
            return {}
        body = _balanced_dict(hdr, j)
    return {mm.group(1).decode("latin-1"): int(mm.group(2))
            for mm in _XOBJ_REF_RE.finditer(body)}


def _expand_forms(hdr: bytes, stream: bytes,
                  objects: dict[int, tuple[bytes, bytes | None]],
                  depth: int = 0,
                  seen: frozenset[int] = frozenset()) -> bytes:
    """Splice /Subtype /Form XObject streams in place of their ``Do``
    invocations (PDF 32000-1 §8.10) — generators routinely put page text
    in forms (letterheads, stamps, whole-page forms), which the
    interpreter would otherwise silently drop.  The form's BT/Td
    coordinates interpret in the page's space (the CTM at Do time is
    ignored, consistent with the interpreter's untransformed text
    model).  Depth- and cycle-guarded; image XObjects keep their ``Do``
    (the raster layer reads them directly via ``pdf_images``)."""
    if depth >= 3 or b"Do" not in stream:
        return stream
    xmap = _xobject_map(hdr, objects)
    if not xmap:
        return stream

    def repl(m: re.Match) -> bytes:
        num = xmap.get(m.group(1).decode("latin-1"))
        if num is None or num in seen or num not in objects:
            return m.group(0)
        f_hdr, f_data = objects[num]
        if b"/Form" not in f_hdr or not f_data:
            return m.group(0)
        inner = _expand_forms(f_hdr, f_data, objects, depth + 1,
                              seen | {num})
        return b" q " + inner + b" Q "

    return _DO_RE.sub(repl, stream)


def _page_content_streams(payload: bytes,
                          objects: dict[int, tuple[bytes, bytes | None]]
                          ) -> list[bytes]:
    """Content streams in page order (catalog→pages→kids), with fallback."""
    page_nums: list[int] = []
    root_m = _ROOT_RE.search(payload)
    pages_obj = None
    if root_m and int(root_m.group(1)) in objects:
        cat_hdr = objects[int(root_m.group(1))][0]
        pm = _PAGES_REF_RE.search(cat_hdr)
        if pm and int(pm.group(1)) in objects:
            pages_obj = objects[int(pm.group(1))][0]
    if pages_obj is None:  # fallback: first object with /Kids
        for _, (hdr, _s) in sorted(objects.items()):
            if b"/Kids" in hdr:
                pages_obj = hdr
                break
    if pages_obj is not None:
        km = _KIDS_RE.search(pages_obj)
        if km:
            page_nums = [int(r.group(1)) for r in _REF_RE.finditer(km.group(1))]
    streams: list[bytes] = []
    for pn in page_nums:
        if pn not in objects:
            continue
        page_hdr = objects[pn][0]
        refs: list[int] = []
        am = _CONTENTS_ARR_RE.search(page_hdr)
        if am:
            refs = [int(r.group(1)) for r in _REF_RE.finditer(am.group(1))]
        else:
            cm = _CONTENTS_RE.search(page_hdr)
            if cm:
                refs = [int(cm.group(1))]
        parts = [objects[r][1] for r in refs
                 if r in objects and objects[r][1]]
        if parts:
            data = b" ".join(parts)
            if b"Do" in data:
                data = _expand_forms(page_hdr, data, objects)
            streams.append(data)
    if not streams:  # last resort: every stream that contains BT
        for _, (hdr, data) in sorted(objects.items()):
            if data and b"BT" in data and b"/XRef" not in hdr \
                    and b"/ObjStm" not in hdr:
                # xref/object streams are binary tables — a chance 'BT'
                # byte pair must not be read as a content stream
                streams.append(data)
    return streams


class _Run:
    __slots__ = ("x", "y", "text")

    def __init__(self, x: float, y: float, text: str) -> None:
        self.x = x
        self.y = y
        self.text = text


def _show_through(s: str, cur_map) -> tuple[str, int]:
    """Decode a show string through the active font map → (text,
    glyph count).  Two-byte (Type0/CID) maps consume 2-byte code
    units (unmapped CIDs degrade to U+FFFD, an odd trailing byte is
    dropped); single-byte maps keep the round-3 behavior (unmapped
    codes pass through as latin-1)."""
    if cur_map is None:
        return s, len(s)
    if getattr(cur_map, "two_byte", False):
        out = []
        for i in range(0, len(s) - 1, 2):
            code = (ord(s[i]) << 8) | ord(s[i + 1])
            out.append(cur_map.get(code, "\ufffd"))
        return "".join(out), len(s) // 2
    return "".join(cur_map.get(ord(c), c) for c in s), len(s)


def _interpret(stream: bytes,
               fonts: dict[str, dict[int, str]] | None = None
               ) -> tuple[list[_Run], list[tuple[float, float, float, float]]]:
    """Execute the content-stream subset → (text runs, filled/stroked rects).

    ``fonts``: resource-name → code→unicode maps from ``_font_maps``;
    ``Tf`` selects the active map and show operators decode through it
    in the map's code unit (1 or 2 bytes); fonts without a map keep the
    latin-1 passthrough."""
    if b"BI" in stream:
        # inline-image entropy bytes must never be scanned as operators
        # (a chance 'BT … Tj' inside compressed data would fabricate
        # text); the raster side reads them via split_inline_images
        stream, _ = split_inline_images(stream)
    text = stream.decode("latin-1", "replace")
    runs: list[_Run] = []
    rects: list[tuple[float, float, float, float]] = []
    stack: list = []
    tx = ty = 0.0       # text-line origin
    cx = cy = 0.0       # current position
    leading = 0.0
    in_text = False
    cur_map: dict[int, str] | None = None
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        c0 = tok[0]
        if c0 == "(":
            stack.append(("str", _unescape_pdf_string(tok[1:-1])))
        elif c0 == "<":
            hexs = re.sub(r"\s", "", tok[1:-1])
            if len(hexs) % 2:
                hexs += "0"
            try:
                stack.append(("str", bytes.fromhex(hexs).decode("latin-1")))
            except ValueError:
                stack.append(("str", ""))
        elif c0 == "/":
            stack.append(("name", tok))
        elif c0 in "[]":
            stack.append((tok, tok))
        elif c0.isdigit() or c0 in "-+.":
            try:
                stack.append(("num", float(tok)))
            except ValueError:
                pass
        else:
            op = tok
            if op == "BT":
                in_text = True
                tx = ty = cx = cy = 0.0
                stack.clear()
            elif op == "ET":
                in_text = False
                stack.clear()
            elif op == "Td" or op == "TD":
                if len(stack) >= 2 and stack[-1][0] == "num" and stack[-2][0] == "num":
                    dy = stack[-1][1]
                    dx = stack[-2][1]
                    tx += dx
                    ty += dy
                    cx, cy = tx, ty
                    if op == "TD":
                        leading = -dy
                stack.clear()
            elif op == "Tm":
                if len(stack) >= 6 and all(s[0] == "num" for s in stack[-6:]):
                    tx, ty = stack[-2][1], stack[-1][1]
                    cx, cy = tx, ty
                stack.clear()
            elif op == "T*":
                ty -= leading
                cx, cy = tx, ty
                stack.clear()
            elif op == "TL":
                if stack and stack[-1][0] == "num":
                    leading = stack[-1][1]
                stack.clear()
            elif op == "Tf":
                if len(stack) >= 2 and stack[-2][0] == "name":
                    cur_map = fonts.get(stack[-2][1]) if fonts else None
                stack.clear()
            elif op == "Tj":
                if in_text and stack and stack[-1][0] == "str":
                    s = stack[-1][1]
                    if s:
                        shown, glyphs = _show_through(s, cur_map)
                        if shown:
                            runs.append(_Run(cx, cy, shown))
                        # advance by the GLYPH count, not the mapped
                        # length — geometry is per glyph
                        cx += 5.5 * glyphs
                stack.clear()
            elif op == "TJ":
                if in_text:
                    parts = [v for k, v in stack if k == "str"]
                    if any(parts):
                        decoded = [_show_through(p, cur_map)
                                   for p in parts]
                        shown = "".join(d for d, _ in decoded)
                        if shown:
                            runs.append(_Run(cx, cy, shown))
                        cx += 5.5 * sum(g for _, g in decoded)
                stack.clear()
            elif op == "'" or op == '"':
                # the apostrophe/quote show operators (PDF 32000-1
                # Table 107): T* (next line per leading) then show; "
                # additionally carries aw/ac spacing operands BELOW the
                # string — geometry-only here, so only the string shows
                ty -= leading
                cx, cy = tx, ty
                if in_text and stack and stack[-1][0] == "str":
                    s = stack[-1][1]
                    if s:
                        shown, glyphs = _show_through(s, cur_map)
                        if shown:
                            runs.append(_Run(cx, cy, shown))
                        cx += 5.5 * glyphs
                stack.clear()
            elif op == "re":
                if len(stack) >= 4 and all(s[0] == "num" for s in stack[-4:]):
                    x, y, w, h = (s[1] for s in stack[-4:])
                    rects.append((x, y, w, h))
                stack.clear()
            else:
                # f, S, Tf, colour ops, q/Q, cm... consume operands
                stack.clear()
    return runs, rects


def _cluster(values: list[float], tol: float) -> list[float]:
    """1-D cluster: sorted representatives, greedy within tol."""
    reps: list[float] = []
    for v in sorted(values):
        if not reps or v - reps[-1] > tol:
            reps.append(v)
    return reps


class _Region:
    __slots__ = ("top", "left", "text")

    def __init__(self, top: float, left: float, text: str) -> None:
        self.top = top
        self.left = left
        self.text = text


def _detect_tables(rects, runs):
    """Cell-grid detection: ruling lines → grid → snap runs into cells.

    Returns (table_regions, leftover_runs)."""
    h_lines = []  # (y, x0, x1)
    v_lines = []  # (x, y0, y1)
    for x, y, w, h in rects:
        if h <= PDF_LINE_MAX_THICKNESS and w > PDF_LINE_MAX_THICKNESS:
            h_lines.append((y, x, x + w))
        elif w <= PDF_LINE_MAX_THICKNESS and h > PDF_LINE_MAX_THICKNESS:
            v_lines.append((x, y, y + h))
    if len(h_lines) < 2 or len(v_lines) < 2:
        return [], runs

    # group rulings into grid bounding boxes by overlap: here a single grid
    # per x-extent cluster of horizontal lines (writer emits one grid per
    # table); multiple tables stack vertically with distinct y ranges.
    # Build grids greedily from v-line x-extents that share y-overlap.
    # Simplification valid for the supported subset: all h_lines whose
    # (x0,x1) match within tol belong to one grid column-set.
    grids = []  # (ys sorted desc, xs sorted asc, bbox)
    used_h = [False] * len(h_lines)
    for i, (y0, hx0, hx1) in enumerate(h_lines):
        if used_h[i]:
            continue
        group = [i]
        used_h[i] = True
        for j in range(i + 1, len(h_lines)):
            yj, xj0, xj1 = h_lines[j]
            if not used_h[j] and abs(xj0 - hx0) < 3.0 and abs(xj1 - hx1) < 3.0:
                group.append(j)
                used_h[j] = True
        if len(group) < 2:
            continue
        # Two stacked tables share an x-extent, so one h-line group can
        # hold SEVERAL grids: split it by the y-extents of the vertical
        # rulings (each table's v-lines span exactly its own y range).
        vin = [(x, vy0, vy1) for (x, vy0, vy1) in v_lines
               if hx0 - 2 <= x <= hx1 + 2]
        extents: list[tuple[float, float]] = []
        for _x, vy0, vy1 in vin:
            for ei, (ey0, ey1) in enumerate(extents):
                if abs(vy0 - ey0) < 2.0 and abs(vy1 - ey1) < 2.0:
                    break
            else:
                extents.append((vy0, vy1))
        for ey0, ey1 in extents:
            ys = _cluster(
                [h_lines[g][0] for g in group
                 if ey0 - 2 <= h_lines[g][0] <= ey1 + 2], 1.0)
            if len(ys) < 2:
                continue
            xs = _cluster(
                [x for (x, vy0, vy1) in vin
                 if abs(vy0 - ey0) < 2.0 and abs(vy1 - ey1) < 2.0], 1.0)
            if len(xs) < 2:
                continue
            gy0, gy1 = min(ys), max(ys)
            grids.append((sorted(ys, reverse=True), sorted(xs),
                          (min(xs), gy0, max(xs), gy1)))

    if not grids:
        return [], runs

    regions = []
    leftover = []
    assigned = [False] * len(runs)
    for ys, xs, (bx0, by0, bx1, by1) in grids:
        n_rows = len(ys) - 1
        n_cols = len(xs) - 1
        cells: list[list[list[_Run]]] = [
            [[] for _ in range(n_cols)] for _ in range(n_rows)
        ]
        for k, r in enumerate(runs):
            if assigned[k]:
                continue
            if bx0 <= r.x <= bx1 and by0 <= r.y <= by1:
                row = col = None
                for ri in range(n_rows):
                    if ys[ri] >= r.y >= ys[ri + 1]:
                        row = ri
                        break
                for ci in range(n_cols):
                    if xs[ci] <= r.x <= xs[ci + 1]:
                        col = ci
                        break
                if row is not None and col is not None:
                    cells[row][col].append(r)
                    assigned[k] = True
        rows_text = []
        for row_cells in cells:
            cols_text = []
            for cell_runs in row_cells:
                cell_runs.sort(key=lambda r: (-r.y, r.x))
                cols_text.append(" ".join(r.text for r in cell_runs).strip())
            rows_text.append(PDF_CELL_JOIN.join(cols_text))
        regions.append(_Region(by1, bx0, PDF_ROW_JOIN.join(rows_text)))
    leftover = [r for k, r in enumerate(runs) if not assigned[k]]
    return regions, leftover


def _text_regions(runs: list[_Run]) -> list[_Region]:
    """Y-cluster leftover runs into lines, lines into paragraphs; two-column
    pages are split at a >= PDF_COLUMN_GAP x-gap (reading order: left column
    fully, then right)."""
    if not runs:
        return []
    # column split
    xs = sorted(r.x for r in runs)
    split_x = None
    for a, b in zip(xs, xs[1:]):
        if b - a >= PDF_COLUMN_GAP:
            left = [r for r in runs if r.x <= a]
            right = [r for r in runs if r.x >= b]
            # only treat as columns when both sides have several lines and
            # vertical extents overlap (otherwise it's indentation)
            if len(left) >= 3 and len(right) >= 3:
                ly = (min(r.y for r in left), max(r.y for r in left))
                ry = (min(r.y for r in right), max(r.y for r in right))
                if min(ly[1], ry[1]) - max(ly[0], ry[0]) > 0:
                    split_x = (a + b) / 2
                    break
    if split_x is not None:
        lefts = [r for r in runs if r.x < split_x]
        rights = [r for r in runs if r.x >= split_x]
        return _text_regions(lefts) + _text_regions(rights)

    # cluster into lines by y
    runs = sorted(runs, key=lambda r: (-r.y, r.x))
    lines: list[tuple[float, str]] = []
    cur_y = None
    cur: list[_Run] = []
    for r in runs:
        if cur_y is None or abs(r.y - cur_y) <= PDF_Y_CLUSTER_TOL:
            cur.append(r)
            cur_y = r.y if cur_y is None else cur_y
        else:
            cur.sort(key=lambda q: q.x)
            lines.append((cur_y, " ".join(q.text for q in cur)))
            cur = [r]
            cur_y = r.y
    if cur:
        cur.sort(key=lambda q: q.x)
        lines.append((cur_y, " ".join(q.text for q in cur)))

    # group lines into paragraphs on y-gap
    regions: list[_Region] = []
    para: list[str] = []
    para_top = lines[0][0]
    prev_y = lines[0][0]
    left_x = min(r.x for r in runs)
    for y, text in lines:
        if para and prev_y - y > PDF_PARA_GAP:
            regions.append(_Region(para_top, left_x, " ".join(para)))
            para = []
            para_top = y
        para.append(text)
        prev_y = y
    if para:
        regions.append(_Region(para_top, left_x, " ".join(para)))
    return regions


_IMG_WIDTH_RE = re.compile(rb"/Width\s+(\d+)")
_IMG_HEIGHT_RE = re.compile(rb"/Height\s+(\d+)")

# --- inline images (PDF 32000-1 §8.9.7: BI <dict> ID <data> EI) --------------

_BI_TOKEN_RE = re.compile(rb"(?:(?<=[\s>)])|^)BI(?=[\s/])")
_ID_TOKEN_RE = re.compile(rb"(?<=[\s>])ID(?=[\s])")
_EI_TOKEN_RE = re.compile(rb"(?<=[\s])EI(?![0-9A-Za-z])")
_IMG_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
# abbreviated key/value names, longest first so /BPC wins over /B + 'PC'
_INLINE_ABBREV_RE = re.compile(
    rb"/(AHx|A85|LZW|Fl|RL|CCF|DCT|BPC|CS|DP|IM|RGB|CMYK|W|H|F|D|I|L|G)\b")
_INLINE_FULL = {
    b"W": b"Width", b"H": b"Height", b"BPC": b"BitsPerComponent",
    b"CS": b"ColorSpace", b"F": b"Filter", b"DP": b"DecodeParms",
    b"D": b"Decode", b"IM": b"ImageMask", b"I": b"Interpolate",
    b"L": b"Length", b"G": b"DeviceGray", b"RGB": b"DeviceRGB",
    b"CMYK": b"DeviceCMYK", b"AHx": b"ASCIIHexDecode",
    b"A85": b"ASCII85Decode", b"LZW": b"LZWDecode", b"Fl": b"FlateDecode",
    b"RL": b"RunLengthDecode", b"CCF": b"CCITTFaxDecode",
    b"DCT": b"DCTDecode",
}


_INLINE_KEYS = frozenset((
    b"Width", b"Height", b"BitsPerComponent", b"ColorSpace", b"Filter",
    b"DecodeParms", b"Decode", b"ImageMask", b"Interpolate", b"Length",
    b"Intent"))
_HDR_KEY_RE = re.compile(rb"\s*/([A-Za-z0-9]+)")
_HDR_VAL_RE = re.compile(
    rb"\s*(?:/[A-Za-z0-9]*|[+-]?\d+(?:\.\d+)?|true|false|null"
    rb"|\[[^][]*\]|<<.*?>>)", re.DOTALL)


def _valid_inline_header(hdr: bytes) -> bool:
    """True iff ``hdr`` (abbrevs already expanded) parses as a dict body
    of KNOWN inline-image keys — the guard that keeps a ``BI`` matched
    inside a string literal (``(foo) BI (bar) Tj``) from being treated
    as an image and blanking legitimate text operators (ADVICE r4)."""
    i, n, saw = 0, len(hdr), False
    while i < n:
        km = _HDR_KEY_RE.match(hdr, i)
        if km is None:
            return saw and hdr[i:].strip() == b""
        if km.group(1) not in _INLINE_KEYS:
            return False
        vm = _HDR_VAL_RE.match(hdr, km.end())
        if vm is None:
            return False
        i, saw = vm.end(), True
    return saw


def split_inline_images(stream: bytes
                        ) -> tuple[bytes, list[tuple[bytes, bytes]]]:
    """Split a content stream into (stream with image spans blanked,
    [(expanded header, raw entropy data)]).

    Inline images embed binary data directly between ``ID`` and ``EI``
    inside the content stream — real scanned PDFs use them for small
    rasters where an XObject is overhead.  Abbreviated dict keys are
    expanded to their full names so ``apply_stream_filters`` and the
    XObject regexes work unchanged.  The data extent is the declared
    /L(ength) when present, the exact gray payload size when unfiltered,
    else the first whitespace-preceded ``EI`` delimiter (the standard
    heuristic).  Malformed constructs blank to end-of-stream and yield
    nothing — total on untrusted bytes.  Spans are blanked (not cut) so
    the text interpreter never reads image bytes as operators."""
    if b"BI" not in stream:
        return stream, []
    images: list[tuple[bytes, bytes]] = []
    spans: list[tuple[int, int]] = []
    pos = 0
    while True:
        m = _BI_TOKEN_RE.search(stream, pos)
        if m is None:
            break
        idm = _ID_TOKEN_RE.search(stream, m.end())
        if idm is None:
            # truncated REAL image (header follows) blanks to EOS; a
            # bare false-positive BI (e.g. inside a string) is skipped
            if re.match(rb"\s*/", stream[m.end():m.end() + 4]):
                spans.append((m.start(), len(stream)))
            break
        hdr = _INLINE_ABBREV_RE.sub(
            lambda am: b"/" + _INLINE_FULL[am.group(1)],
            stream[m.end():idm.start()])
        if not _valid_inline_header(hdr):
            pos = m.end()                        # not an image — move on
            continue
        data_start = idm.end() + 1               # one ws byte after ID
        wm = _IMG_WIDTH_RE.search(hdr)
        hm = _IMG_HEIGHT_RE.search(hdr)
        lm = _IMG_LENGTH_RE.search(hdr)
        if lm is not None:
            data_end = min(data_start + int(lm.group(1)), len(stream))
        elif b"/Filter" not in hdr and wm and hm:
            bpcm = re.search(rb"/BitsPerComponent\s+(\d+)", hdr)
            bpc = int(bpcm.group(1)) if bpcm else 8
            n = ((int(wm.group(1)) * bpc + 7) // 8) * int(hm.group(1))
            data_end = min(data_start + n, len(stream))
        else:
            data_end = -1
        if data_end >= 0:
            eim = _EI_TOKEN_RE.search(stream, data_end)
        else:
            eim = _EI_TOKEN_RE.search(stream, data_start)
            data_end = eim.start() - 1 if eim else len(stream)
        end = eim.end() if eim else len(stream)
        if wm and hm and data_end > data_start:
            images.append((hdr, stream[data_start:data_end]))
        spans.append((m.start(), end))
        pos = end
    if not spans:
        return stream, images
    out = bytearray(stream)
    for a, e in spans:
        out[a:e] = b" " * (e - a)
    return bytes(out), images


_SCAN_READER = None
_PAGE_READER = None


def _scanned_regions(payload: bytes,
                     objects: dict | None = None
                     ) -> list[tuple[str, str]]:
    """(kind, text) per embedded scanned image, object order: kind
    'table' (cells \\t, rows \\n — the vector-ruling grid shape) when
    the cell-grid reader finds a ruled table, else 'text' (lines joined
    by \\n) when the page-OCR reader finds free-text words — the
    corpus-v5 scanned-document population with BOTH page types; since
    v=6 both readers are the DESKEWING variants, so crooked flatbed
    scans (planted ±MAX_SHEAR row shear) read exactly too — on straight
    scans each estimator locks shear 0 (strict-margin tie-break) and
    reads identically to the straight readers.

    Both OCR readers (functions/table_image.py) are built once per
    process and cached — actor-resident state, same discipline as the
    LSH plane cache.  Images that are neither contribute nothing; a
    failing read never breaks the document (extract_document totality,
    M11)."""
    global _SCAN_READER, _PAGE_READER
    imgs = pdf_images(payload, objects)
    if not imgs:
        return []
    if _SCAN_READER is None:
        from ..functions.table_image import DeskewingTableExtractor

        _SCAN_READER = DeskewingTableExtractor()
    out: list[tuple[str, str]] = []
    for w, h, gray in imgs:
        if w <= 0 or h <= 0 or len(gray) < w * h:
            continue
        try:
            cells = _SCAN_READER.read_table_cells(w, h, gray)
        except Exception:
            cells = []
        if cells:
            by_r: dict[int, dict[int, str]] = {}
            for r, c, v in cells:
                by_r.setdefault(r, {})[c] = v
            out.append(("table", "\n".join(
                "\t".join(row[c] for c in sorted(row))
                for _, row in sorted(by_r.items()))))
            continue
        # no ruled grid: free-text page scan (corpus v=5)
        try:
            import numpy as np

            from ..functions.table_image import GLYPH_H, GLYPH_W

            if h < GLYPH_H or w < GLYPH_W:
                continue
            if _PAGE_READER is None:
                from ..functions.table_image import (
                    DeskewingPageTextExtractor)

                _PAGE_READER = DeskewingPageTextExtractor()
            dark = (np.frombuffer(gray, dtype=np.uint8)[:w * h]
                    .reshape(h, w) < 128)
            dist = _PAGE_READER._page_dist(dark)
            lines = [ln for ln in _PAGE_READER._read_page(dist) if ln]
        except Exception:
            lines = []
        if lines:
            out.append(("text", "\n".join(lines)))
    return out


def _scanned_grids(payload: bytes,
                   objects: dict | None = None) -> list[str]:
    """Only the TABLE regions of the scanned images (pdf_tables' view)."""
    return [t for kind, t in _scanned_regions(payload, objects)
            if kind == "table"]


def pdf_images(payload: bytes,
               objects: dict | None = None) -> list[tuple[int, int, bytes]]:
    """Embedded raster images, object order: (width, height, gray bytes).

    Image XObjects are stream objects whose dict carries /Subtype /Image;
    _parse_objects has already sliced the stream by /Length (indirect
    lengths resolved) and inflated /FlateDecode — the scanned-document
    half of the crawl PDF population (pdf_write.build_image_pdf emits
    the closed-loop fixtures).  Only 8-bit /DeviceGray payloads are
    meaningful to callers; anything else still returns raw bytes and the
    caller's decoder routes it to its error column."""
    out: list[tuple[int, int, bytes]] = []
    if objects is None:
        objects = _parse_objects(payload)
    for num in sorted(objects):
        header, data = objects[num]
        if (b"/Subtype" not in header or b"/Image" not in header
                or data is None):
            continue
        img = _finish_image(header, data, objects)
        if img is not None:
            out.append(img)
    # inline images (BI/ID/EI) ride inside the page content streams,
    # page order then stream order; their entropy data is still raw
    # here, so the stream filter chain applies before the raster step
    for stream in _page_content_streams(payload, objects):
        _, inline = split_inline_images(stream)
        for hdr, raw in inline:
            from .pdf_filters import apply_stream_filters

            img = _finish_image(hdr, apply_stream_filters(hdr, raw))
            if img is not None:
                out.append(img)
    return out


def _finish_image(header: bytes, data: bytes,
                  objects: dict | None = None
                  ) -> tuple[int, int, bytes] | None:
    """Common tail for XObject and inline images: read dims, run the
    from-scratch JPEG codec on /DCTDecode payloads (real scanned PDFs
    are JPEG-compressed — round 4); decode failures keep the raw bytes
    so the caller's error routing sees them, same as any other
    non-gray payload."""
    wm = _IMG_WIDTH_RE.search(header)
    hm = _IMG_HEIGHT_RE.search(header)
    if not (wm and hm) or not data:
        return None
    if b"/DCTDecode" in header:
        from .jpeg import decode_jpeg

        try:
            jw, jh, gray = decode_jpeg(data)
            if (jw, jh) == (int(wm.group(1)), int(hm.group(1))):
                data = gray
        except (ValueError, NotImplementedError):
            pass
    elif b"/CCITTFaxDecode" in header:
        # the office-scanner codec (round 4, M30): G4/MMR only (/K < 0
        # — the overwhelming real-PDF case); K >= 0 G3 keeps raw bytes
        # for the caller's error routing like any unsupported branch
        import numpy as np

        from .ccitt import decode_g4

        def _p(name: bytes, default: int) -> int:
            m = re.search(rb"/" + name + rb"\s+(-?\d+)", header)
            return int(m.group(1)) if m else default

        k = _p(b"K", 0)
        if k < 0:
            cols = _p(b"Columns", 1728)
            rows_m = re.search(rb"/Rows\s+(\d+)", header)
            try:
                samples = decode_g4(
                    data, cols,
                    rows=int(rows_m.group(1)) if rows_m else None,
                    byte_align=re.search(
                        rb"/EncodedByteAlign\s+true", header) is not None,
                    black_is_1=re.search(
                        rb"/BlackIs1\s+true", header) is not None)
                if samples.shape == (int(hm.group(1)), int(wm.group(1))):
                    # 1-bit DeviceGray: sample 0 = black, 1 = white
                    data = (samples * np.uint8(255)).tobytes()
            except ValueError:
                pass
    elif b"/JBIG2Decode" in header:
        # the third office-scanner codec (round 5, M42): MQ-coded
        # generic regions via core/jbig2.py; /JBIG2Globals streams are
        # resolved when the caller passed the object table; unsupported
        # segment kinds keep raw bytes for error routing
        import numpy as np

        from .jbig2 import decode_jbig2_embedded

        gdata = b""
        gm = re.search(rb"/JBIG2Globals\s+(\d+)\s+\d+\s+R", header)
        if gm and objects is not None and int(gm.group(1)) in objects:
            gdata = objects[int(gm.group(1))][1] or b""
        try:
            bits = decode_jbig2_embedded(data, gdata)
            if bits.shape == (int(hm.group(1)), int(wm.group(1))):
                # JBIG2 1 = black → 8-bit DeviceGray
                data = ((1 - bits) * np.uint8(255)).tobytes()
        except ValueError:
            pass
    return int(wm.group(1)), int(hm.group(1)), data


def pdf_tables(payload: bytes) -> list[str]:
    """Structured variant of the cell-grid path: ONLY the detected table
    regions, one grid string per table (cells \\t, rows \\n), page order
    then reading order — symmetric to functions/html_tables.render_tables
    so both document types expose their tabular data the same way."""
    objects = _parse_objects(payload)
    fonts = _font_maps(objects)
    grids: list[str] = []
    for stream in _page_content_streams(payload, objects):
        runs, rects = _interpret(stream, fonts)
        tables, _ = _detect_tables(rects, runs)
        tables.sort(key=lambda g: (-g.top, g.left))
        grids.extend(t.text for t in tables if t.text)
    # scanned pages: tables read out of embedded images join the same
    # surface (corpus v=4 "scanned-document PDFs")
    grids.extend(_scanned_grids(payload, objects))
    return grids


def extract_pdf(payload: bytes) -> dict:
    """Full PDF path: pages → runs/rects → tables + text regions → text.

    Region reading order within a page: top-to-bottom by region top edge,
    left-to-right on ties (the reference's row-major assembly, SURVEY
    SS2.3(b)).  Pages and regions join with JOINER.
    """
    objects = _parse_objects(payload)
    fonts = _font_maps(objects)
    streams = _page_content_streams(payload, objects)
    page_texts: list[str] = []
    n_regions = 0
    for stream in streams:
        runs, rects = _interpret(stream, fonts)
        tables, leftover = _detect_tables(rects, runs)
        texts = _text_regions(leftover)
        regions = tables + texts
        regions.sort(key=lambda g: (-g.top, g.left))
        parts = [g.text for g in regions if g.text]
        n_regions += len(parts)
        if parts:
            page_texts.append(JOINER.join(parts))
    # scanned pages (corpus v=4 tables, v=5 adds free-text pages):
    # embedded images OCR'd by the cell-grid / page-text readers
    # contribute their regions as additional page texts, image order —
    # a scanned-document PDF (no text runs at all) extracts REAL text
    # instead of coming back empty, echoing the reference's core loop
    scan_regions = [t for _, t in _scanned_regions(payload, objects)]
    page_texts.extend(scan_regions)
    n_regions += len(scan_regions)
    text = JOINER.join(page_texts)
    spans: list[tuple[int, int]] = []
    pos = 0
    for pt in page_texts:
        spans.append((pos, pos + len(pt)))
        pos += len(pt) + len(JOINER)
    return {
        "extracted_text": text,
        "spans": spans,
        "n_blocks_kept": n_regions,
        "n_blocks_dropped": 0,
        "parse_ok": bool(streams),
    }
