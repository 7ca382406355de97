"""Legacy PowerPoint binary (.ppt) extraction (SURVEY §2.2 M39, round 5).

The pre-OOXML PowerPoint format ([MS-PPT]) rides the CFB container: the
``PowerPoint Document`` stream is a tree of 8-byte-headed records
(recVer/recInstance u16, recType u16, recLen u32; a record is a
container when recVer == 0xF).  Text lives in two atom types:

- ``TextCharsAtom`` (0x0FA0) — UTF-16LE characters;
- ``TextBytesAtom`` (0x0FA8) — bytes that are the low bytes of UTF-16
  code units (high byte 0), i.e. latin-1.

``parse_ppt`` walks the record tree once (depth-bounded, total on
hostile bytes), assigns each text atom to its enclosing ``Slide``
container (0x03EE) in document order, and splits atom text into
paragraphs on CR — PPT's paragraph mark — with vertical tabs (the
soft line break) folding to a space, mirroring the .doc control-char
policy.  ``extract_ppt`` assembles non-empty paragraphs in slide order
under the HTML joiner/span conventions (``doc_type="ppt"`` joins the
byte-identity contract); ``build_ppt`` writes deterministic documents
(chars vs bytes atoms cycled, a CString the reader must ignore) for
corpus closure.
"""

from __future__ import annotations

import struct

from .cfb import build_cfb, cfb_entries, cfb_read
from .dom import collapse_ws
from .docx import docx_to_text

_PPT_STREAM = "PowerPoint Document"

_SLIDE = 0x03EE
_DOCUMENT = 0x03E8
_TEXT_CHARS = 0x0FA0
_TEXT_BYTES = 0x0FA8

_MAX_DEPTH = 32
_MAX_ATOMS = 1 << 16


def _walk(data: bytes, start: int, end: int, depth: int, slide_no: list[int],
          out: list[tuple[int, str]]) -> None:
    i = start
    while i + 8 <= end:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", data, i)
        body_a, body_b = i + 8, min(i + 8 + rlen, end)
        if body_b < body_a or len(out) > _MAX_ATOMS:
            raise ValueError("ppt: malformed record length")
        if (ver_inst & 0xF) == 0xF and depth < _MAX_DEPTH:
            if rtype == _SLIDE:
                slide_no[0] += 1
            _walk(data, body_a, body_b, depth + 1, slide_no, out)
        elif rtype == _TEXT_CHARS:
            raw = data[body_a:body_b - (rlen % 2)]
            out.append((slide_no[0], raw.decode("utf-16-le", "replace")))
        elif rtype == _TEXT_BYTES:
            out.append((slide_no[0],
                        data[body_a:body_b].decode("latin-1")))
        i = body_a + rlen


def parse_ppt(payload: bytes) -> list[dict]:
    """bytes → [{"slide": k, "para_idx": j, "text": str}] in document
    order (slides 1-based; atoms outside any slide get slide 0).
    Raises ValueError on malformation."""
    entries = cfb_entries(payload)
    if _PPT_STREAM not in entries:
        raise ValueError("ppt: no PowerPoint Document stream")
    doc = cfb_read(payload, _PPT_STREAM, entries)
    if len(doc) < 8:
        raise ValueError("ppt: document stream too short")
    atoms: list[tuple[int, str]] = []
    _walk(doc, 0, len(doc), 0, [0], atoms)
    rows: list[dict] = []
    per_slide: dict[int, int] = {}
    for slide, text in atoms:
        for para in text.split("\r"):
            para = collapse_ws(para.replace("\x0b", " ")).strip()
            j = per_slide.get(slide, 0)
            per_slide[slide] = j + 1
            rows.append({"slide": slide, "para_idx": j, "text": para})
    return rows


def extract_ppt(payload: bytes, joiner: str) -> dict:
    """Flagship-route assembly: non-empty paragraphs in document
    order, the ``extract_pptx`` conventions."""
    try:
        rows = parse_ppt(payload)
    except ValueError as exc:
        return {"extracted_text": "", "spans": [], "n_blocks_kept": 0,
                "n_blocks_dropped": 0, "parse_ok": False,
                "error": f"ppt: {exc}"}
    paras = [{"text": r["text"]} for r in rows]
    text, spans, kept, dropped = docx_to_text(paras, joiner)
    return {"extracted_text": text, "spans": spans, "n_blocks_kept": kept,
            "n_blocks_dropped": dropped, "parse_ok": True, "error": ""}


# --------------------------------------------------------------------------
# writer — corpus closure
# --------------------------------------------------------------------------

def _atom(rtype: int, body: bytes, ver_inst: int = 0) -> bytes:
    return struct.pack("<HHI", ver_inst, rtype, len(body)) + body


def _container(rtype: int, body: bytes) -> bytes:
    return struct.pack("<HHI", 0x000F, rtype, len(body)) + body


def build_ppt(slides: list[list[str]], *, chars_atoms: bool = True) -> bytes:
    """Deterministic minimal .ppt: a Document container then one Slide
    container per slide, each carrying its paragraphs as one text atom
    (CR-joined).  ``chars_atoms`` picks TextCharsAtom (UTF-16LE) vs
    TextBytesAtom (latin-1; non-latin-1 slides force chars)."""
    parts: list[bytes] = [_container(_DOCUMENT, b"")]
    for paras in slides:
        text = "\r".join(paras)
        use_chars = chars_atoms
        try:
            raw8 = text.encode("latin-1")
        except UnicodeEncodeError:
            use_chars = True
            raw8 = b""
        if use_chars:
            body = _atom(_TEXT_CHARS, text.encode("utf-16-le"))
        else:
            body = _atom(_TEXT_BYTES, raw8)
        parts.append(_container(_SLIDE, body))
    stream = b"".join(parts)
    current_user = struct.pack("<HHI", 0, 0x0FF6, 8) + b"\x00" * 8
    return build_cfb([(_PPT_STREAM, stream),
                      ("Current User", current_user)])
