"""Legacy Word binary (.doc) extraction (SURVEY §2.2 M37, round 5).

The pre-OOXML Word format ([MS-DOC]) rides the CFB container
(``core/cfb.py``): text lives in the ``WordDocument`` stream, located
by the **piece table** (CLX) stored in the ``0Table``/``1Table``
stream.  Implemented from the published spec, same from-scratch
discipline as the RTF/OOXML readers:

- FIB: ``wIdent`` 0xA5EC magic, flag bit ``fWhichTblStm`` (0x0200 at
  offset 0x000A) selects the table stream, ``ccpText`` (offset 0x004C)
  bounds the main-document character range, ``fcClx``/``lcbClx``
  (offsets 0x01A2/0x01A6, FibRgFcLcb97) locate the CLX.
- CLX → PlcPcd: ``0x01``-tagged Prc property blocks are skipped;
  the ``0x02``-tagged Pcdt carries n pieces — (n+1) CPs + n 8-byte
  PCDs.  PCD.fc bit 30 set ⇒ the piece is cp1252 bytes at ``fc/2``;
  clear ⇒ UTF-16LE at ``fc`` ([MS-DOC] §2.9.177).
- Control characters map under the SAME conventions as the RTF reader
  (``core/rtf.py``): 0x0D/0x0C/0x0E close a paragraph (``\\par`` /
  ``\\page`` / column break), 0x07 cell marks and 0x0B line breaks
  fold to a space, field instructions (0x13..0x14) are excluded while
  field results (0x14..0x15) are kept — the cross-format policy that
  keeps extracted text comparable across .doc/.docx/.rtf twins of the
  same document.

``extract_doc`` assembles non-empty paragraphs under the HTML
joiner/span conventions so ``doc_type="doc"`` joins the byte-identity
contract; ``build_doc`` writes deterministic documents (cp1252 vs
unicode pieces, split-mid-word pieces, either table stream, optional
field constructs) so the synthetic corpus stays closed.
"""

from __future__ import annotations

import struct

from .cfb import build_cfb, cfb_entries, cfb_read
from .dom import collapse_ws
from .docx import docx_to_text

_WORD_STREAM = "WordDocument"
_MAX_PIECES = 1 << 16


def _parse_clx(clx: bytes) -> list[tuple[int, int, int, bool]]:
    """CLX bytes → [(cp_start, cp_end, fc, compressed)] pieces."""
    i, n = 0, len(clx)
    while i < n and clx[i] == 0x01:                    # Prc: skip grpprl
        if i + 3 > n:
            raise ValueError("doc: truncated Prc in CLX")
        cb, = struct.unpack_from("<h", clx, i + 1)
        i += 3 + max(0, cb)
    if i >= n or clx[i] != 0x02:
        raise ValueError("doc: CLX has no Pcdt")
    lcb, = struct.unpack_from("<I", clx, i + 1)
    plc = clx[i + 5:i + 5 + lcb]
    if len(plc) < lcb or (lcb - 4) % 12:
        raise ValueError("doc: malformed PlcPcd")
    cnt = (lcb - 4) // 12
    if cnt > _MAX_PIECES:
        raise ValueError("doc: piece table too large")
    cps = struct.unpack_from(f"<{cnt + 1}I", plc, 0)
    pieces = []
    for k in range(cnt):
        fc_raw, = struct.unpack_from("<I", plc, 4 * (cnt + 1) + 8 * k + 2)
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        pieces.append((cps[k], cps[k + 1],
                       fc // 2 if compressed else fc, compressed))
    return pieces


def doc_text_chars(payload: bytes) -> str:
    """CFB .doc bytes → raw main-document character stream (control
    characters NOT yet folded).  Raises ValueError on malformation."""
    entries = cfb_entries(payload)
    if _WORD_STREAM not in entries:
        raise ValueError("doc: no WordDocument stream")
    wd = cfb_read(payload, _WORD_STREAM, entries)
    if len(wd) < 0x01AA:
        raise ValueError("doc: WordDocument stream too short for FIB")
    ident, = struct.unpack_from("<H", wd, 0)
    if ident != 0xA5EC:
        raise ValueError("doc: bad FIB magic")
    flags, = struct.unpack_from("<H", wd, 0x000A)
    tbl_name = "1Table" if flags & 0x0200 else "0Table"
    ccp_text, = struct.unpack_from("<I", wd, 0x004C)
    fc_clx, lcb_clx = struct.unpack_from("<II", wd, 0x01A2)
    if lcb_clx == 0:
        raise ValueError("doc: no piece table (pre-Word97 simple file)")
    if tbl_name not in entries:
        raise ValueError(f"doc: missing table stream {tbl_name}")
    tbl = cfb_read(payload, tbl_name, entries)
    clx = tbl[fc_clx:fc_clx + lcb_clx]
    if len(clx) < lcb_clx:
        raise ValueError("doc: CLX out of table-stream bounds")
    out: list[str] = []
    remaining = ccp_text
    for cp_a, cp_b, fc, compressed in _parse_clx(clx):
        if remaining <= 0:
            break
        take = min(cp_b - cp_a, remaining)
        if take <= 0:
            continue
        if compressed:
            raw = wd[fc:fc + take]
            if len(raw) < take:
                raise ValueError("doc: piece beyond WordDocument stream")
            out.append(raw.decode("cp1252", "replace"))
        else:
            raw = wd[fc:fc + 2 * take]
            if len(raw) < 2 * take:
                raise ValueError("doc: piece beyond WordDocument stream")
            out.append(raw.decode("utf-16-le", "replace"))
        remaining -= take
    return "".join(out)


def parse_doc(payload: bytes) -> list[str]:
    """.doc bytes → paragraphs (ws-collapsed) in document order."""
    chars = doc_text_chars(payload)
    paras: list[str] = []
    buf: list[str] = []
    field_skip = 0               # inside 0x13..0x14 (instruction text)

    def close() -> None:
        paras.append(collapse_ws("".join(buf)).strip())
        buf.clear()

    for ch in chars:
        o = ord(ch)
        if o == 0x13:
            field_skip += 1
        elif o == 0x14:
            field_skip = max(0, field_skip - 1)
        elif o == 0x15:
            pass
        elif field_skip:
            continue
        elif o in (0x0D, 0x0C, 0x0E):
            close()
        elif o in (0x07, 0x0B):
            buf.append(" ")
        elif o == 0x1E:
            buf.append("-")
        elif o in (0x01, 0x02, 0x03, 0x04, 0x05, 0x08, 0x1F, 0x00):
            continue
        else:
            buf.append(ch)
    if "".join(buf).strip():
        close()
    return paras


def extract_doc(payload: bytes, joiner: str) -> dict:
    """bytes → {extracted_text, spans, n_blocks_kept, n_blocks_dropped,
    parse_ok, error} — ValueErrors become parse_ok=False rows (M11)."""
    try:
        paras = parse_doc(payload)
    except ValueError as exc:
        return {"extracted_text": "", "spans": [], "n_blocks_kept": 0,
                "n_blocks_dropped": 0, "parse_ok": False,
                "error": f"doc: {exc}"}
    rows = [{"text": p} for p in paras]
    text, spans, kept, dropped = docx_to_text(rows, joiner)
    return {"extracted_text": text, "spans": spans, "n_blocks_kept": kept,
            "n_blocks_dropped": dropped, "parse_ok": True, "error": ""}


# --------------------------------------------------------------------------
# writer — corpus closure
# --------------------------------------------------------------------------

def build_doc(paragraphs: list[str], *, unicode_pieces: bool = False,
              which_tbl: int = 1, split_pieces: bool = False,
              field: tuple[str, str] | None = None) -> bytes:
    """Deterministic minimal .doc: FIB + text + piece table.

    ``field=(instr, result)`` plants a 0x13 instr 0x14 result 0x15
    construct in the first paragraph so the exclusion rule is exercised
    by the corpus."""
    text = "\r".join(paragraphs) + "\r"
    if field:
        instr, result = field
        text = ("\x13" + instr + "\x14" + result + "\x15 " + text)
    # pieces: optionally split at an arbitrary interior point
    cuts = [0, len(text)]
    if split_pieces and len(text) > 7:
        cuts = [0, len(text) // 3, len(text)]
    pieces: list[tuple[str, bool]] = []
    for a, b in zip(cuts, cuts[1:]):
        frag = text[a:b]
        comp = not unicode_pieces and all(
            ord(c) < 0x100 and c.encode("cp1252", "ignore") for c in frag)
        try:
            frag.encode("cp1252")
        except UnicodeEncodeError:
            comp = False
        pieces.append((frag, comp))

    wd = bytearray(2048)                      # FIB region
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 2, 0x00C1)     # nFib: Word97
    flags = 0x0200 if which_tbl == 1 else 0
    struct.pack_into("<H", wd, 0x000A, flags)
    struct.pack_into("<I", wd, 0x004C, len(text))   # ccpText

    fcs: list[tuple[int, int, bool]] = []     # (cp_len, fc_raw, comp)
    for frag, comp in pieces:
        fc = len(wd)
        if comp:
            wd += frag.encode("cp1252")
            fcs.append((len(frag), (fc * 2) | 0x40000000, True))
        else:
            if fc % 2:
                wd += b"\x00"
                fc += 1
            wd += frag.encode("utf-16-le")
            fcs.append((len(frag), fc, False))

    # CLX: one Prc no-op block (exercises the skip) + Pcdt
    cnt = len(fcs)
    cps = [0]
    for ln, _, _ in fcs:
        cps.append(cps[-1] + ln)
    plc = b"".join(struct.pack("<I", c) for c in cps)
    for _, fc_raw, _ in fcs:
        plc += struct.pack("<HIH", 0, fc_raw, 0)
    clx = b"\x01" + struct.pack("<h", 2) + b"\x00\x00"
    clx += b"\x02" + struct.pack("<I", len(plc)) + plc

    tbl = b"\x00" * 16 + clx                  # fcClx = 16
    struct.pack_into("<II", wd, 0x01A2, 16, len(clx))

    streams = [(_WORD_STREAM, bytes(wd)),
               ("1Table" if which_tbl == 1 else "0Table", tbl)]
    return build_cfb(streams)
