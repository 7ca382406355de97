"""Legacy Excel binary (.xls, BIFF8) extraction (SURVEY §2.2 M38, round 5).

The pre-OOXML Excel format ([MS-XLS]) rides the CFB container: one
``Workbook`` stream of BIFF records (uint16 id + uint16 length +
payload).  Implemented from the published spec, with the cell output
shaped EXACTLY like ``core/xlsx.py``'s ``parse_xlsx`` (``{sheet, row,
col, kind, value}``, 1-based row/col) so both generations of the format
feed the same downstream assembly:

- workbook globals: ``BoundSheet8`` records give sheet names (BIFF8
  short unicode strings) and each sheet substream's absolute position;
  the SST record (with its CONTINUE chain) gives the shared-string
  table.  ``XLUnicodeRichExtendedString`` is fully handled: per-string
  fHighByte, rich-run and ExtRst skips, and the spec's hard part —
  character data split across a CONTINUE boundary re-specifies the
  fHighByte flags byte at the continuation start ([MS-XLS] §2.5.293).
- sheet substreams: ``LabelSst`` (kind "s"), ``Label`` (inline, kind
  "inlineStr"), ``Number`` (IEEE double), ``RK``/``MulRk`` (packed
  30-bit int / truncated double, ×100 variants), ``BoolErr`` (kind
  "b", errors skipped).  Formula records are skipped by policy — the
  same "formula bodies excluded" rule as the .xlsx reader.
- numbers format deterministically: integral doubles print as
  integers, everything else as ``repr(float)`` — pinned so the
  value-level DuckDB oracle can recompute expected strings.

``extract_xls`` assembles sheet name + non-empty cells row-major under
the HTML joiner/span conventions (``doc_type="xls"`` joins the
byte-identity contract); ``build_xls`` writes deterministic workbooks
(shared vs inline strings, RK vs NUMBER, forced-small SST records so
the CONTINUE split path is honestly exercised) for corpus closure.
"""

from __future__ import annotations

import struct

from .cfb import build_cfb, cfb_entries, cfb_read
from .dom import collapse_ws
from .docx import docx_to_text

_WB_STREAM = "Workbook"

_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205

_MAX_RECORDS = 1 << 20


def _records(stream: bytes, start: int = 0):
    """Yield (id, offset_of_data, data) from a BIFF record stream."""
    i, n = start, len(stream)
    count = 0
    while i + 4 <= n:
        rid, ln = struct.unpack_from("<HH", stream, i)
        data = stream[i + 4:i + 4 + ln]
        if len(data) < ln:
            raise ValueError("xls: truncated record")
        yield rid, i, data
        i += 4 + ln
        count += 1
        if count > _MAX_RECORDS:
            raise ValueError("xls: record stream too long")
        if rid == _EOF and start != 0:
            return


def _fmt_num(v: float) -> str:
    """Deterministic double → string (pinned for the value oracles)."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _decode_rk(rk: int) -> float:
    v: float
    if rk & 0x02:                                  # fInt: signed 30-bit
        iv = rk >> 2
        if iv & 0x20000000:
            iv -= 0x40000000
        v = float(iv)
    else:                                          # top 30 bits of a double
        v = struct.unpack("<d", struct.pack("<I", 0)
                          + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return v / 100.0 if rk & 0x01 else v


class _SstCursor:
    """Byte cursor over an SST record + its CONTINUE chain, with the
    character-split flags-byte rule."""

    def __init__(self, segments: list[bytes]):
        self.segs = segments
        self.si = 0
        self.off = 0

    def _avail(self) -> int:
        return len(self.segs[self.si]) - self.off

    def _advance_seg(self) -> None:
        self.si += 1
        self.off = 0
        if self.si >= len(self.segs):
            raise ValueError("xls: SST exhausted mid-string")

    def read(self, n: int) -> bytes:
        """Fixed fields: concatenate across boundaries (no flags byte)."""
        out = bytearray()
        while n > 0:
            if self._avail() == 0:
                self._advance_seg()
            take = min(n, self._avail())
            seg = self.segs[self.si]
            out += seg[self.off:self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def skip(self, n: int) -> None:
        self.read(n)

    def read_chars(self, cch: int, high: bool) -> str:
        out: list[str] = []
        left = cch
        while left > 0:
            if self._avail() == 0:
                self._advance_seg()
                high = bool(self.read(1)[0] & 0x01)   # re-specified flags
            width = 2 if high else 1
            take_chars = min(left, self._avail() // width)
            if take_chars == 0:
                raise ValueError("xls: split inside a character")
            raw = self.read(take_chars * width)
            out.append(raw.decode("utf-16-le" if high else "latin-1",
                                  "replace"))
            left -= take_chars
        return "".join(out)

    def done(self) -> bool:
        return (self.si == len(self.segs) - 1
                and self.off >= len(self.segs[-1])) or \
            self.si >= len(self.segs)


def _parse_sst(segments: list[bytes]) -> list[str]:
    cur = _SstCursor(segments)
    _total, unique = struct.unpack("<ii", cur.read(8))
    if unique < 0 or unique > 1 << 22:
        raise ValueError("xls: implausible SST count")
    out: list[str] = []
    for _ in range(unique):
        cch, = struct.unpack("<H", cur.read(2))
        flags = cur.read(1)[0]
        high = bool(flags & 0x01)
        crun = struct.unpack("<H", cur.read(2))[0] if flags & 0x08 else 0
        cbext = struct.unpack("<i", cur.read(4))[0] if flags & 0x04 else 0
        out.append(cur.read_chars(cch, high))
        cur.skip(4 * crun + max(0, cbext))
    return out


def _short_string(data: bytes, off: int) -> tuple[str, int]:
    """BIFF8 ShortXLUnicodeString (cch u8, flags u8, chars)."""
    cch = data[off]
    high = bool(data[off + 1] & 0x01)
    w = 2 if high else 1
    raw = data[off + 2:off + 2 + cch * w]
    return (raw.decode("utf-16-le" if high else "latin-1", "replace"),
            off + 2 + cch * w)


def parse_xls(payload: bytes) -> list[dict]:
    """bytes → cells across all sheets in workbook order, the
    ``parse_xlsx`` shape.  Raises ValueError on malformation."""
    entries = cfb_entries(payload)
    if _WB_STREAM not in entries:
        raise ValueError("xls: no Workbook stream")
    wb = cfb_read(payload, _WB_STREAM, entries)
    if len(wb) < 4 or struct.unpack_from("<H", wb, 0)[0] != _BOF:
        raise ValueError("xls: Workbook stream does not start with BOF")

    sheets: list[tuple[str, int]] = []
    sst: list[str] = []
    sst_segs: list[bytes] | None = None
    for rid, _off, data in _records(wb):
        if rid == _BOUNDSHEET:
            pos, = struct.unpack_from("<I", data, 0)
            name, _ = _short_string(data, 6)
            sheets.append((name, pos))
        elif rid == _SST:
            sst_segs = [data]
        elif rid == _CONTINUE and sst_segs is not None:
            sst_segs.append(data)
        elif sst_segs is not None and rid not in (_SST, _CONTINUE):
            sst = _parse_sst(sst_segs)
            sst_segs = None
        if rid == _EOF:
            break
    if sst_segs is not None:
        sst = _parse_sst(sst_segs)
    if not sheets:
        raise ValueError("xls: workbook declares no sheets")

    cells: list[dict] = []
    for name, pos in sheets:
        if pos + 4 > len(wb):
            raise ValueError("xls: sheet substream out of bounds")
        for rid, _off, data in _records(wb, pos):
            if rid == _LABELSST:
                rw, col, _ixfe, isst = struct.unpack_from("<HHHI", data, 0)
                if isst >= len(sst):
                    raise ValueError("xls: isst out of SST bounds")
                cells.append({"sheet": name, "row": rw + 1, "col": col + 1,
                              "kind": "s", "value": sst[isst]})
            elif rid == _LABEL:
                rw, col, _ixfe, cch = struct.unpack_from("<HHHH", data, 0)
                high = bool(data[8] & 0x01)
                w = 2 if high else 1
                raw = data[9:9 + cch * w]
                cells.append({"sheet": name, "row": rw + 1, "col": col + 1,
                              "kind": "inlineStr",
                              "value": raw.decode(
                                  "utf-16-le" if high else "latin-1",
                                  "replace")})
            elif rid == _NUMBER:
                rw, col, _ixfe = struct.unpack_from("<HHH", data, 0)
                v, = struct.unpack_from("<d", data, 6)
                cells.append({"sheet": name, "row": rw + 1, "col": col + 1,
                              "kind": "n", "value": _fmt_num(v)})
            elif rid == _RK:
                rw, col, _ixfe, rk = struct.unpack_from("<HHHI", data, 0)
                cells.append({"sheet": name, "row": rw + 1, "col": col + 1,
                              "kind": "n", "value": _fmt_num(_decode_rk(rk))})
            elif rid == _MULRK:
                rw, col0 = struct.unpack_from("<HH", data, 0)
                ncells = (len(data) - 6) // 6
                for k in range(ncells):
                    rk, = struct.unpack_from("<I", data, 4 + 6 * k + 2)
                    cells.append({"sheet": name, "row": rw + 1,
                                  "col": col0 + 1 + k, "kind": "n",
                                  "value": _fmt_num(_decode_rk(rk))})
            elif rid == _BOOLERR:
                rw, col, _ixfe, val, err = struct.unpack_from(
                    "<HHHBB", data, 0)
                if not err:                        # error cells are skipped
                    cells.append({"sheet": name, "row": rw + 1,
                                  "col": col + 1, "kind": "b",
                                  "value": str(int(bool(val)))})
            elif rid == _EOF:
                break
    return cells


def extract_xls(payload: bytes, joiner: str) -> dict:
    """Flagship-route assembly — sheet name then non-empty cells
    row-major, the ``extract_xlsx`` conventions exactly."""
    try:
        cells = parse_xls(payload)
        entries = cfb_entries(payload)
        wb = cfb_read(payload, _WB_STREAM, entries)
        order: list[str] = []
        for rid, _o, data in _records(wb):
            if rid == _BOUNDSHEET:
                order.append(_short_string(data, 6)[0])
            elif rid == _EOF:
                break
        blocks: list[str] = []
        dropped = 0
        for name in order:
            title = collapse_ws(name).strip()
            if title:
                blocks.append(title)
            else:
                dropped += 1
            mine = [c for c in cells if c["sheet"] == name]
            for c in sorted(mine, key=lambda c: (c["row"], c["col"])):
                text = collapse_ws(str(c["value"])).strip()
                if text:
                    blocks.append(text)
                else:
                    dropped += 1
    except ValueError as exc:
        return {"extracted_text": "", "spans": [], "n_blocks_kept": 0,
                "n_blocks_dropped": 0, "parse_ok": False,
                "error": f"xls: {exc}"}
    rows = [{"text": b} for b in blocks]
    text, spans, kept, _d = docx_to_text(rows, joiner)
    return {"extracted_text": text, "spans": spans, "n_blocks_kept": kept,
            "n_blocks_dropped": dropped, "parse_ok": True, "error": ""}


# --------------------------------------------------------------------------
# writer — corpus closure
# --------------------------------------------------------------------------

def _rec(rid: int, data: bytes) -> bytes:
    return struct.pack("<HH", rid, len(data)) + data


def _enc_string(s: str) -> tuple[bytes, bool]:
    try:
        return s.encode("latin-1"), False
    except UnicodeEncodeError:
        return s.encode("utf-16-le"), True


def _build_sst(strings: list[str], cap: int) -> bytes:
    """SST + CONTINUEs; strings split mid-characters when they overflow
    ``cap`` data bytes, re-specifying the flags byte per spec."""
    segs: list[bytearray] = [bytearray()]
    segs[0] += struct.pack("<ii", len(strings), len(strings))

    def room() -> int:
        return cap - len(segs[-1])

    for s in strings:
        raw, high = _enc_string(s)
        hdr = struct.pack("<HB", len(s), 0x01 if high else 0x00)
        if room() < len(hdr) + (2 if high else 1):
            segs.append(bytearray())               # header never splits
        segs[-1] += hdr
        w = 2 if high else 1
        i = 0
        while i < len(raw):
            if room() < w:
                segs.append(bytearray())
                segs[-1].append(0x01 if high else 0x00)  # flags byte
            take = min(len(raw) - i, (room() // w) * w)
            segs[-1] += raw[i:i + take]
            i += take
    out = _rec(_SST, bytes(segs[0]))
    for seg in segs[1:]:
        out += _rec(_CONTINUE, bytes(seg))
    return out


def build_xls(sheets: list[tuple[str, list[list[object]]]], *,
              shared: bool = True, use_rk: bool = True,
              sst_cap: int = 8224) -> bytes:
    """Deterministic BIFF8 workbook.  ``sheets`` = [(name, rows)] where
    each cell is str | int | float | bool | None (None = gap)."""
    strings: list[str] = []
    sidx: dict[str, int] = {}
    if shared:
        for _n, rows in sheets:
            for r in rows:
                for v in r:
                    if isinstance(v, str) and v not in sidx:
                        sidx[v] = len(strings)
                        strings.append(v)

    subs: list[bytes] = []
    for _name, rows in sheets:
        body = bytearray()
        body += _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010,
                                       0x0DBB, 0x07CC, 0, 0))
        for ri, r in enumerate(rows):
            for ci, v in enumerate(r):
                if v is None:
                    continue
                if isinstance(v, bool):
                    body += _rec(_BOOLERR, struct.pack(
                        "<HHHBB", ri, ci, 15, int(v), 0))
                elif isinstance(v, str):
                    if shared:
                        body += _rec(_LABELSST, struct.pack(
                            "<HHHI", ri, ci, 15, sidx[v]))
                    else:
                        raw, high = _enc_string(v)
                        body += _rec(_LABEL, struct.pack(
                            "<HHHHB", ri, ci, 15, len(v),
                            0x01 if high else 0x00) + raw)
                elif isinstance(v, int) and use_rk and -(1 << 29) <= v < (
                        1 << 29):
                    body += _rec(_RK, struct.pack(
                        "<HHHI", ri, ci, 15,
                        ((v & 0x3FFFFFFF) << 2 | 0x02) & 0xFFFFFFFF))
                else:
                    body += _rec(_NUMBER, struct.pack(
                        "<HHHd", ri, ci, 15, float(v)))
        body += _rec(_EOF, b"")
        subs.append(bytes(body))

    globals_ = bytearray()
    globals_ += _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005,
                                       0x0DBB, 0x07CC, 0, 0))
    bs_offsets: list[int] = []
    for name, _rows in sheets:
        raw, high = _enc_string(name)
        bs_offsets.append(len(globals_) + 4)       # lbPlyPos field offset
        globals_ += _rec(_BOUNDSHEET, struct.pack(
            "<IHBB", 0, 0, len(name), 0x01 if high else 0x00) + raw)
    if shared and strings:
        globals_ += _build_sst(strings, sst_cap)
    globals_ += _rec(_EOF, b"")

    # patch each BoundSheet8.lbPlyPos with its substream's position
    pos = len(globals_)
    for off, sub in zip(bs_offsets, subs):
        struct.pack_into("<I", globals_, off, pos)
        pos += len(sub)
    stream = bytes(globals_) + b"".join(subs)
    return build_cfb([(_WB_STREAM, stream)])
