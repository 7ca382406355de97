"""OOXML spreadsheet (.xlsx) extraction (SURVEY §2.2 M32, round 4).

Spreadsheets are the other OOXML container a crawl meets at volume
(open-data portals, budget tables, published registers).  The ZIP
layer is shared with ``core/docx.py``; this module adds the
SpreadsheetML markup (ECMA-376 Part 1 §18):

- ``parse_xlsx`` — workbook part discovery done properly: sheet
  name/order from ``xl/workbook.xml``, each sheet's part resolved
  through ``xl/_rels/workbook.xml.rels`` (r:id → Target), shared
  strings from ``xl/sharedStrings.xml`` (``<si>`` runs concatenate —
  rich-text ``<r><t>`` splits reassemble exactly).  Cells come from
  one bounded tag scan per sheet: ``r="B3"`` references decode to
  (row, col), reference-less cells advance column-wise per §18.3.1.4,
  ``t="s"`` indexes the shared table, ``t="inlineStr"`` reads
  ``<is><t>``, ``t="b"`` keeps the raw 0/1, numbers keep the raw
  ``<v>`` literal (no float roundtrip — the value a text pipeline
  wants is the one in the file).  Formula ``<f>`` bodies are NOT
  values and are excluded by construction (only ``<v>``/``<is>``
  capture).  Any malformation raises ValueError for error routing.
- ``extract_xlsx`` — flagship-route assembly under the HTML path's
  joiner/span conventions: per sheet, the sheet name then each
  non-empty cell value, row-major — the same block semantics as the
  docx table path, so ``doc_type="xlsx"`` rows join the byte-identity
  contract.
- ``build_xlsx`` — deterministic writer (minimal valid package:
  content types, rels, workbook, workbook rels, sheets, shared
  strings) cycling shared vs inline strings and stored vs deflate
  members, so the synthetic corpus stays closed (policy of
  ``core/pdf_write.py`` / ``core/docx.py``).

Scope: cell values only — styles/number formats (display formatting),
merged-cell geometry, and formula recomputation are out; dates arrive
as their serial numbers (honest: that IS the stored value).
"""

from __future__ import annotations

import re

from .dom import collapse_ws, decode_entities
from .docx import _TAG_RE, _local, build_zip, zip_entries, zip_read

_WORKBOOK = "xl/workbook.xml"
_WB_RELS = "xl/_rels/workbook.xml.rels"
_SHARED = "xl/sharedStrings.xml"
_XML_CAP = 8 << 20

_SHEET_TAG_RE = re.compile(r"<(?:\w+:)?sheet\s([^>]*)/?>")
_NAME_RE = re.compile(r"""(?:^|\s)name\s*=\s*["']([^"']*)["']""")
_RID_RE = re.compile(r"""(?:^|\s)r:id\s*=\s*["']([^"']*)["']""")
_REL_RE = re.compile(r"<(?:\w+:)?Relationship\s([^>]*)/?>")
_ID_RE = re.compile(r"""(?:^|\s)Id\s*=\s*["']([^"']*)["']""")
_TARGET_RE = re.compile(r"""(?:^|\s)Target\s*=\s*["']([^"']*)["']""")
_T_ATTR_RE = re.compile(r"""(?:^|\s)t\s*=\s*["']([^"']*)["']""")
_R_ATTR_RE = re.compile(r"""(?:^|\s)r\s*=\s*["']([^"']*)["']""")
_CELL_REF_RE = re.compile(r"^([A-Za-z]+)(\d+)$")


def is_xlsx(payload: bytes) -> bool:
    """Cheap container sniff (the workbook part name is verbatim in the
    central directory)."""
    return payload.startswith(b"PK\x03\x04") and b"xl/workbook.xml" in payload


def _col_index(letters: str) -> int:
    """A→1, Z→26, AA→27 (§18.8.30 ST_CellRef column part)."""
    n = 0
    for ch in letters.upper():
        n = n * 26 + (ord(ch) - 64)
    return n


def _sheet_parts(data: bytes, entries: dict) -> list[tuple[str, str]]:
    """[(sheet_name, member_path)] in workbook order."""
    wb = zip_read(data, _WORKBOOK, entries).decode("utf-8", "replace")
    rels = zip_read(data, _WB_RELS, entries).decode("utf-8", "replace")
    targets: dict[str, str] = {}
    for m in _REL_RE.finditer(rels[:_XML_CAP]):
        attrs = m.group(1)
        rid, tgt = _ID_RE.search(attrs), _TARGET_RE.search(attrs)
        if rid and tgt:
            t = tgt.group(1)
            targets[rid.group(1)] = (t.lstrip("/") if t.startswith("/")
                                     else "xl/" + t)
    sheets: list[tuple[str, str]] = []
    for m in _SHEET_TAG_RE.finditer(wb[:_XML_CAP]):
        attrs = m.group(1)
        name, rid = _NAME_RE.search(attrs), _RID_RE.search(attrs)
        if not (name and rid) or rid.group(1) not in targets:
            raise ValueError("xlsx: sheet without resolvable part")
        sheets.append((decode_entities(name.group(1)),
                       targets[rid.group(1)]))
    if not sheets:
        raise ValueError("xlsx: workbook declares no sheets")
    return sheets


def _shared_strings(data: bytes, entries: dict) -> list[str]:
    """sharedStrings.xml → the <si> table; rich-text runs concatenate.

    ``<rPh>`` phonetic runs (furigana hints, common in Japanese
    workbooks) and ``<phoneticPr>`` are NOT cell text — standard readers
    exclude them, so ``<t>`` capture is suppressed inside them
    (ADVICE r4)."""
    if _SHARED not in entries:
        return []
    xml = zip_read(data, _SHARED, entries).decode("utf-8", "replace")
    out: list[str] = []
    buf: list[str] = []
    in_si = in_t = False
    ph_depth = 0       # nesting inside <rPh>/<phoneticPr>
    hay = xml[:_XML_CAP]
    i, n = 0, len(hay)
    while i < n:
        lt = hay.find("<", i)
        if lt < 0:
            break
        if in_t and lt > i and ph_depth == 0:
            buf.append(hay[i:lt])
        m = _TAG_RE.match(hay, lt)
        if not m:
            i = lt + 1
            continue
        closing, raw_name, _attrs, selfclose = m.groups()
        name = _local(raw_name)
        if name == "si":
            if closing or selfclose:
                out.append(decode_entities("".join(buf)))
                buf, in_si, in_t = [], False, False
                ph_depth = 0
            else:
                buf, in_si, ph_depth = [], True, 0
        elif name in ("rph", "phoneticpr") and in_si:  # _local lowercases
            if closing:
                ph_depth = max(0, ph_depth - 1)
            elif not selfclose:
                ph_depth += 1
        elif name == "t" and in_si:
            in_t = not closing and not selfclose
        i = m.end()
    return out


def _parse_sheet(xml: str, sheet: str, shared: list[str]) -> list[dict]:
    """One worksheet part → cell dicts in document order."""
    cells: list[dict] = []
    hay = xml[:_XML_CAP]
    row = 0            # current row (1-based once set)
    next_col = 1
    cur: dict | None = None
    buf: list[str] = []
    capture = None     # "v" | "t" while inside a value element
    in_is = False
    i, n = 0, len(hay)
    while i < n:
        lt = hay.find("<", i)
        if lt < 0:
            break
        if capture and lt > i:
            buf.append(hay[i:lt])
        m = _TAG_RE.match(hay, lt)
        if not m:
            i = lt + 1
            continue
        closing, raw_name, attrs, selfclose = m.groups()
        name = _local(raw_name)
        if name == "row" and not closing:
            rm = _R_ATTR_RE.search(attrs)
            row = int(rm.group(1)) if rm else row + 1
            next_col = 1
        elif name == "c":
            if not closing:
                rm = _R_ATTR_RE.search(attrs)
                if rm:
                    ref = _CELL_REF_RE.match(rm.group(1))
                    if not ref:
                        raise ValueError("xlsx: bad cell reference")
                    col = _col_index(ref.group(1))
                    row = int(ref.group(2))
                else:
                    col = next_col
                next_col = col + 1
                tm = _T_ATTR_RE.search(attrs)
                cur = {"sheet": sheet, "row": row, "col": col,
                       "kind": tm.group(1) if tm else "n"}
                if selfclose:
                    cur = None       # valueless cell carries nothing
            else:
                cur = None
            capture, buf, in_is = None, [], False
        elif name == "is" and cur is not None:
            in_is = not closing and not selfclose
        elif name == "v" and cur is not None:
            if closing:
                raw = decode_entities("".join(buf))
                if cur["kind"] == "s":
                    try:
                        val = shared[int(raw)]
                    except (ValueError, IndexError) as exc:
                        raise ValueError(
                            f"xlsx: bad shared-string index {raw!r}"
                        ) from exc
                else:
                    val = raw
                cells.append({**cur, "value": val})
                cur = None
                capture = None
            elif not selfclose:
                capture, buf = "v", []
        elif name == "t" and cur is not None and in_is:
            if closing:
                cells.append({**cur, "kind": "inlineStr",
                              "value": decode_entities("".join(buf))})
                cur = None
                capture = None
            elif not selfclose:
                capture, buf = "t", []
        # <f> formula bodies: never captured (capture only set by v/t)
        i = m.end()
    return cells


def parse_xlsx(data: bytes) -> list[dict]:
    """bytes → cells across all sheets in workbook order.  Each cell:
    {sheet, row, col, kind, value} — kind one of n/s/inlineStr/b/str.
    Raises ValueError on any malformation."""
    entries = zip_entries(data)
    shared = _shared_strings(data, entries)
    cells: list[dict] = []
    for sheet_name, part in _sheet_parts(data, entries):
        xml = zip_read(data, part, entries).decode("utf-8", "replace")
        cells.extend(_parse_sheet(xml, sheet_name, shared))
    return cells


def extract_xlsx(payload: bytes, joiner: str) -> dict:
    """Flagship-route assembly: per sheet, sheet name then non-empty
    cell values row-major — the docx-table block conventions."""
    try:
        entries = zip_entries(payload)
        shared = _shared_strings(payload, entries)
        blocks: list[str] = []
        dropped = 0
        for sheet_name, part in _sheet_parts(payload, entries):
            xml = zip_read(payload, part, entries).decode("utf-8", "replace")
            cells = _parse_sheet(xml, sheet_name, shared)
            title = collapse_ws(sheet_name).strip()
            if title:
                blocks.append(title)
            else:
                dropped += 1
            for c in sorted(cells, key=lambda c: (c["row"], c["col"])):
                text = collapse_ws(str(c["value"])).strip()
                if text:
                    blocks.append(text)
                else:
                    dropped += 1
    except ValueError as exc:
        return {"extracted_text": "", "spans": [], "n_blocks_kept": 0,
                "n_blocks_dropped": 0, "parse_ok": False,
                "error": f"xlsx: {exc}"}
    spans: list[tuple[int, int]] = []
    pos = 0
    for k, b in enumerate(blocks):
        if k:
            pos += len(joiner)
        spans.append((pos, pos + len(b)))
        pos += len(b)
    return {"extracted_text": joiner.join(blocks), "spans": spans,
            "n_blocks_kept": len(blocks), "n_blocks_dropped": dropped,
            "parse_ok": True, "error": ""}


# --------------------------------------------------------------------------
# Writer — minimal valid SpreadsheetML package
# --------------------------------------------------------------------------

def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _col_letters(col: int) -> str:
    s = ""
    while col > 0:
        col, r = divmod(col - 1, 26)
        s = chr(65 + r) + s
    return s


def build_xlsx(sheets: list[tuple[str, list[list[object]]]], *,
               deflate: bool = True, shared: bool = True) -> bytes:
    """sheets = [(name, rows)] where each row is a list of cell values
    (str | int | float | bool | None).  Strings go through the shared
    table when ``shared`` else inline; None leaves a gap (the next cell
    carries an explicit reference)."""
    strings: list[str] = []
    index: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    sheet_xmls: list[bytes] = []
    for _name, rows in sheets:
        parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 '<worksheet xmlns="http://schemas.openxmlformats.org/'
                 'spreadsheetml/2006/main"><sheetData>']
        for r, cols in enumerate(rows, start=1):
            parts.append(f'<row r="{r}">')
            for ci, v in enumerate(cols, start=1):
                if v is None:
                    continue
                ref = f"{_col_letters(ci)}{r}"
                if isinstance(v, bool):
                    parts.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
                elif isinstance(v, str):
                    if shared:
                        parts.append(
                            f'<c r="{ref}" t="s"><v>{sref(v)}</v></c>')
                    else:
                        parts.append(f'<c r="{ref}" t="inlineStr"><is>'
                                     f'<t xml:space="preserve">{_esc(v)}'
                                     "</t></is></c>")
                else:
                    parts.append(f'<c r="{ref}"><v>{v}</v></c>')
            parts.append("</row>")
        parts.append("</sheetData></worksheet>")
        sheet_xmls.append("".join(parts).encode())

    n = len(sheets)
    ct = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
          'content-types">'
          '<Default Extension="rels" ContentType="application/vnd.'
          'openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/xl/workbook.xml" ContentType="application/'
          'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>']
    for k in range(1, n + 1):
        ct.append(f'<Override PartName="/xl/worksheets/sheet{k}.xml" '
                  'ContentType="application/vnd.openxmlformats-office'
                  'document.spreadsheetml.worksheet+xml"/>')
    if strings:
        ct.append('<Override PartName="/xl/sharedStrings.xml" ContentType='
                  '"application/vnd.openxmlformats-officedocument.'
                  'spreadsheetml.sharedStrings+xml"/>')
    ct.append("</Types>")

    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/office'
        'Document" Target="xl/workbook.xml"/></Relationships>')

    wb = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
          '2006/main" xmlns:r="http://schemas.openxmlformats.org/office'
          'Document/2006/relationships"><sheets>']
    rels = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">']
    for k, (name, _rows) in enumerate(sheets, start=1):
        wb.append(f'<sheet name="{_esc(name)}" sheetId="{k}" '
                  f'r:id="rId{k}"/>')
        rels.append(f'<Relationship Id="rId{k}" Type="http://schemas.'
                    'openxmlformats.org/officeDocument/2006/relationships/'
                    f'worksheet" Target="worksheets/sheet{k}.xml"/>')
    wb.append("</sheets></workbook>")
    if strings:
        rels.append(f'<Relationship Id="rId{n + 1}" Type="http://schemas.'
                    'openxmlformats.org/officeDocument/2006/relationships/'
                    'sharedStrings" Target="sharedStrings.xml"/>')
    rels.append("</Relationships>")

    members: list[tuple[str, bytes]] = [
        ("[Content_Types].xml", "".join(ct).encode()),
        ("_rels/.rels", root_rels.encode()),
        (_WORKBOOK, "".join(wb).encode()),
        (_WB_RELS, "".join(rels).encode()),
    ]
    for k, xml in enumerate(sheet_xmls, start=1):
        members.append((f"xl/worksheets/sheet{k}.xml", xml))
    if strings:
        ss = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
              f'2006/main" count="{len(strings)}" '
              f'uniqueCount="{len(strings)}">']
        ss.extend(f'<si><t xml:space="preserve">{_esc(s)}</t></si>'
                  for s in strings)
        ss.append("</sst>")
        members.append((_SHARED, "".join(ss).encode()))
    return build_zip(members, deflate=deflate)
