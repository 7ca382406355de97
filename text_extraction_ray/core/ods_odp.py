"""OpenDocument spreadsheet (.ods) + presentation (.odp) extraction —
M47/M48 (round 5).

Completes the ODF family (text landed as M34): the same ZIP layer
(`core/docx.py`) and the same `content.xml` tag-scan discipline as
`core/odt.py`, over the two remaining grammars (OASIS ODF 1.2 Part 1):

- **ODS** (§9 tables): ``<table:table table:name>`` sheets of
  ``<table:table-row>`` rows of ``<table:table-cell>`` cells.  Typed
  cells carry their canonical value in attributes
  (``office:value`` / ``office:boolean-value`` / ``office:date-value``
  per ``office:value-type``); string cells carry ``<text:p>`` content.
  ``table:number-columns-repeated`` advances the column cursor and
  expands NON-EMPTY cells up to a bound (real files pad row tails with
  thousands of repeated empties — those must advance, never expand).
  Covered tables (``table:covered-table-cell``) advance like empties.
- **ODP** (§10 drawing pages): ``<draw:page>`` slides whose
  ``<text:p>`` paragraphs (inside frames/text-boxes) collect in
  document order; notes (``<presentation:notes>``) are excluded like
  ODT footnotes.

Cell/paragraph output shapes mirror ``core/xlsx.py`` / ``core/pptx.py``
so both generations of each format share one assembly convention, and
``extract_ods`` / ``extract_odp`` join the byte-identity contract.

Writers ``build_ods`` / ``build_odp`` keep the corpus closed
(mimetype-first stored member per ODF Part 3 §3.3, manifest,
minimal content.xml).
"""

from __future__ import annotations

import re

from .docx import _TAG_RE, _local, zip_entries, zip_read
from .dom import collapse_ws, decode_entities
from .odt import build_odt  # noqa: F401 — family import for callers

_CONTENT = "content.xml"
MIMETYPE_ODS = b"application/vnd.oasis.opendocument.spreadsheet"
MIMETYPE_ODP = b"application/vnd.oasis.opendocument.presentation"
_XML_CAP = 8 << 20
_REPEAT_CAP = 1024           # expansion bound for repeated NON-EMPTY cells

_ATTR_RE = re.compile(
    r"""([A-Za-z][\w:.\-]*)\s*=\s*(["'])(.*?)\2""", re.DOTALL)


def _attrs(raw: str) -> dict[str, str]:
    return {m.group(1).rsplit(":", 1)[-1].lower():
            decode_entities(m.group(3))
            for m in _ATTR_RE.finditer(raw)}


def is_ods(payload: bytes) -> bool:
    return payload.startswith(b"PK\x03\x04") and MIMETYPE_ODS in payload


def is_odp(payload: bytes) -> bool:
    return payload.startswith(b"PK\x03\x04") and MIMETYPE_ODP in payload


# --------------------------------------------------------------------------
# ODS — content.xml → cells (the parse_xlsx output shape)
# --------------------------------------------------------------------------

def _fmt_float(v: str) -> str:
    """ODF stores canonical decimal strings; normalize int-valued
    floats to the BIFF presentation (`core/xls_legacy.py` pin) so both
    spreadsheet generations format identically."""
    try:
        f = float(v)
    except ValueError:
        return v
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)


def parse_ods(doc: str) -> list[dict]:
    """content.xml → cells across all sheets in document order.  Each:
    {sheet, row, col, kind, value} — kind one of n/s/b/date (the
    xlsx-family shape; row/col 1-based)."""
    hay = doc[:_XML_CAP]
    cells: list[dict] = []
    sheet = ""
    row = 0
    col = 0
    in_cell = False
    cell_repeat = 1
    cell_kind = ""
    cell_attr_value: str | None = None
    buf: list[str] = []
    i, n = 0, len(hay)
    while i < n:
        lt = hay.find("<", i)
        if lt < 0:
            break
        if in_cell and lt > i:
            buf.append(hay[i:lt])
        m = _TAG_RE.match(hay, lt)
        if not m:
            i = lt + 1
            continue
        closing, raw_name, attrs, selfclose = m.groups()
        name = _local(raw_name)
        if name == "table" and not closing:
            a = _attrs(attrs)
            sheet = a.get("name", "")
            row = 0
        elif name == "table-row":
            if not closing:
                row += 1
                col = 0
                a = _attrs(attrs)
                rep = int(a.get("number-rows-repeated", "1") or 1)
                # repeated rows carry no content we keep; advance cursor
                row += max(0, min(rep, 1 << 20) - 1)
        elif name in ("table-cell", "covered-table-cell"):
            if not closing:
                # open OR self-closing: typed values live in attributes
                a = _attrs(attrs)
                in_cell = True
                buf = []
                cell_repeat = int(a.get("number-columns-repeated",
                                        "1") or 1)
                vt = a.get("value-type", "")
                if vt in ("float", "percentage", "currency"):
                    cell_kind = "n"
                    cell_attr_value = _fmt_float(a.get("value", ""))
                elif vt == "boolean":
                    cell_kind = "b"
                    cell_attr_value = ("1" if a.get("boolean-value", "")
                                       == "true" else "0")
                elif vt == "date":
                    cell_kind = "date"
                    cell_attr_value = a.get("date-value", "")
                else:
                    cell_kind = "s"
                    cell_attr_value = None
            if closing or selfclose:
                if in_cell:
                    if name == "table-cell":
                        if cell_attr_value is not None:
                            value = cell_attr_value
                        else:
                            value = collapse_ws(
                                decode_entities("".join(buf))).strip()
                        if value != "":
                            for k in range(min(cell_repeat, _REPEAT_CAP)):
                                cells.append({"sheet": sheet, "row": row,
                                              "col": col + 1 + k,
                                              "kind": cell_kind or "s",
                                              "value": value})
                    col += cell_repeat
                in_cell = False
                buf = []
                cell_attr_value = None
                cell_kind = ""
                cell_repeat = 1
        i = m.end()
    return cells


def _content_xml(payload: bytes, kind: str) -> str:
    """Zipped package OR flat ODF (M50: a single ``<office:document``
    XML file) → content XML text.  Raises ValueError on container
    malformation."""
    if payload.lstrip(b"\xef\xbb\xbf \t\r\n")[:1] == b"<":
        from .encoding import decode_xml

        return decode_xml(payload)[0]
    entries = zip_entries(payload)
    return zip_read(payload, _CONTENT, entries).decode("utf-8", "replace")


def extract_ods(payload: bytes, joiner: str) -> dict:
    """Flagship-route assembly — the ``extract_xlsx`` conventions:
    per sheet, sheet name then non-empty cell values row-major."""
    try:
        xml = _content_xml(payload, "ods")
    except ValueError as exc:
        return {"extracted_text": "", "spans": [], "n_blocks_kept": 0,
                "n_blocks_dropped": 0, "parse_ok": False,
                "error": f"ods: {exc}"}
    cells = parse_ods(xml)
    blocks: list[str] = []
    dropped = 0
    seen_sheets: list[str] = []
    for c in cells:
        if c["sheet"] not in seen_sheets:
            seen_sheets.append(c["sheet"])
    by_sheet = {s: [c for c in cells if c["sheet"] == s]
                for s in seen_sheets}
    for s in seen_sheets:
        title = collapse_ws(s).strip()
        if title:
            blocks.append(title)
        else:
            dropped += 1
        for c in sorted(by_sheet[s], key=lambda c: (c["row"], c["col"])):
            text = collapse_ws(str(c["value"])).strip()
            if text:
                blocks.append(text)
            else:
                dropped += 1
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
# ODP — content.xml → slide paragraphs (the parse_ppt output shape)
# --------------------------------------------------------------------------

def parse_odp(doc: str) -> list[dict]:
    """content.xml → paragraphs per slide in document order.  Each:
    {slide (1-based), para_idx (0-based), text} — the ppt-family
    shape.  Presenter notes are excluded (the ODT footnote policy)."""
    hay = doc[:_XML_CAP]
    out: list[dict] = []
    slide = 0
    para_idx = 0
    in_p = False
    exclude_depth = 0
    buf: list[str] = []
    i, n = 0, len(hay)
    while i < n:
        lt = hay.find("<", i)
        if lt < 0:
            break
        if in_p and not exclude_depth and lt > i:
            buf.append(hay[i:lt])
        m = _TAG_RE.match(hay, lt)
        if not m:
            i = lt + 1
            continue
        closing, raw_name, attrs, selfclose = m.groups()
        name = _local(raw_name)
        if name == "notes":
            if selfclose:
                pass
            elif closing:
                exclude_depth = max(0, exclude_depth - 1)
            else:
                exclude_depth += 1
        elif exclude_depth:
            pass
        elif name == "page" and not closing:
            slide += 1
            para_idx = 0
        elif name == "p" and slide:
            if closing or selfclose:
                if in_p or selfclose:
                    text = collapse_ws(
                        decode_entities("".join(buf))).strip()
                    out.append({"slide": slide, "para_idx": para_idx,
                                "text": text})
                    para_idx += 1
                in_p, buf = False, []
            else:
                in_p, buf = True, []
        elif name in ("tab", "line-break") and in_p:
            buf.append(" ")
        elif name == "s" and in_p and not closing:
            buf.append(" ")
        i = m.end()
    return out


def extract_odp(payload: bytes, joiner: str) -> dict:
    """Flagship-route assembly — the ``extract_pptx`` conventions:
    non-empty paragraphs in slide order."""
    try:
        xml = _content_xml(payload, "odp")
    except ValueError as exc:
        return {"extracted_text": "", "spans": [], "n_blocks_kept": 0,
                "n_blocks_dropped": 0, "parse_ok": False,
                "error": f"odp: {exc}"}
    paras = parse_odp(xml)
    pieces = [p["text"] for p in paras if p["text"]]
    dropped = len(paras) - len(pieces)
    spans: list[tuple[int, int]] = []
    pos = 0
    for k, p in enumerate(pieces):
        if k:
            pos += len(joiner)
        spans.append((pos, pos + len(p)))
        pos += len(p)
    return {"extracted_text": joiner.join(pieces), "spans": spans,
            "n_blocks_kept": len(pieces), "n_blocks_dropped": dropped,
            "parse_ok": True, "error": ""}


# --------------------------------------------------------------------------
# Writers — minimal valid ODF packages (fixtures stay closed)
# --------------------------------------------------------------------------

def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _manifest(media: bytes) -> bytes:
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:'
        'opendocument:xmlns:manifest:1.0" manifest:version="1.2">'
        f'<manifest:file-entry manifest:full-path="/" manifest:media-type='
        f'"{media.decode()}"/>'
        '<manifest:file-entry manifest:full-path="content.xml" '
        'manifest:media-type="text/xml"/></manifest:manifest>'
    ).encode()


def _package(media: bytes, content: bytes, deflate: bool) -> bytes:
    from .docx import build_zip

    return build_zip([
        ("mimetype", media),
        ("content.xml", content),
        ("META-INF/manifest.xml", _manifest(media)),
    ], deflate=deflate, store_first=True)  # §3.3: mimetype STORED —
    # unlike ODT's 39 bytes, these mimetypes shrink under deflate, so
    # the size fallback alone would compress them


def build_ods(sheets: list[tuple[str, list[list[object]]]], *,
              deflate: bool = True, repeat_cols: bool = False) -> bytes:
    """[(sheet_name, rows)...] → ODS bytes.  Cell types map from Python
    types (str → string paragraphs, int/float → office:value, bool →
    office:boolean-value, None → empty cell advancing the cursor);
    ``repeat_cols`` emits a number-columns-repeated pair for the first
    duplicated adjacent value (reader expansion path)."""
    tables = []
    for name, rows in sheets:
        trs = []
        for r in rows:
            tds = []
            k = 0
            while k < len(r):
                v = r[k]
                if v is None:
                    tds.append("<table:table-cell/>")
                    k += 1
                    continue
                if isinstance(v, bool):
                    tds.append(
                        '<table:table-cell office:value-type="boolean" '
                        f'office:boolean-value='
                        f'"{"true" if v else "false"}"/>')
                elif isinstance(v, (int, float)):
                    tds.append(
                        '<table:table-cell office:value-type="float" '
                        f'office:value="{v}"/>')
                elif (repeat_cols and k + 1 < len(r) and r[k + 1] == v
                        and isinstance(v, str)):
                    tds.append(
                        '<table:table-cell table:number-columns-repeated'
                        f'="2"><text:p>{_esc(v)}</text:p>'
                        "</table:table-cell>")
                    k += 1
                else:
                    tds.append("<table:table-cell>"
                               f"<text:p>{_esc(str(v))}</text:p>"
                               "</table:table-cell>")
                k += 1
            trs.append(f"<table:table-row>{''.join(tds)}</table:table-row>")
        tables.append(f'<table:table table:name="{_esc(name)}">'
                      f"{''.join(trs)}</table:table>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        f"<office:body><office:spreadsheet>{''.join(tables)}"
        "</office:spreadsheet></office:body></office:document-content>"
    ).encode()
    return _package(MIMETYPE_ODS, content, deflate)


def build_odp(slides: list[list[str]], *,
              deflate: bool = True, with_notes: bool = False) -> bytes:
    """[[paragraph...]...] → ODP bytes; ``with_notes`` plants a
    presenter-notes paragraph the reader must exclude."""
    pages = []
    for k, paras in enumerate(slides):
        body = "".join(
            "<draw:frame><draw:text-box>"
            f"<text:p>{_esc(p)}</text:p>"
            "</draw:text-box></draw:frame>"
            for p in paras)
        notes = ("<presentation:notes><draw:frame><draw:text-box>"
                 "<text:p>presenter only</text:p>"
                 "</draw:text-box></draw:frame></presentation:notes>"
                 if with_notes else "")
        pages.append(f'<draw:page draw:name="page{k + 1}">'
                     f"{body}{notes}</draw:page>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0" '
        'xmlns:presentation="urn:oasis:names:tc:opendocument:xmlns:'
        'presentation:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        f"<office:body><office:presentation>{''.join(pages)}"
        "</office:presentation></office:body></office:document-content>"
    ).encode()
    return _package(MIMETYPE_ODP, content, deflate)
