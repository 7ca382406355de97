"""OOXML word-processing (.docx) extraction (SURVEY §2.2 M31, round 4).

Office documents are a standing fraction of any web crawl (reports,
forms, minutes — everything institutions publish), and after HTML and
PDF they are the next doc type a text pipeline must read natively.  A
.docx is a ZIP archive whose ``word/document.xml`` member carries the
text as ``<w:p>`` paragraphs of ``<w:r>`` runs of ``<w:t>`` literals
(ECMA-376 Part 1 §17.3) — both layers are implemented here from the
container spec (APPNOTE.TXT) and the markup spec, stdlib-only (zlib for
the Deflate members, same dependency the PDF Flate path uses):

- ``zip_read`` — minimal ZIP reader: EOCD scan from the tail, central
  directory walk, local-header skip, stored/deflate members, CRC-32
  verified, 64 MiB inflate cap (zip-bomb bound).  Any malformation is
  a ``ValueError`` for the caller's error routing.
- ``parse_docx`` — one bounded tag scan (the DOM grammar, namespace
  prefixes stripped like ``core.feed``): ``<w:t>`` text (entity decode
  delegated to ``core.dom``), ``<w:tab/>``/``<w:br/>`` fold to a
  space, paragraphs close at ``</w:p>``, table cells are paragraphs
  like any others (row-major document order), ``<w:pStyle
  w:val="HeadingN"/>`` marks heading paragraphs.  Runs concatenate
  EXACTLY (split-mid-word runs with ``xml:space="preserve"`` must
  reassemble byte-identically) and then collapse whitespace per
  paragraph under the HTML path's conventions.
- ``docx_to_text`` — assembles non-empty paragraphs under the SAME
  joiner/span conventions as ``html_extract.assemble`` so
  ``extract_document`` routes ``doc_type="docx"`` rows straight into
  the byte-identity contract.
- ``build_docx`` — the matching writer (minimal valid OOXML package:
  ``[Content_Types].xml``, ``_rels/.rels``, ``word/document.xml``;
  stored or deflate members, fixed DOS timestamp) so the synthetic
  corpus stays closed under the repo's own generator, same policy as
  ``core/pdf_write.py`` / ``core/gif.py``.

Scope (documented, honestly routed): only ``word/document.xml`` is
read — headers/footers/footnotes/comments are separate members a later
round can fold in; ``.xlsx``/``.pptx`` share the container but not the
markup and stay on the error route.
"""

from __future__ import annotations

import re
import struct
import zlib

from .dom import collapse_ws, decode_entities

_EOCD_SIG = b"PK\x05\x06"
_CDIR_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"
_INFLATE_CAP = 64 << 20          # zip-bomb bound per member
_DOC_MEMBER = "word/document.xml"


# --------------------------------------------------------------------------
# ZIP container (APPNOTE.TXT §4.3) — reader
# --------------------------------------------------------------------------

def zip_entries(data: bytes) -> dict[str, tuple[int, int, int, int, int]]:
    """Central-directory walk → {name: (method, comp_size, uncomp_size,
    local_header_offset, crc32)}.  Raises ValueError on any malformation.
    The CRC comes from the central directory — always populated, unlike
    the local header of a data-descriptor (flag bit 3) member."""
    # EOCD: fixed 22 bytes + variable comment; scan the final 64 KiB + 22
    tail_start = max(0, len(data) - 65557)
    pos = data.rfind(_EOCD_SIG, tail_start)
    if pos < 0 or pos + 22 > len(data):
        raise ValueError("zip: no end-of-central-directory record")
    n_entries, = struct.unpack_from("<H", data, pos + 10)
    cd_size, cd_off = struct.unpack_from("<II", data, pos + 12)
    if cd_off + cd_size > len(data):
        raise ValueError("zip: central directory out of bounds")
    entries: dict[str, tuple[int, int, int, int, int]] = {}
    p = cd_off
    for _ in range(n_entries):
        if data[p:p + 4] != _CDIR_SIG:
            raise ValueError("zip: bad central-directory signature")
        method, = struct.unpack_from("<H", data, p + 10)
        crc, comp_size, uncomp_size = struct.unpack_from("<III", data, p + 16)
        name_len, extra_len, comment_len = struct.unpack_from("<HHH", data, p + 28)
        local_off, = struct.unpack_from("<I", data, p + 42)
        name = data[p + 46:p + 46 + name_len].decode("utf-8", "replace")
        entries[name] = (method, comp_size, uncomp_size, local_off, crc)
        p += 46 + name_len + extra_len + comment_len
    return entries


def zip_read(data: bytes, name: str,
             entries: dict | None = None) -> bytes:
    """Extract one member's bytes; CRC-verified.  Raises ValueError."""
    if entries is None:
        entries = zip_entries(data)
    if name not in entries:
        raise ValueError(f"zip: no member {name!r}")
    method, comp_size, uncomp_size, off, want_crc = entries[name]
    if uncomp_size > _INFLATE_CAP:
        raise ValueError("zip: member exceeds inflate cap")
    if data[off:off + 4] != _LOCAL_SIG:
        raise ValueError("zip: bad local-header signature")
    # local header repeats name/extra with its OWN lengths (§4.3.7)
    l_name, l_extra = struct.unpack_from("<HH", data, off + 26)
    start = off + 30 + l_name + l_extra
    raw = data[start:start + comp_size]
    if len(raw) != comp_size:
        raise ValueError("zip: truncated member data")
    if method == 0:
        out = raw
    elif method == 8:
        try:
            out = zlib.decompress(raw, -15, _INFLATE_CAP + 1)
        except zlib.error as exc:
            raise ValueError(f"zip: deflate error: {exc}") from exc
    else:
        raise ValueError(f"zip: unsupported method {method}")
    if len(out) != uncomp_size:
        raise ValueError("zip: size mismatch after inflate")
    if zlib.crc32(out) & 0xFFFFFFFF != want_crc:
        raise ValueError("zip: CRC mismatch")
    return out


def is_docx(payload: bytes) -> bool:
    """Cheap container sniff: ZIP magic + the document member's name
    appearing anywhere (it occurs verbatim in the central directory)."""
    return payload.startswith(_LOCAL_SIG) and b"word/document.xml" in payload


# --------------------------------------------------------------------------
# word/document.xml → paragraphs
# --------------------------------------------------------------------------

_TAG_RE = re.compile(
    r"<(/?)([A-Za-z][\w:.\-]*)"
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)"
    r"(/?)>",
    re.DOTALL,
)
_STYLE_VAL_RE = re.compile(r"""w:val\s*=\s*["']([^"']*)["']""")
_XML_CAP = 8 << 20               # bound malformed giant documents


def _local(name: str) -> str:
    return name.rsplit(":", 1)[-1].lower()


def parse_docx(doc: str) -> list[dict]:
    """document.xml text → paragraphs in document order.

    Each paragraph: ``{"text": str (ws-collapsed), "style": str
    ("" or the w:pStyle val), "in_table": bool}``.  Total on any text;
    malformed markup outside recognized tags is skipped.
    """
    hay = doc[:_XML_CAP]
    paras: list[dict] = []
    buf: list[str] = []
    style = ""
    table_depth = 0
    in_p = False
    in_t = False
    i, n = 0, len(hay)
    while i < n:
        lt = hay.find("<", i)
        if lt < 0:
            if in_t:
                buf.append(hay[i:])
            break
        if in_t and lt > i:
            buf.append(hay[i:lt])
        m = _TAG_RE.match(hay, lt)
        if not m:
            i = lt + 1
            continue
        closing, raw_name, attrs, selfclose = m.groups()
        name = _local(raw_name)
        if name == "t":
            # <w:t> literal text; self-closing = empty
            in_t = bool(in_p) and not closing and not selfclose
            if closing:
                in_t = False
        elif name == "p":
            if closing or selfclose:
                # <w:p/> is Word's empty paragraph — counts as a
                # dropped block like an open/close pair with no runs
                if in_p or selfclose:
                    text = collapse_ws(decode_entities("".join(buf))).strip()
                    paras.append({"text": text, "style": style,
                                  "in_table": table_depth > 0})
                in_p, in_t, buf, style = False, False, [], ""
            else:
                in_p, in_t, buf, style = True, False, [], ""
        elif name in ("tab", "br", "cr") and in_p:
            buf.append(" ")
        elif name == "pstyle" and in_p and not closing:
            sm = _STYLE_VAL_RE.search(attrs)
            if sm:
                style = sm.group(1)
        elif name == "tbl":
            table_depth += (-1 if closing else 1)
            if table_depth < 0:
                table_depth = 0
        # <w:instrText>/<w:delText> literals are NOT captured: only a
        # <w:t> open sets in_t, so field codes and tracked deletions
        # fall out of the text by construction
        i = m.end()
    return paras


def docx_to_text(paras: list[dict], joiner: str
                 ) -> tuple[str, list[tuple[int, int]], int, int]:
    """Assemble non-empty paragraphs under ``html_extract.assemble``'s
    conventions.  Returns (text, spans, kept, dropped)."""
    pieces = [p["text"] for p in paras if p["text"]]
    dropped = len(paras) - len(pieces)
    spans: list[tuple[int, int]] = []
    pos = 0
    for k, p in enumerate(pieces):
        if k:
            pos += len(joiner)
        spans.append((pos, pos + len(p)))
        pos += len(p)
    return joiner.join(pieces), spans, len(pieces), dropped


def extract_docx(payload: bytes, joiner: str) -> dict:
    """bytes → {extracted_text, spans, n_blocks_kept, n_blocks_dropped,
    parse_ok, error}.  ValueErrors become parse_ok=False rows."""
    try:
        xml = zip_read(payload, _DOC_MEMBER).decode("utf-8", "replace")
    except ValueError as exc:
        return {"extracted_text": "", "spans": [], "n_blocks_kept": 0,
                "n_blocks_dropped": 0, "parse_ok": False,
                "error": f"docx: {exc}"}
    paras = parse_docx(xml)
    text, spans, kept, dropped = docx_to_text(paras, joiner)
    return {"extracted_text": text, "spans": spans, "n_blocks_kept": kept,
            "n_blocks_dropped": dropped, "parse_ok": True, "error": ""}


_FOOTNOTE_RE = re.compile(
    r"""<(?:\w+:)?footnote\s((?:[^>"']|"[^"]*"|'[^']*')*?)>""")
_FN_ID_RE = re.compile(r"""(?:^|\s)(?:\w+:)?id\s*=\s*["'](-?\d+)["']""")
_FN_TYPE_RE = re.compile(r"""(?:^|\s)(?:\w+:)?type\s*=\s*["']([^"']*)["']""")
_FOOTNOTES_MEMBER = "word/footnotes.xml"


def parse_footnotes(data: bytes) -> list[dict]:
    """word/footnotes.xml → [{"fn_id": int, "text": str}] in document
    order, one row per footnote PARAGRAPH (footnotes can be
    multi-paragraph).  Separator/continuation pseudo-footnotes
    (``w:type``, ECMA-376 §17.11.10) are skipped — they are rendering
    furniture, not content.  Footnote text is deliberately NOT part of
    the flagship body (``extract_docx``) — the same policy as ODT note
    exclusion — this is the dedicated operator for it.  Raises
    ValueError if the member is absent or malformed (a docx without
    footnotes has no footnotes.xml)."""
    xml = zip_read(data, _FOOTNOTES_MEMBER).decode("utf-8", "replace")
    hay = xml[:_XML_CAP]
    out: list[dict] = []
    # split on footnote opens; each segment's paragraphs carry its id
    opens = list(_FOOTNOTE_RE.finditer(hay))
    for k, m in enumerate(opens):
        attrs = m.group(1)
        tm = _FN_TYPE_RE.search(attrs)
        if tm and tm.group(1) in ("separator", "continuationSeparator"):
            continue
        im = _FN_ID_RE.search(attrs)
        if not im:
            continue
        fn_id = int(im.group(1))
        end = opens[k + 1].start() if k + 1 < len(opens) else len(hay)
        for p in parse_docx(hay[m.end():end]):
            out.append({"fn_id": fn_id, "text": p["text"]})
    return out


# --------------------------------------------------------------------------
# Writer — minimal valid OOXML package (fixtures stay closed)
# --------------------------------------------------------------------------

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
    'package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
).encode()

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.openxml'
    'formats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/></Relationships>'
).encode()


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _para_xml(text: str, style: str = "", split_runs: bool = False) -> str:
    ppr = (f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>') if style else ""
    if not split_runs or len(text) < 8:
        body = f'<w:r><w:t xml:space="preserve">{_esc(text)}</w:t></w:r>'
    else:
        # split mid-word so run concatenation is load-bearing
        cut = len(text) // 2
        body = (f'<w:r><w:t xml:space="preserve">{_esc(text[:cut])}</w:t></w:r>'
                f'<w:r><w:t xml:space="preserve">{_esc(text[cut:])}</w:t></w:r>')
    return f"<w:p>{ppr}{body}</w:p>"


def build_document_xml(paragraphs: list[tuple[str, str]],
                       table_rows: list[list[str]] | None = None,
                       split_runs: bool = False) -> bytes:
    """(text, style) paragraphs + an optional trailing table → the
    document.xml bytes."""
    body = "".join(_para_xml(t, s, split_runs) for t, s in paragraphs)
    if table_rows:
        rows = "".join(
            "<w:tr>" + "".join(
                f"<w:tc>{_para_xml(cell)}</w:tc>" for cell in row)
            + "</w:tr>"
            for row in table_rows)
        body += f"<w:tbl>{rows}</w:tbl>"
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>' + body +
        "</w:body></w:document>"
    ).encode()


def build_zip(members: list[tuple[str, bytes]], *, deflate: bool = True,
              store_first: bool = False) -> bytes:
    """Deterministic ZIP writer (fixed DOS timestamp, no extra fields).
    ``store_first`` forces member 0 STORED regardless of ``deflate`` —
    the ODF/OCF mimetype-first convention (Part 3 §3.3); the longer ODF
    mimetypes DO shrink under deflate, so the size fallback alone is
    not enough for them."""
    out = bytearray()
    central = bytearray()
    for k, (name, payload) in enumerate(members):
        nb = name.encode()
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        if deflate and not (store_first and k == 0):
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            comp = c.compress(payload) + c.flush()
            method = 8
            if len(comp) >= len(payload):
                comp, method = payload, 0
        else:
            comp, method = payload, 0
        off = len(out)
        hdr = struct.pack("<IHHHHHIII", 0x04034B50, 20, 0, method,
                          0, 0x21, crc, len(comp), len(payload))
        out += hdr + struct.pack("<HH", len(nb), 0) + nb + comp
        central += struct.pack("<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0,
                               method, 0, 0x21, crc, len(comp), len(payload),
                               len(nb), 0, 0, 0, 0, 0, off) + nb
    cd_off = len(out)
    out += central
    out += struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, len(members),
                       len(members), len(central), cd_off, 0)
    return bytes(out)


def build_footnotes_xml(footnotes: list[tuple[int, list[str]]]) -> bytes:
    """(id, paragraphs) footnotes → word/footnotes.xml, including the
    separator pseudo-footnotes real writers emit (readers must skip)."""
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<w:footnotes xmlns:w="http://schemas.openxmlformats.org/'
             'wordprocessingml/2006/main">'
             '<w:footnote w:type="separator" w:id="-1"><w:p><w:r>'
             "<w:separator/></w:r></w:p></w:footnote>"
             '<w:footnote w:type="continuationSeparator" w:id="0"><w:p>'
             "<w:r><w:continuationSeparator/></w:r></w:p></w:footnote>"]
    for fn_id, paras in footnotes:
        parts.append(f'<w:footnote w:id="{fn_id}">')
        parts.extend(_para_xml(t) for t in paras)
        parts.append("</w:footnote>")
    parts.append("</w:footnotes>")
    return "".join(parts).encode()


def build_docx(paragraphs: list[tuple[str, str]],
               table_rows: list[list[str]] | None = None,
               *, deflate: bool = True, split_runs: bool = False,
               footnotes: list[tuple[int, list[str]]] | None = None
               ) -> bytes:
    """A minimal valid .docx from (text, style) paragraphs."""
    ct = _CONTENT_TYPES
    members = [("_rels/.rels", _RELS),
               (_DOC_MEMBER,
                build_document_xml(paragraphs, table_rows, split_runs))]
    if footnotes is not None:
        ct = ct.replace(
            b"</Types>",
            b'<Override PartName="/word/footnotes.xml" ContentType='
            b'"application/vnd.openxmlformats-officedocument.'
            b'wordprocessingml.footnotes+xml"/></Types>')
        members.append((_FOOTNOTES_MEMBER,
                        build_footnotes_xml(footnotes)))
    return build_zip([("[Content_Types].xml", ct)] + members,
                     deflate=deflate)
