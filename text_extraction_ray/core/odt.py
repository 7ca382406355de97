"""OpenDocument text (.odt) extraction (SURVEY §2.2 M34, round 4).

The fourth office container on the web (LibreOffice/OpenOffice —
government portals and public institutions publish in it): a ZIP
archive (layer shared with ``core/docx.py``) whose ``content.xml``
carries text in ODF markup (OASIS ODF 1.2 Part 1 §5):

- ``parse_odt`` — one bounded tag scan: ``<text:p>`` and ``<text:h>``
  paragraphs (headings carry ``text:outline-level``), character data
  captured DIRECTLY inside paragraph scope (ODF interleaves text with
  inline elements rather than wrapping every run), ``<text:span>``
  nesting transparent, ``<text:tab/>`` / ``<text:line-break/>`` fold
  to a space, ``<text:s text:c="n"/>`` expands to n spaces BEFORE
  whitespace collapse (so it separates words but never fabricates
  padding), table cells are paragraphs in row-major document order,
  ``<text:note>`` bodies (footnotes) and ``<office:annotation>``
  (comments) are excluded by construction — their content is not body
  text.  Entity decode and whitespace collapse delegate to
  ``core/dom.py`` (one byte-semantics module for every markup).
- ``extract_odt`` — assembles non-empty paragraphs under the HTML
  joiner/span conventions so ``doc_type="odt"`` rows join the
  byte-identity contract.
- ``build_odt`` — deterministic writer (mimetype member FIRST and
  STORED per ODF 1.2 Part 3 §3.3, manifest, minimal content.xml) so
  the synthetic corpus stays closed.

Scope: ``content.xml`` body only — ``styles.xml`` page headers/footers
are display furniture a text pipeline excludes deliberately.
"""

from __future__ import annotations

import re

from .dom import collapse_ws, decode_entities
from .docx import _TAG_RE, _local, build_zip, zip_entries, zip_read

_CONTENT = "content.xml"
_MIMETYPE = b"application/vnd.oasis.opendocument.text"
_XML_CAP = 8 << 20

_C_ATTR_RE = re.compile(r"""(?:^|\s)(?:\w+:)?c\s*=\s*["'](\d+)["']""")
_OUTLINE_RE = re.compile(
    r"""(?:^|\s)(?:\w+:)?outline-level\s*=\s*["'](\d+)["']""")

# elements whose text content is NOT body text (skipped subtree-style
# via a depth counter)
_EXCLUDE = frozenset(["note", "annotation", "tracked-changes"])


def is_odt(payload: bytes) -> bool:
    """Cheap container sniff: the ODF text mimetype appears verbatim
    (stored, uncompressed, first member per ODF Part 3 §3.3)."""
    return payload.startswith(b"PK\x03\x04") and _MIMETYPE in payload


def parse_odt(doc: str) -> list[dict]:
    """content.xml text → paragraphs in document order.  Each:
    ``{"text": str (ws-collapsed), "heading": int (0 = body)}``."""
    hay = doc[:_XML_CAP]
    paras: list[dict] = []
    buf: list[str] = []
    heading = 0
    in_p = False
    exclude_depth = 0
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
        if name in _EXCLUDE:
            if selfclose:
                pass
            elif closing:
                exclude_depth = max(0, exclude_depth - 1)
            else:
                exclude_depth += 1
        elif exclude_depth:
            # inside a note/annotation subtree: its paragraphs, tabs and
            # spaces must neither emit text nor disturb the enclosing
            # paragraph's state
            pass
        elif name in ("p", "h"):
            if closing or selfclose:
                if in_p or selfclose:
                    text = collapse_ws(decode_entities("".join(buf))).strip()
                    paras.append({"text": text, "heading": heading})
                in_p, buf, heading = False, [], 0
            else:
                in_p, buf = True, []
                heading = 0
                if name == "h":
                    om = _OUTLINE_RE.search(attrs)
                    heading = int(om.group(1)) if om else 1
        elif name in ("tab", "line-break") and in_p:
            buf.append(" ")
        elif name == "s" and in_p and not closing:
            cm = _C_ATTR_RE.search(attrs)
            buf.append(" " * (int(cm.group(1)) if cm else 1))
        # <text:span> open/close: transparent — character data keeps
        # accumulating into the paragraph buffer
        i = m.end()
    return paras


def extract_odt(payload: bytes, joiner: str) -> dict:
    """bytes → the flagship extraction contract fields.  Accepts both
    the zipped package and FLAT ODF (M50: a single ``<office:document``
    XML file — the paragraph grammar is identical)."""
    if payload.lstrip(b"\xef\xbb\xbf \t\r\n")[:1] == b"<":
        from .encoding import decode_xml

        xml, _ = decode_xml(payload)
    else:
        try:
            entries = zip_entries(payload)
            xml = zip_read(payload, _CONTENT, entries).decode(
                "utf-8", "replace")
        except ValueError as exc:
            return {"extracted_text": "", "spans": [],
                    "n_blocks_kept": 0, "n_blocks_dropped": 0,
                    "parse_ok": False, "error": f"odt: {exc}"}
    paras = parse_odt(xml)
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
# Writer — minimal valid ODF text package
# --------------------------------------------------------------------------

_MANIFEST = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:'
    'xmlns:manifest:1.0" manifest:version="1.2">'
    '<manifest:file-entry manifest:full-path="/" manifest:media-type='
    '"application/vnd.oasis.opendocument.text"/>'
    '<manifest:file-entry manifest:full-path="content.xml" '
    'manifest:media-type="text/xml"/></manifest:manifest>'
).encode()


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def build_content_xml(paragraphs: list[tuple[str, int]],
                      use_spans: bool = False) -> bytes:
    """(text, outline_level) paragraphs → content.xml bytes; level 0 =
    body <text:p>, >0 = <text:h>.  ``use_spans`` wraps the second half
    of each text in a transparent <text:span>."""
    body = []
    for t, lvl in paragraphs:
        if use_spans and len(t) >= 8:
            cut = len(t) // 2
            inner = (f"{_esc(t[:cut])}<text:span text:style-name=\"T1\">"
                     f"{_esc(t[cut:])}</text:span>")
        else:
            inner = _esc(t)
        if lvl > 0:
            body.append(f'<text:h text:outline-level="{lvl}">{inner}'
                        "</text:h>")
        else:
            body.append(f"<text:p>{inner}</text:p>")
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content xmlns:office="urn:oasis:names:tc:'
        'opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc:'
        'opendocument:xmlns:text:1.0" office:version="1.2"><office:body>'
        "<office:text>" + "".join(body) +
        "</office:text></office:body></office:document-content>"
    ).encode()


def build_odt(paragraphs: list[tuple[str, int]], *, deflate: bool = True,
              use_spans: bool = False) -> bytes:
    """A minimal valid .odt; mimetype member first and stored."""
    members = [("mimetype", _MIMETYPE),
               ("META-INF/manifest.xml", _MANIFEST),
               (_CONTENT, build_content_xml(paragraphs, use_spans))]
    if not deflate:
        return build_zip(members, deflate=False)
    # mimetype must be STORED even in a deflate package: write it alone
    # first, then splice — build_zip stores members that don't shrink,
    # and the short mimetype never shrinks under deflate, so a single
    # call suffices (zlib overhead exceeds savings on 39 bytes)
    return build_zip(members, deflate=True)
