"""OOXML presentation (.pptx) extraction (SURVEY §2.2 M33, round 4).

The third OOXML container a crawl meets: slide decks.  The ZIP layer
is shared with ``core/docx.py``; slide text lives in DrawingML runs —
``<a:p>`` paragraphs of ``<a:r>`` runs of ``<a:t>`` literals (ECMA-376
Part 1 §21.1.2), which after namespace-prefix stripping is EXACTLY the
local-name grammar ``docx.parse_docx`` already implements (p/r/t/br),
so the paragraph scanner is reused verbatim — one byte-semantics
implementation for both markups, the policy ``core/dom.py`` set.

- ``parse_pptx`` — slide order done properly: ``ppt/presentation.xml``'s
  ``<p:sldId r:id=…/>`` list resolved through
  ``ppt/_rels/presentation.xml.rels`` (r:id → Target); each slide part
  runs the shared paragraph scan.  Shape/table geometry is not text;
  table cells arrive as ordinary paragraphs in document order, same as
  the docx table convention.
- ``extract_pptx`` — flagship-route assembly: non-empty paragraphs in
  slide order under the HTML joiner/span conventions, so
  ``doc_type="pptx"`` rows join the byte-identity contract.
- ``build_pptx`` — deterministic minimal package (content types, root
  rels, presentation, presentation rels, slides) so the synthetic
  corpus stays closed.

Scope: slide bodies only — notes/masters/layouts are separate members
(same honest scoping as docx headers/footers).
"""

from __future__ import annotations

import re

from .docx import build_zip, parse_docx, zip_entries, zip_read
from .xlsx import _ID_RE, _RID_RE, _TARGET_RE, _XML_CAP

_PRESENTATION = "ppt/presentation.xml"
_PRES_RELS = "ppt/_rels/presentation.xml.rels"

_SLDID_RE = re.compile(r"<(?:\w+:)?sldId\s([^>]*)/?>")
_REL_RE = re.compile(r"<(?:\w+:)?Relationship\s([^>]*)/?>")


def is_pptx(payload: bytes) -> bool:
    return (payload.startswith(b"PK\x03\x04")
            and b"ppt/presentation.xml" in payload)


def _slide_parts(data: bytes, entries: dict) -> list[str]:
    """Slide member paths in presentation order."""
    pres = zip_read(data, _PRESENTATION, entries).decode("utf-8", "replace")
    rels = zip_read(data, _PRES_RELS, entries).decode("utf-8", "replace")
    targets: dict[str, str] = {}
    for m in _REL_RE.finditer(rels[:_XML_CAP]):
        attrs = m.group(1)
        rid, tgt = _ID_RE.search(attrs), _TARGET_RE.search(attrs)
        if rid and tgt:
            t = tgt.group(1)
            targets[rid.group(1)] = (t.lstrip("/") if t.startswith("/")
                                     else "ppt/" + t)
    slides: list[str] = []
    for m in _SLDID_RE.finditer(pres[:_XML_CAP]):
        rid = _RID_RE.search(m.group(1))
        if not rid or rid.group(1) not in targets:
            raise ValueError("pptx: slide without resolvable part")
        slides.append(targets[rid.group(1)])
    if not slides:
        raise ValueError("pptx: presentation declares no slides")
    return slides


def parse_pptx(data: bytes) -> list[dict]:
    """bytes → paragraphs across all slides in presentation order.
    Each paragraph: {"slide": int (1-based), "text": str} — the shared
    docx scanner supplies the text/whitespace/entity semantics."""
    entries = zip_entries(data)
    out: list[dict] = []
    for k, part in enumerate(_slide_parts(data, entries), start=1):
        xml = zip_read(data, part, entries).decode("utf-8", "replace")
        for p in parse_docx(xml):
            out.append({"slide": k, "text": p["text"]})
    return out


def extract_pptx(payload: bytes, joiner: str) -> dict:
    """Flagship-route assembly under the HTML joiner/span conventions."""
    try:
        paras = parse_pptx(payload)
    except ValueError as exc:
        return {"extracted_text": "", "spans": [], "n_blocks_kept": 0,
                "n_blocks_dropped": 0, "parse_ok": False,
                "error": f"pptx: {exc}"}
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
# Writer — minimal valid PresentationML package
# --------------------------------------------------------------------------

def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _slide_xml(paragraphs: list[str], split_runs: bool = False) -> bytes:
    paras = []
    for t in paragraphs:
        if not split_runs or len(t) < 8:
            body = f"<a:r><a:t>{_esc(t)}</a:t></a:r>" if t else ""
        else:
            cut = len(t) // 2
            body = (f"<a:r><a:t>{_esc(t[:cut])}</a:t></a:r>"
                    f"<a:r><a:t>{_esc(t[cut:])}</a:t></a:r>")
        paras.append(f"<a:p>{body}</a:p>")
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/'
        '2006/main" xmlns:p="http://schemas.openxmlformats.org/'
        'presentationml/2006/main"><p:cSld><p:spTree><p:sp><p:txBody>'
        + "".join(paras) +
        "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    ).encode()


def build_pptx(slides: list[list[str]], *, deflate: bool = True,
               split_runs: bool = False) -> bytes:
    """slides = [[paragraph, ...], ...] → a minimal valid .pptx."""
    n = len(slides)
    ct = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
          'content-types">'
          '<Default Extension="rels" ContentType="application/vnd.'
          'openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/ppt/presentation.xml" ContentType='
          '"application/vnd.openxmlformats-officedocument.presentationml.'
          'presentation.main+xml"/>']
    for k in range(1, n + 1):
        ct.append(f'<Override PartName="/ppt/slides/slide{k}.xml" '
                  'ContentType="application/vnd.openxmlformats-office'
                  'document.presentationml.slide+xml"/>')
    ct.append("</Types>")

    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/office'
        'Document" Target="ppt/presentation.xml"/></Relationships>')

    pres = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<p:presentation xmlns:p="http://schemas.openxmlformats.org/'
            'presentationml/2006/main" xmlns:r="http://schemas.openxml'
            'formats.org/officeDocument/2006/relationships"><p:sldIdLst>']
    rels = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">']
    for k in range(1, n + 1):
        pres.append(f'<p:sldId id="{255 + k}" r:id="rId{k}"/>')
        rels.append(f'<Relationship Id="rId{k}" Type="http://schemas.'
                    'openxmlformats.org/officeDocument/2006/relationships/'
                    f'slide" Target="slides/slide{k}.xml"/>')
    pres.append("</p:sldIdLst></p:presentation>")
    rels.append("</Relationships>")

    members: list[tuple[str, bytes]] = [
        ("[Content_Types].xml", "".join(ct).encode()),
        ("_rels/.rels", root_rels.encode()),
        (_PRESENTATION, "".join(pres).encode()),
        (_PRES_RELS, "".join(rels).encode()),
    ]
    for k, paras in enumerate(slides, start=1):
        members.append((f"ppt/slides/slide{k}.xml",
                        _slide_xml(paras, split_runs)))
    return build_zip(members, deflate=deflate)
