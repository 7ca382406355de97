"""EPUB (OCF/OPF) e-book extraction — M44 (round 5).

EPUB is the dominant e-book container in web crawls and it is "just"
more of what the engine already holds: an OCF **ZIP** package (the
`core/docx.py` container layer is reused verbatim) whose stored-first
``mimetype`` member says ``application/epub+zip`` (OCF 3.x §3.3, same
stored-first convention as ODF), a ``META-INF/container.xml`` naming the
OPF *package document*, and an OPF whose ``<manifest>`` maps ids to
hrefs and whose ``<spine>`` orders the XHTML content documents.

Reading-order semantics: chapters are read **in spine order** (the
package's declared linear reading order — the EPUB analogue of the
reference's row-major cell ordering), each chapter is decoded with the
flagship charset procedure (``encoding.decode_html``: BOM → meta →
utf-8 → latin-1) and segmented with the **same DOM tokenizer + block
segmenter as the HTML route** (``html_extract.segment_blocks``), so
entity/whitespace byte semantics stay pinned in one module.  Unlike the
crawl-page route, e-book chapters are curated content, not boilerplate
soup — EVERY block with text is kept (the docx/odt assembly convention,
not the jusText classifier), assembled under the shared JOINER/span
contract.

Totality: any container/package malformation returns ``parse_ok=False``
with an ``epub:``-prefixed error; nothing raises past this module
(flagship M11 discipline).

The writer (``build_epub``) emits a minimal valid package —
stored-first mimetype (the 20-byte ASCII string is incompressible, so
the shared deterministic ZIP writer stores it by construction),
container.xml, OPF with manifest+spine, one XHTML file per chapter —
keeping the synthetic corpus closed (no external fixtures).
"""

from __future__ import annotations

import re

from .docx import build_zip, zip_entries, zip_read
from .dom import decode_entities
from .encoding import decode_html
from .html_extract import segment_blocks

EPUB_MIMETYPE = b"application/epub+zip"
_CONTAINER = "META-INF/container.xml"

_ROOTFILE_RE = re.compile(
    r"<\s*rootfile\b[^>]*?full-path\s*=\s*[\"']([^\"']+)[\"']",
    re.IGNORECASE | re.DOTALL)
_ITEM_RE = re.compile(
    r"<\s*(?:[A-Za-z][\w.\-]*:)?item\b([^>]*)>", re.IGNORECASE | re.DOTALL)
_ITEMREF_RE = re.compile(
    r"<\s*(?:[A-Za-z][\w.\-]*:)?itemref\b([^>]*)>",
    re.IGNORECASE | re.DOTALL)
_ATTR_RE = re.compile(
    r"([A-Za-z][\w:.\-]*)\s*=\s*([\"'])(.*?)\2", re.DOTALL)
_XML_CAP = 4 << 20  # bound malformed giant package documents


def is_epub(payload: bytes) -> bool:
    """Cheap container sniff: ZIP magic + the OCF mimetype string, which
    appears verbatim because the mimetype member is stored (OCF §3.3)."""
    return payload.startswith(b"PK\x03\x04") and EPUB_MIMETYPE in payload


def _attrs(raw: str) -> dict[str, str]:
    return {m.group(1).rsplit(":", 1)[-1].lower(): decode_entities(m.group(3))
            for m in _ATTR_RE.finditer(raw)}


def parse_container(xml: str) -> str:
    """container.xml → the first rootfile's full-path (OCF §3.5.1).
    Raises ValueError when no rootfile is declared."""
    m = _ROOTFILE_RE.search(xml[:_XML_CAP])
    if not m:
        raise ValueError("container.xml declares no rootfile")
    return decode_entities(m.group(1))


def parse_opf(xml: str) -> list[str]:
    """OPF package document → spine-ordered content hrefs.

    Manifest ids map to hrefs; spine itemrefs select and order them.
    Unknown idrefs are skipped (a torn manifest should not kill the
    readable chapters), and so are NAVIGATION documents
    (``properties="nav"`` manifest items, EPUB 3 §5.4 — publishers may
    place the TOC in the spine; it is link boilerplate, not content).
    Raises ValueError when the spine is empty."""
    xml = xml[:_XML_CAP]
    hrefs: dict[str, str] = {}
    nav_ids: set[str] = set()
    for m in _ITEM_RE.finditer(xml):
        a = _attrs(m.group(1))
        if "id" in a and "href" in a:
            hrefs[a["id"]] = a["href"]
            if "nav" in a.get("properties", "").split():
                nav_ids.add(a["id"])
    order: list[str] = []
    for m in _ITEMREF_RE.finditer(xml):
        a = _attrs(m.group(1))
        idref = a.get("idref", "")
        if idref in nav_ids:
            continue
        href = hrefs.get(idref)
        if href is not None:
            order.append(href)
    if not order:
        raise ValueError("opf spine is empty")
    return order


def _resolve(base_dir: str, href: str) -> str:
    """Resolve a manifest href relative to the OPF's directory: strip
    fragment/query, normalize ``.``/``..`` segments (ZIP names have no
    leading slash)."""
    href = href.split("#", 1)[0].split("?", 1)[0]
    parts: list[str] = []
    for seg in (base_dir + "/" + href if base_dir else href).split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if parts:
                parts.pop()
        else:
            parts.append(seg)
    return "/".join(parts)


def parse_epub(payload: bytes) -> list[tuple[str, list[str]]]:
    """EPUB bytes → [(chapter_path, [block texts...])] in spine order.

    Each chapter's blocks come from the flagship DOM segmenter; every
    non-empty block is kept.  Raises ValueError on container/package
    malformation (missing members, bad zip, empty spine)."""
    entries = zip_entries(payload)
    container = zip_read(payload, _CONTAINER, entries)
    opf_path = parse_container(container.decode("utf-8", "replace"))
    if opf_path not in entries:
        raise ValueError(f"missing opf {opf_path!r}")
    opf = zip_read(payload, opf_path, entries).decode("utf-8", "replace")
    base_dir = opf_path.rsplit("/", 1)[0] if "/" in opf_path else ""
    chapters: list[tuple[str, list[str]]] = []
    for href in parse_opf(opf):
        path = _resolve(base_dir, href)
        if path not in entries:
            raise ValueError(f"missing spine member {path!r}")
        text, _ = decode_html(zip_read(payload, path, entries))
        blocks = [b.text for b in segment_blocks(text) if b.text]
        chapters.append((path, blocks))
    return chapters


def extract_epub(payload: bytes, joiner: str) -> dict:
    """bytes → the flagship extraction contract fields (M44)."""
    try:
        chapters = parse_epub(payload)
    except ValueError as exc:
        return {"extracted_text": "", "spans": [], "n_blocks_kept": 0,
                "n_blocks_dropped": 0, "parse_ok": False,
                "error": f"epub: {exc}"}
    pieces = [t for _, blocks in chapters for t in blocks]
    spans: list[tuple[int, int]] = []
    pos = 0
    for k, p in enumerate(pieces):
        if k:
            pos += len(joiner)
        spans.append((pos, pos + len(p)))
        pos += len(p)
    return {"extracted_text": joiner.join(pieces), "spans": spans,
            "n_blocks_kept": len(pieces), "n_blocks_dropped": 0,
            "parse_ok": True, "error": ""}


# --------------------------------------------------------------------------
# Writer — minimal valid OCF/OPF package (fixtures stay closed)
# --------------------------------------------------------------------------

_CONTAINER_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:'
    'xmlns:container"><rootfiles><rootfile full-path="{opf}" '
    'media-type="application/oebps-package+xml"/></rootfiles></container>')


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def build_chapter_xhtml(title: str, paragraphs: list[str]) -> bytes:
    body = "".join(f"<p>{_esc(p)}</p>" for p in paragraphs)
    return ('<?xml version="1.0" encoding="utf-8"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
            f"<title>{_esc(title)}</title></head>"
            f"<body><h1>{_esc(title)}</h1>{body}</body></html>"
            ).encode("utf-8")


def build_opf(chapter_names: list[str]) -> bytes:
    items = "".join(
        f'<item id="c{k}" href="{name}" '
        'media-type="application/xhtml+xml"/>'
        for k, name in enumerate(chapter_names))
    refs = "".join(f'<itemref idref="c{k}"/>'
                   for k in range(len(chapter_names)))
    return ('<?xml version="1.0" encoding="utf-8"?>'
            '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
            'unique-identifier="uid"><metadata>'
            '<dc:identifier xmlns:dc="http://purl.org/dc/elements/1.1/" '
            'id="uid">urn:uuid:0</dc:identifier></metadata>'
            f"<manifest>{items}</manifest><spine>{refs}</spine></package>"
            ).encode("utf-8")


def build_epub(chapters: list[tuple[str, list[str]]], *,
               deflate: bool = True, oebps_dir: str = "OEBPS") -> bytes:
    """[(title, [paragraph...])...] → EPUB bytes.

    mimetype is the FIRST member and ends up stored (OCF §3.3): the
    shared ZIP writer falls back to stored whenever deflate does not
    shrink the payload, which is always true for the 20-byte ASCII
    mimetype string."""
    names = [f"ch{k:03d}.xhtml" for k in range(len(chapters))]
    opf_path = f"{oebps_dir}/content.opf"
    members: list[tuple[str, bytes]] = [
        ("mimetype", EPUB_MIMETYPE),
        (_CONTAINER, _CONTAINER_XML.format(opf=opf_path).encode("utf-8")),
        (opf_path, build_opf(names)),
    ]
    members += [(f"{oebps_dir}/{name}", build_chapter_xhtml(title, paras))
                for name, (title, paras) in zip(names, chapters)]
    return build_zip(members, deflate=deflate)
