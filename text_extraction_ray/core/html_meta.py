"""HTML ``<head>`` metadata extraction (SURVEY §2.2 M27, round 4).

A crawl pipeline keys on a handful of head fields besides the body text:
the ``<title>`` (training-data titles, snippet ranking), ``<meta
name=description>`` and the OpenGraph twins (``og:title`` /
``og:description``), the ``<link rel=canonical>`` target (canonical-URL
dedup — the cheapest dedup signal in a crawl, applied before any content
hashing), and the ``<html lang>`` attribute (a declared-language prior
for the n-gram lang-ID vote).  CCNet/C4-lineage pipelines all consume
some subset of these.

Hand-written and stdlib-only like the DOM module it leans on: entity
decoding and whitespace collapsing are delegated to ``core.dom`` so the
byte semantics of every extracted string stay pinned to one module pair
(same rationale as SURVEY §2.3's oracle≡pipeline invariant).

Scale notes: the scan is bounded to ``_HEAD_CAP`` bytes and stops at the
first ``</head>`` / ``<body`` boundary, so a malformed giant page costs
O(cap) — never O(page).  The parser is total: any bytes in, a dict of
``str | None`` out, no exceptions.
"""

from __future__ import annotations

import re

from .dom import collapse_ws, decode_entities

# Parse at most this many decoded characters: real heads are < 8 KiB; the
# cap only bites on malformed pages that never close <head>.
_HEAD_CAP = 65536

_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:_\-]*)"
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)"
    r"/?>",
    re.DOTALL,
)
_ATTR_RE = re.compile(
    r"([a-zA-Z][a-zA-Z0-9:_\-]*)\s*"
    r"(?:=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>\"']+)))?",
)
_TITLE_CLOSE_RE = re.compile(r"</title\s*>", re.IGNORECASE)
_CHARSET_IN_CONTENT_RE = re.compile(r"charset\s*=\s*([A-Za-z0-9_\-]+)")

_FIELDS = ("title", "description", "og_title", "og_description",
           "canonical", "lang", "charset")


def _attrs(raw: str) -> dict[str, str]:
    """Attribute string → {lowercased name: decoded value}.

    First occurrence of a name wins (HTML5 duplicate-attribute rule);
    valueless attributes map to ""; quoting style is irrelevant.
    """
    out: dict[str, str] = {}
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        if name in out:
            continue
        val = m.group(3)
        if val is None:
            val = m.group(4)
        if val is None:
            val = m.group(5)
        out[name] = decode_entities(val) if val else ""
    return out


def _clean(text: str) -> str:
    return collapse_ws(decode_entities(text)).strip()


_JSONLD_OPEN_RE = re.compile(
    r"<script[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>",
    re.IGNORECASE)
_SCRIPT_CLOSE_RE = re.compile(r"</script\s*>", re.IGNORECASE)
_JSONLD_CAP = 262144       # scan bound for malformed giant pages
_JSONLD_MAX_BLOCKS = 8     # real pages carry 1-3; bound adversarial ones


def extract_jsonld(doc: str) -> list[dict]:
    """schema.org JSON-LD blocks (M29): every
    ``<script type="application/ld+json">`` payload that parses as JSON,
    flattened to a list of objects (top-level lists and ``@graph``
    wrappers unwrapped one level).  Script content is rawtext — no
    entity decoding (HTML5 §13.2.5.1).  Malformed JSON blocks are
    skipped; never raises."""
    import json

    out: list[dict] = []
    hay = doc[:_JSONLD_CAP]
    pos = 0
    while len(out) < _JSONLD_MAX_BLOCKS:
        m = _JSONLD_OPEN_RE.search(hay, pos)
        if m is None:
            break
        cm = _SCRIPT_CLOSE_RE.search(hay, m.end())
        body = hay[m.end():cm.start() if cm else len(hay)]
        pos = cm.end() if cm else len(hay)
        try:
            data = json.loads(body)
        except ValueError:
            continue
        nodes = data if isinstance(data, list) else [data]
        for node in nodes:
            if isinstance(node, dict):
                graph = node.get("@graph")
                if isinstance(graph, list):
                    out.extend(g for g in graph if isinstance(g, dict))
                else:
                    out.append(node)
    return out[:_JSONLD_MAX_BLOCKS]


def extract_head_meta(doc: str) -> dict[str, str | None]:
    """Scan the document head for metadata fields.

    Returns ``{title, description, og_title, og_description, canonical,
    lang, charset}`` — each the first occurrence seen (crawl convention:
    browsers honour the first ``<title>``/``<meta>``), or ``None``.
    The scan ends at ``</head>`` or ``<body`` (whichever comes first),
    tolerating pages that omit both, and never raises.
    """
    out: dict[str, str | None] = dict.fromkeys(_FIELDS)
    hay = doc[:_HEAD_CAP]
    i = 0
    n = len(hay)
    while i < n:
        lt = hay.find("<", i)
        if lt < 0:
            break
        m = _TAG_RE.match(hay, lt)
        if m is None:
            i = lt + 1
            continue
        closing, name, raw = m.group(1), m.group(2).lower(), m.group(3)
        i = m.end()
        if closing:
            if name == "head":
                break
            continue
        if name == "body":
            break
        if name == "html":
            a = _attrs(raw)
            if out["lang"] is None and a.get("lang"):
                out["lang"] = a["lang"].strip().lower()
        elif name == "title":
            # rawtext element: consume to the literal close tag
            cm = _TITLE_CLOSE_RE.search(hay, i)
            end = cm.start() if cm else n
            if out["title"] is None:
                out["title"] = _clean(hay[i:end])
            i = cm.end() if cm else n
        elif name == "meta":
            a = _attrs(raw)
            mname = a.get("name", "").lower()
            prop = a.get("property", "").lower()
            content = a.get("content")
            if mname == "description" and content is not None \
                    and out["description"] is None:
                out["description"] = collapse_ws(content).strip()
            elif prop == "og:title" and content is not None \
                    and out["og_title"] is None:
                out["og_title"] = collapse_ws(content).strip()
            elif prop == "og:description" and content is not None \
                    and out["og_description"] is None:
                out["og_description"] = collapse_ws(content).strip()
            if out["charset"] is None:
                if a.get("charset"):
                    out["charset"] = a["charset"].strip().lower()
                elif a.get("http-equiv", "").lower() == "content-type" \
                        and content:
                    cm2 = _CHARSET_IN_CONTENT_RE.search(content)
                    if cm2:
                        out["charset"] = cm2.group(1).lower()
        elif name == "link":
            a = _attrs(raw)
            rels = a.get("rel", "").lower().split()
            if "canonical" in rels and a.get("href") \
                    and out["canonical"] is None:
                out["canonical"] = a["href"].strip()
    return out
