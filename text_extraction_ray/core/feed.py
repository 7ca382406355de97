"""RSS 2.0 / Atom feed extraction (SURVEY §2.2 M28, round 4).

Feeds are a standing fraction of any web crawl (every blog/news site
serves one), and their payload — item titles + summaries — is exactly
the main content a text pipeline wants, with zero boilerplate.  This
module parses both families with one bounded scanner and assembles the
item text through the SAME joiner/span conventions as the HTML path, so
``extract_document`` can route ``doc_type="feed"`` rows into the
byte-identity contract unchanged.

Stdlib-only, total on any text: a small tag scanner (the DOM module's
grammar, plus XML CDATA sections) with a capture-field state machine —
no recursion, no namespace resolution (tag local names compared after
stripping any prefix, the crawl-practical reading of RSS's wild
namespace usage).  Entity decoding and whitespace collapsing delegate
to ``core.dom`` so byte semantics stay one-module-pinned.
"""

from __future__ import annotations

import re

from .dom import collapse_ws, decode_entities
from .html_meta import _attrs

_TAG_RE = re.compile(
    r"<(/?)([A-Za-z][\w:.\-]*)"
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)"
    r"(/?)>",
    re.DOTALL,
)
_CDATA_OPEN = "<![CDATA["
_FEED_CAP = 1 << 20          # bound malformed giant payloads

# field tags captured inside an item/entry (and title at feed level);
# RSS and Atom names folded into one map → output key
_ITEM_FIELDS = {
    "title": "title",
    "link": "link",
    "pubdate": "date", "updated": "date", "published": "date",
    "description": "summary", "summary": "summary",
}
_ITEM_TAGS = frozenset({"item", "entry"})


def _local(name: str) -> str:
    """Tag name sans namespace prefix, lowercased."""
    return name.rsplit(":", 1)[-1].lower()


def _clean(text: str) -> str:
    return collapse_ws(decode_entities(text)).strip()


def parse_feed(doc: str) -> dict:
    """Parse an RSS 2.0 or Atom feed → a normalized dict.

    Returns ``{"kind": "rss"|"atom"|None, "feed_title": str|None,
    "items": [{"title", "link", "date", "summary"}, ...]}`` — every
    item key present, ``None`` when absent.  First occurrence wins per
    field per item (feed convention).  Unrecognized/malformed markup is
    skipped; the function never raises.
    """
    hay = doc[:_FEED_CAP]
    kind: str | None = None
    feed_title: str | None = None
    items: list[dict] = []
    cur: dict | None = None
    capture: str | None = None        # output key being captured
    capture_tag: str | None = None    # local tag that opened the capture
    buf: list[str] = []
    item_depth = 0
    i, n = 0, len(hay)
    while i < n:
        lt = hay.find("<", i)
        if lt < 0:
            if capture:
                buf.append(hay[i:])
            break
        if capture and lt > i:
            buf.append(hay[i:lt])
        if hay.startswith(_CDATA_OPEN, lt):
            end = hay.find("]]>", lt + len(_CDATA_OPEN))
            seg = hay[lt + len(_CDATA_OPEN):(end if end >= 0 else n)]
            if capture:
                # CDATA content is literal: entities stay undecoded, so
                # escape the ampersands before the shared _clean pass
                buf.append(seg.replace("&", "&amp;"))
            i = n if end < 0 else end + 3
            continue
        if hay.startswith("<!--", lt):
            end = hay.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if hay.startswith("<?", lt) or hay.startswith("<!", lt):
            end = hay.find(">", lt)
            i = n if end < 0 else end + 1
            continue
        m = _TAG_RE.match(hay, lt)
        if m is None:
            if capture:
                buf.append("<")
            i = lt + 1
            continue
        closing, name, raw, selfclose = m.groups()
        local = _local(name)
        i = m.end()
        if not closing:
            if kind is None and local in ("rss", "feed"):
                kind = "rss" if local == "rss" else "atom"
                continue
            if local in _ITEM_TAGS and not selfclose:
                item_depth += 1
                if item_depth == 1:
                    cur = dict.fromkeys(("title", "link", "date",
                                         "summary"))
                    items.append(cur)
                capture = capture_tag = None
                buf = []
                continue
            field = _ITEM_FIELDS.get(local)
            if field is None or capture is not None:
                continue
            if local == "link" and (selfclose or "href" in raw.lower()):
                # Atom form: <link rel="alternate" href="..."/>
                a = _attrs(raw)
                href = a.get("href")
                rel = a.get("rel", "alternate").lower()
                if href and rel in ("alternate", "") and item_depth == 1 \
                        and cur is not None and cur["link"] is None:
                    cur["link"] = href.strip()
                continue
            if selfclose:
                continue
            if item_depth == 1 or (item_depth == 0 and field == "title"):
                capture, capture_tag = field, local
                buf = []
        else:
            if local in _ITEM_TAGS and item_depth:
                item_depth -= 1
                capture = capture_tag = None
                continue
            if capture is not None and local == capture_tag:
                val = _clean("".join(buf))
                if item_depth == 1 and cur is not None:
                    if val and cur[capture] is None:
                        cur[capture] = val
                elif capture == "title" and feed_title is None and val:
                    feed_title = val
                capture = capture_tag = None
                buf = []
    return {"kind": kind, "feed_title": feed_title, "items": items}


def feed_to_text(parsed: dict, joiner: str
                 ) -> tuple[str, list[tuple[int, int]], int]:
    """Assemble a parsed feed into (text, spans, n_blocks) under the
    SAME conventions as ``html_extract.assemble``: one block per
    non-empty feed title / item title / item summary, in document
    order, joined by ``joiner`` with a (start, end) span each."""
    pieces: list[str] = []
    if parsed["feed_title"]:
        pieces.append(parsed["feed_title"])
    for it in parsed["items"]:
        if it["title"]:
            pieces.append(it["title"])
        if it["summary"]:
            pieces.append(it["summary"])
    spans: list[tuple[int, int]] = []
    pos = 0
    for k, p in enumerate(pieces):
        if k:
            pos += len(joiner)
        spans.append((pos, pos + len(p)))
        pos += len(p)
    return joiner.join(pieces), spans, len(pieces)
