"""Batched DOM tokenizer + HTML entity decoder (SURVEY.md SS2.2 M3/M5).

Hand-written, stdlib-only (no lxml/bs4 in this sandbox — SURVEY SS0.3), and
deliberately free of any library whose version could shift output bytes.
The token stream is consumed by ``html_extract.segment_blocks`` inside the
same ``map_batches`` call; it is never materialized across Ray stages.

Tokens are tuples:
    ("start", name, self_closing: bool)
    ("end", name)
    ("text", decoded_str)

Semantics are normative for this engine (oracle and pipeline share this
module, so byte-identity per url holds by construction — SURVEY SS0.2).
"""

from __future__ import annotations

import re
from html.entities import html5 as _HTML5_ENTITIES

# Raw-text elements: their content is scanned for the literal close tag and
# never tokenized as markup.
RAWTEXT_TAGS = frozenset({"script", "style", "textarea", "title", "xmp"})

_TAG_RE = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9:_\-]*)"          # tag name
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)"     # attrs (quoted '>' safe)
    r"(/?)>",
    re.DOTALL,
)
_END_TAG_RE = re.compile(r"</([a-zA-Z][a-zA-Z0-9:_\-]*)\s*>")
_ENTITY_RE = re.compile(r"&(#[xX]?[0-9a-fA-F]+;?|[a-zA-Z][a-zA-Z0-9]*;?)")
_WS_RE = re.compile(r"[ \t\n\r\f\x0b]+")


def _entity_repl(m: re.Match) -> str:
    body = m.group(1)
    if body.startswith("#"):
        num = body[1:].rstrip(";")
        try:
            code = int(num[1:], 16) if num[:1] in ("x", "X") else int(num)
        except ValueError:
            return m.group(0)
        if 0 < code <= 0x10FFFF and not (0xD800 <= code <= 0xDFFF):
            return chr(code)
        return "�"
    # named: html5 table carries both "amp;" and legacy "amp" keys
    if body in _HTML5_ENTITIES:
        return _HTML5_ENTITIES[body]
    return m.group(0)


def decode_entities(text: str) -> str:
    """Decode numeric + named character references; unknown ones pass through."""
    if "&" not in text:
        return text
    return _ENTITY_RE.sub(_entity_repl, text)


def collapse_ws(text: str) -> str:
    """Collapse runs of ASCII whitespace to a single space (SURVEY M6).

    NFC normalization is explicitly NOT applied: byte-identity must not
    depend on the unicodedata version (SURVEY SS2.2 M6 invariant).
    The fast path (all checks are C-level scans) skips the regex when it
    would be the identity — most web text segments.
    """
    if ("\n" not in text and "  " not in text and "\t" not in text
            and "\r" not in text and "\f" not in text and "\x0b" not in text):
        return text
    return _WS_RE.sub(" ", text)


def _attr_has_href(attrs: str) -> bool:
    low = attrs.lower()
    i = low.find("href")
    if i < 0:
        return False
    # require it to be an attribute name boundary: preceded by ws or start
    return i == 0 or low[i - 1] in " \t\n\r\f\"'"


_RAWTEXT_CLOSE_RE: dict[str, re.Pattern] = {
    name: re.compile("</" + name, re.IGNORECASE) for name in RAWTEXT_TAGS
}


def tokenize(doc: str):
    """Single-pass tokenizer over decoded HTML text.

    Malformed input never raises: a stray ``<`` that does not open a valid
    construct is emitted as literal text; unterminated constructs consume to
    EOF.  Yields the token tuples documented in the module docstring, plus
    ("start", name, self_closing, has_href) for start tags.
    """
    n = len(doc)
    i = 0
    while i < n:
        lt = doc.find("<", i)
        if lt < 0:
            yield ("text", doc[i:])
            break
        if lt > i:
            yield ("text", doc[i:lt])
        if lt + 1 >= n:
            yield ("text", "<")
            break
        c = doc[lt + 1]
        if c == "!":
            if doc.startswith("<!--", lt):
                end = doc.find("-->", lt + 4)
                i = n if end < 0 else end + 3
                continue
            if doc.startswith("<![CDATA[", lt):
                end = doc.find("]]>", lt + 9)
                yield ("text", doc[lt + 9 : (end if end >= 0 else n)])
                i = n if end < 0 else end + 3
                continue
            end = doc.find(">", lt)  # doctype / declaration
            i = n if end < 0 else end + 1
            continue
        if c == "?":
            end = doc.find(">", lt)  # processing instruction
            i = n if end < 0 else end + 1
            continue
        if c == "/":
            m = _END_TAG_RE.match(doc, lt)
            if m:
                yield ("end", m.group(1).lower())
                i = m.end()
            else:
                end = doc.find(">", lt)  # e.g. "</ weird>" — drop it
                i = n if end < 0 else end + 1
            continue
        if c.isalpha():
            m = _TAG_RE.match(doc, lt)
            if m:
                name = m.group(1).lower()
                self_closing = m.group(3) == "/"
                has_href = name == "a" and _attr_has_href(m.group(2))
                yield ("start", name, self_closing, has_href)
                i = m.end()
                if name in RAWTEXT_TAGS and not self_closing:
                    cm = _RAWTEXT_CLOSE_RE[name].search(doc, i)
                    if cm is None:
                        break  # unterminated raw text swallows the rest
                    gt = doc.find(">", cm.start())
                    yield ("end", name)
                    i = n if gt < 0 else gt + 1
                continue
            # malformed start tag: consume to next '>' or treat '<' literally
            end = doc.find(">", lt)
            if end < 0:
                yield ("text", doc[lt:])
                break
            i = end + 1
            continue
        # '<' followed by junk → literal text
        yield ("text", "<")
        i = lt + 1
