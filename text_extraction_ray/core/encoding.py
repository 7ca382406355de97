"""Deterministic payload sniffing + charset decoding (SURVEY.md M1/M2).

No chardet in this sandbox — the decision procedure below is fixed and total
(never raises), which is exactly what byte-stable goldens need:

  1. magic: ``%PDF-`` prefix → pdf; empty → empty
  2. BOM (utf-8 / utf-16 le/be) wins
  3. ``<meta charset=...>`` / ``http-equiv`` scan of the first 1024 bytes
     (ASCII-case-insensitive)
  4. strict utf-8 attempt
  5. latin-1 fallback (total function over bytes)
"""

from __future__ import annotations

import codecs
import re

from ..params import PDF_MAGIC

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)|"""
    rb"""content\s*=\s*["'][^"']*charset=([a-zA-Z0-9_\-]+))""",
    re.IGNORECASE | re.DOTALL,
)

_CHARSET_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "ascii": "ascii",
    "us-ascii": "ascii",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "gb2312": "gb2312",
    "gbk": "gbk",
    "big5": "big5",
    "shift_jis": "shift_jis",
    "euc-jp": "euc_jp",
}

_MARKUP_HINT_RE = re.compile(
    rb"<\s*(?:!doctype|html|head|body|div|p\b|a\b|meta|title|h[1-6]|span|table|br)",
    re.IGNORECASE,
)


_FEED_ROOT_RE = re.compile(rb"<\s*(rss|feed)[\s>]", re.IGNORECASE)
# MHTML (M45): an RFC 5322 field line at byte 0 + multipart/related in
# the head.  HTML starts with '<'/whitespace so it can never match the
# first test; a page merely MENTIONING multipart/related never routes.
MIME_FIELD_RE = re.compile(rb"^[!-9;-~]+:")
MIME_HINT_RE = re.compile(rb"multipart/related", re.IGNORECASE)
# flat ODF (M50): the root element declares its own mimetype
_FLAT_ODF_RE = re.compile(
    rb"office:mimetype\s*=\s*[\"']application/vnd\.oasis\.opendocument"
    rb"\.(text|spreadsheet|presentation)[\"']")
_XML_ENCODING_RE = re.compile(
    rb"<\?xml[^>]*encoding\s*=\s*[\"']([A-Za-z0-9._\-]+)[\"']",
    re.IGNORECASE)


def _skip_xml_misc(buf: bytes) -> bytes:
    """Advance past leading XML misc nodes — ``<?...?>`` processing
    instructions (incl. the prolog), ``<!--...-->`` comments and
    ``<!...>`` declarations (DOCTYPE) — plus whitespace, returning the
    suffix that starts at the first actual element (or b'' if the head
    buffer ends inside a misc node).  Used so the feed route keys on the
    ROOT element only, never on feed markup mentioned in body text."""
    i, n = 0, len(buf)
    while True:
        while i < n and buf[i:i + 1] in (b" ", b"\t", b"\r", b"\n"):
            i += 1
        if buf[i:i + 2] == b"<?":
            end = buf.find(b"?>", i + 2)
            if end < 0:
                return b""
            i = end + 2
        elif buf[i:i + 4] == b"<!--":
            end = buf.find(b"-->", i + 4)
            if end < 0:
                return b""
            i = end + 3
        elif buf[i:i + 2] == b"<!":
            end = buf.find(b">", i + 2)
            if end < 0:
                return b""
            i = end + 1
        else:
            return buf[i:]


def sniff_doc_type(payload: bytes) -> str:
    """Classify raw payload bytes: html | pdf | docx | xlsx | pptx |
    odt | ods | odp | rtf | doc | xls | ppt | epub | mhtml | feed |
    text | gzip | zstd | empty | unknown (M1).  ``gzip`` is a TRANSPORT, not a document type: the
    extractor inflates and re-sniffs, so OUT rows never carry it.

    Feeds (RSS/Atom, M28) are recognized conservatively: the payload
    must START with the feed root element (after BOM/whitespace), or —
    when an XML prolog is present — the FIRST actual element after the
    prolog/comments/DOCTYPE must be the feed root.  A page (XHTML or
    otherwise) merely MENTIONING ``<rss`` in early text never routes
    here (ADVICE r4: the old branch searched the whole 2 KiB head)."""
    if not payload:
        return "empty"
    if payload.startswith(PDF_MAGIC):
        return "pdf"
    if payload.startswith(b"\x1f\x8b"):
        # gzip-wrapped payload (M46): .gz assets and mislabeled
        # content-encoding leftovers; the extractor inflates (bounded,
        # prefix-salvaging) and re-sniffs the inner bytes
        return "gzip"
    if payload.startswith(b"\x28\xb5\x2f\xfd"):
        # zstd frame magic (M46): decoded through pyarrow's bundled
        # Zstandard codec when available, else a precise error route
        return "zstd"
    if payload.startswith(b"PK\x03\x04"):
        # ZIP container (M31/M32): member names occur verbatim in the
        # central directory, so the container routes by its main part;
        # any other zip (pptx/jar/plain archive) stays on the error route
        if b"word/document.xml" in payload:
            return "docx"
        if b"xl/workbook.xml" in payload:
            return "xlsx"
        if b"ppt/presentation.xml" in payload:
            return "pptx"
        if b"application/vnd.oasis.opendocument.text" in payload:
            return "odt"
        if b"application/vnd.oasis.opendocument.spreadsheet" in payload:
            return "ods"
        if b"application/vnd.oasis.opendocument.presentation" in payload:
            return "odp"
        if b"application/epub+zip" in payload:
            # OCF package (M44): the mimetype member is stored-first per
            # OCF §3.3, so the string appears verbatim in the bytes
            return "epub"
        return "unknown"
    if payload.startswith(b"{\\rtf"):
        return "rtf"
    if payload.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"):
        # OLE2/CFB container (M36-M39): directory-entry names occur
        # verbatim as UTF-16LE in the directory sectors, so the
        # container routes by its content stream; any other compound
        # file stays on the error route
        if "WordDocument".encode("utf-16-le") in payload:
            return "doc"
        if "Workbook".encode("utf-16-le") in payload:
            return "xls"
        if "PowerPoint Document".encode("utf-16-le") in payload:
            return "ppt"
        return "unknown"
    head = payload[:2048]
    if ((MIME_FIELD_RE.match(head) or head.startswith(b"From "))
            and MIME_HINT_RE.search(head)):
        return "mhtml"
    stripped = head.lstrip(b"\xef\xbb\xbf \t\r\n")
    if stripped[:1] == b"<":
        if _FEED_ROOT_RE.match(stripped):
            return "feed"
        if stripped.startswith(b"<?xml") and \
                _FEED_ROOT_RE.match(_skip_xml_misc(stripped)):
            return "feed"
        # flat ODF (M50): single-file XML whose root is
        # <office:document office:mimetype="..."> — route to the same
        # extractors as the zipped family (they accept flat XML)
        root = (_skip_xml_misc(stripped)
                if stripped.startswith((b"<?", b"<!")) else stripped)
        if root[:17].lower() == b"<office:document ":
            fm = _FLAT_ODF_RE.search(head)
            if fm:
                return {b"text": "odt", b"spreadsheet": "ods",
                        b"presentation": "odp"}[fm.group(1)]
    if _MARKUP_HINT_RE.search(head):
        return "html"
    if looks_like_text(payload):
        return "text"
    return "unknown"


def looks_like_text(payload: bytes) -> bool:
    """Plain-text document sniff (M49): the payload must decode as
    STRICT utf-8 (multi-byte sequences are self-checking — random
    bytes fail with overwhelming probability) or be pure 7-bit ASCII,
    contain no C0 control bytes besides tab/newline/CR/FF, and carry a
    minimum of real content.  Deliberately conservative: crawl garbage
    (random bytes, truncated binaries) must keep routing ``unknown``."""
    if len(payload) < 16:
        return False
    head = payload[:64 << 10]
    try:
        text = head.decode("utf-8", "strict")
    except UnicodeDecodeError:
        return False
    n_ctl = sum(1 for c in text[:4096]
                if ord(c) < 32 and c not in "\t\n\r\x0c")
    return n_ctl == 0


def decode_xml(payload: bytes) -> tuple[str, str]:
    """Decode XML payload bytes → (text, charset_used). Never raises.

    Same BOM handling as ``decode_html`` but the charset declaration is
    the XML prolog's ``encoding=`` attribute instead of a meta tag."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return payload[3:].decode("utf-8", "replace"), "utf-8-bom"
    if payload.startswith(b"\xff\xfe"):
        return payload[2:].decode("utf-16-le", "replace"), "utf-16-le"
    if payload.startswith(b"\xfe\xff"):
        return payload[2:].decode("utf-16-be", "replace"), "utf-16-be"
    m = _XML_ENCODING_RE.search(payload[:256])
    if m:
        raw = m.group(1).decode("ascii", "replace").lower()
        codec = _CHARSET_ALIASES.get(raw)
        if codec is None:
            try:
                info = codecs.lookup(raw)
                if getattr(info, "_is_text_encoding", True):
                    codec = info.name
            except LookupError:
                codec = None
        if codec:
            try:
                return payload.decode(codec, "replace"), codec
            except (LookupError, ValueError, TypeError):  # pragma: no cover
                pass
    try:
        return payload.decode("utf-8", "strict"), "utf-8"
    except UnicodeDecodeError:
        return payload.decode("latin-1"), "latin-1"


def decode_html(payload: bytes) -> tuple[str, str]:
    """Decode HTML payload bytes → (text, charset_used). Never raises (M2)."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return payload[3:].decode("utf-8", "replace"), "utf-8-bom"
    if payload.startswith(b"\xff\xfe"):
        return payload[2:].decode("utf-16-le", "replace"), "utf-16-le"
    if payload.startswith(b"\xfe\xff"):
        return payload[2:].decode("utf-16-be", "replace"), "utf-16-be"
    m = _META_CHARSET_RE.search(payload[:1024])
    if m:
        raw = (m.group(1) or m.group(2)).decode("ascii", "replace").lower()
        codec = _CHARSET_ALIASES.get(raw)
        if codec is None:
            # Charset breadth (VERDICT r1 'Missing' #3): any declared
            # charset the stdlib knows (koi8-r, euc-kr, cp1251,
            # iso-8859-2..16, ...) resolves via codecs.lookup — same total
            # fallback below if the name is unknown or not a text codec
            # (rot13/base64/hex would otherwise slip through lookup).
            try:
                info = codecs.lookup(raw)
                if getattr(info, "_is_text_encoding", True):
                    codec = info.name
            except LookupError:
                codec = None
        if codec:
            try:
                return payload.decode(codec, "replace"), codec
            except (LookupError, ValueError, TypeError):  # pragma: no cover
                pass
    try:
        return payload.decode("utf-8", "strict"), "utf-8"
    except UnicodeDecodeError:
        return payload.decode("latin-1"), "latin-1"
