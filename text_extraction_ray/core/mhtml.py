"""MHTML (MIME multipart web archive) extraction — M45 (round 5).

MHTML (RFC 2557) is the "save as web archive" format browsers emit and
crawls regularly carry: an RFC 2045 MIME envelope whose top headers
declare ``Content-Type: multipart/related`` with a boundary, followed
by one part per resource.  The root part is the saved HTML page; the
rest are images/css the text pipeline ignores.

From-scratch discipline (no ``email`` package): a bounded header
parser (continuation folding per RFC 5322 §2.2.3), boundary splitting,
and the two content-transfer-encodings real archives use —
quoted-printable (soft line breaks + ``=HH``, invalid escapes kept
literal per the robustness note in RFC 2045 §6.7) and base64 (stdlib
``binascii`` decode, whitespace tolerated).  7bit/8bit/binary pass
through.

Root-part selection follows RFC 2387: the ``start=`` parameter's
Content-ID wins; otherwise the first ``text/html`` part.  The chosen
part's declared ``charset=`` takes precedence (it is authoritative for
the *stored* bytes), falling back to the flagship sniffing procedure
(``encoding.decode_html``).  The decoded page then runs the REAL
flagship HTML route — DOM tokenizer → jusText classifier → assembly —
because an archived page is a crawl page: its nav/boilerplate must be
stripped exactly like the live-HTML route.

Totality: malformation → ``parse_ok=False`` with an ``mhtml:``-prefixed
error; nothing raises past this module (M11).
"""

from __future__ import annotations

import binascii
import codecs
import re

from .encoding import _CHARSET_ALIASES, decode_html
from .html_extract import extract_html

_HEAD_CAP = 64 << 10        # top-header scan bound
_PART_CAP = 64 << 20        # decoded-part bound (zip-bomb discipline)

def looks_like_mhtml(payload: bytes) -> bool:
    """Conservative sniff: the payload must START with a header line
    (or the mbox ``From `` postmark browsers emit) AND declare
    ``multipart/related`` in the first 2 KiB.  A crawl HTML page starts
    with ``<``/whitespace, so it can never match the first test; a page
    merely *mentioning* multipart/related never routes here.  The
    regexes live in ``encoding`` (the sniffing module) so
    ``sniff_doc_type`` and this helper share one definition."""
    from .encoding import MIME_FIELD_RE, MIME_HINT_RE
    head = payload[:2048]
    if not (MIME_FIELD_RE.match(head) or head.startswith(b"From ")):
        return False
    return MIME_HINT_RE.search(head) is not None


def parse_headers(block: bytes) -> list[tuple[str, str]]:
    """Header block (up to the blank line) → ordered (name, value)
    pairs, continuation lines folded with one space.  Tolerates bare-LF
    line endings.  Names are lowercased; values keep their case."""
    headers: list[tuple[str, str]] = []
    for raw in block[:_HEAD_CAP].replace(b"\r\n", b"\n").split(b"\n"):
        if not raw:
            break
        if raw[:1] in (b" ", b"\t") and headers:
            name, val = headers[-1]
            headers[-1] = (name, val + " " + raw.strip().decode(
                "latin-1"))
            continue
        if b":" not in raw:
            continue  # mbox postmark / torn line — skip, keep scanning
        name, _, val = raw.partition(b":")
        headers.append((name.strip().decode("latin-1").lower(),
                        val.strip().decode("latin-1")))
    return headers


def header_value(headers: list[tuple[str, str]], name: str) -> str:
    for k, v in headers:
        if k == name:
            return v
    return ""


_PARAM_RE = re.compile(
    r"""([A-Za-z][\w\-]*)\s*=\s*(?:"([^"]*)"|([^;\s]+))""")


def content_type_params(value: str) -> tuple[str, dict[str, str]]:
    """``text/html; charset="utf-8"`` → ("text/html", {"charset": ...}).
    The media type is lowercased; parameter names too."""
    media, _, rest = value.partition(";")
    params = {m.group(1).lower(): (m.group(2) if m.group(2) is not None
                                   else m.group(3))
              for m in _PARAM_RE.finditer(rest)}
    return media.strip().lower(), params


def decode_qp(data: bytes) -> bytes:
    """Quoted-printable decode (RFC 2045 §6.7): ``=HH`` byte escapes,
    ``=\\r\\n``/``=\\n`` soft line breaks; malformed escapes kept
    literal (the spec's robustness recommendation)."""
    out = bytearray()
    i, n = 0, len(data)
    hexdigits = b"0123456789ABCDEFabcdef"
    while i < n:
        c = data[i]
        if c != 0x3D:                   # '='
            out.append(c)
            i += 1
            continue
        if data[i + 1:i + 3] == b"\r\n":
            i += 3
        elif data[i + 1:i + 2] == b"\n":
            i += 2
        elif (len(data) >= i + 3 and data[i + 1] in hexdigits
              and data[i + 2] in hexdigits):
            out.append(int(data[i + 1:i + 3], 16))
            i += 3
        else:                           # malformed escape → literal '='
            out.append(c)
            i += 1
    return bytes(out)


def decode_cte(body: bytes, cte: str) -> bytes:
    """Apply a Content-Transfer-Encoding.  Unknown encodings pass
    through raw (the WARC content-coding convention: keep the bytes,
    let the sniffer/error routing decide)."""
    enc = cte.strip().lower()
    if enc == "quoted-printable":
        return decode_qp(body)[:_PART_CAP]
    if enc == "base64":
        # strip whitespace; tolerate a torn final group by dropping it
        compact = re.sub(rb"\s+", b"", body)
        compact = compact[:len(compact) - len(compact) % 4]
        try:
            return binascii.a2b_base64(compact)[:_PART_CAP]
        except (binascii.Error, ValueError):
            return b""
    return body                         # 7bit / 8bit / binary / unknown


def parse_mhtml(payload: bytes) -> list[dict]:
    """MHTML bytes → list of parts, each ``{headers, media, params,
    content_id, location, body}`` with the body CTE-decoded.  Raises
    ValueError on a missing/odd envelope (no boundary, no parts)."""
    sep = payload.find(b"\r\n\r\n")
    lf_sep = payload.find(b"\n\n")
    if sep < 0 or (0 <= lf_sep < sep):
        sep = lf_sep
    if sep < 0:
        raise ValueError("no top header block")
    top = parse_headers(payload[:sep])
    media, params = content_type_params(header_value(top, "content-type"))
    boundary = params.get("boundary", "")
    if not media.startswith("multipart/") or not boundary:
        raise ValueError("top content-type is not multipart with boundary")
    # RFC 2046 §5.1.1: the delimiter is CRLF + "--" + boundary — the
    # line anchor is load-bearing (boundary TEXT occurring mid-line
    # inside a QP/7bit body must not split the part); bare-LF archives
    # fall back to the LF-anchored form
    bnd = boundary.encode("latin-1")
    delim = b"\r\n--" + bnd
    if delim not in payload:
        delim = b"\n--" + bnd
    parts: list[dict] = []
    chunks = payload[sep:].split(delim)
    # chunks[0] = preamble; final chunk after the closing delimiter
    for chunk in chunks[1:]:
        if chunk.startswith(b"--"):     # closing delimiter
            break
        body_start = chunk.find(b"\r\n\r\n")
        lf = chunk.find(b"\n\n")
        if body_start < 0 or (0 <= lf < body_start):
            body_start = lf
            skip = 2
        else:
            skip = 4
        if body_start < 0:
            continue
        headers = parse_headers(chunk[:body_start].lstrip(b"\r\n"))
        # the line break before the next delimiter was consumed BY the
        # delimiter, so the body slice is exact
        body = chunk[body_start + skip:]
        p_media, p_params = content_type_params(
            header_value(headers, "content-type"))
        parts.append({
            "headers": headers,
            "media": p_media,
            "params": p_params,
            "content_id": header_value(headers, "content-id").strip("<>"),
            "location": header_value(headers, "content-location"),
            "body": decode_cte(body, header_value(
                headers, "content-transfer-encoding")),
        })
    if not parts:
        raise ValueError("no mime parts found")
    start = params.get("start", "").strip("<>")
    return _root_first(parts, start)


def _root_first(parts: list[dict], start_cid: str) -> list[dict]:
    """Order parts root-first per RFC 2387 (start= Content-ID wins,
    else the first text/html part, else document order)."""
    root = 0
    if start_cid:
        for k, p in enumerate(parts):
            if p["content_id"] == start_cid:
                root = k
                break
        else:
            start_cid = ""
    if not start_cid:
        for k, p in enumerate(parts):
            if p["media"] == "text/html":
                root = k
                break
    return [parts[root]] + parts[:root] + parts[root + 1:]


def _decode_part_text(part: dict) -> tuple[str, str]:
    """Part body → (text, charset): the declared charset= parameter is
    authoritative when the stdlib knows it; otherwise the flagship
    sniffing procedure runs on the bytes."""
    raw = part["params"].get("charset", "").lower()
    if raw:
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
                return part["body"].decode(codec, "replace"), codec
            except (LookupError, ValueError, TypeError):  # pragma: no cover
                pass
    return decode_html(part["body"])


def extract_mhtml(payload: bytes, crawl_lang: str = "") -> dict:
    """bytes → the flagship extraction contract fields (M45).

    The root HTML part runs the REAL html route (jusText classifier),
    so an archived page extracts exactly like its live twin."""
    try:
        parts = parse_mhtml(payload)
    except ValueError as exc:
        return {"lang": crawl_lang or "en", "charset": "",
                "extracted_text": "", "spans": [], "n_blocks_kept": 0,
                "n_blocks_dropped": 0, "parse_ok": False,
                "error": f"mhtml: {exc}"}
    root = parts[0]
    if root["media"] != "text/html":
        return {"lang": crawl_lang or "en", "charset": "",
                "extracted_text": "", "spans": [], "n_blocks_kept": 0,
                "n_blocks_dropped": 0, "parse_ok": False,
                "error": f"mhtml: root part is {root['media'] or '?'}"}
    text, charset = _decode_part_text(root)
    r = extract_html(text, crawl_lang)
    return {"lang": r["lang"], "charset": charset,
            "extracted_text": r["extracted_text"], "spans": r["spans"],
            "n_blocks_kept": r["n_blocks_kept"],
            "n_blocks_dropped": r["n_blocks_dropped"],
            "parse_ok": True, "error": ""}


# --------------------------------------------------------------------------
# Writer — minimal valid multipart/related archive (fixtures stay closed)
# --------------------------------------------------------------------------

def encode_qp(data: bytes, width: int = 72) -> bytes:
    """Quoted-printable encode with soft line breaks (round-trip twin
    of ``decode_qp`` — used by the writer and the hypothesis pins)."""
    out = bytearray()
    col = 0
    for b in data:
        if b == 0x3D or b < 0x20 and b not in (0x09,) or b > 0x7E:
            tok = b"=%02X" % b
        else:
            tok = bytes([b])
        if col + len(tok) > width:
            out += b"=\r\n"
            col = 0
        out += tok
        col += len(tok)
    return bytes(out)


def build_mhtml(html: bytes, *, cte: str = "quoted-printable",
                charset: str = "", location: str = "https://a.example/",
                boundary: str = "----=_Part_0_1234", start: bool = False,
                extra_parts: list[tuple[str, bytes]] | None = None,
                ) -> bytes:
    """Wrap an HTML payload as an MHTML archive.

    cte: quoted-printable | base64 | 7bit.  ``start=True`` exercises the
    RFC 2387 start= Content-ID selection with the HTML part deliberately
    NOT first.  ``extra_parts``: (media_type, bytes) resources, base64."""
    ct = "text/html" + (f'; charset="{charset}"' if charset else "")
    if cte == "base64":
        body = binascii.b2a_base64(html).rstrip(b"\n")
        body = b"\r\n".join(body[i:i + 76] for i in range(0, len(body), 76))
    elif cte == "quoted-printable":
        body = encode_qp(html)
    else:
        body = html
    html_part = (f"Content-Type: {ct}\r\n"
                 f"Content-Transfer-Encoding: {cte}\r\n"
                 "Content-ID: <root@mhtml>\r\n"
                 f"Content-Location: {location}\r\n\r\n"
                 ).encode("latin-1") + body
    resources = []
    for media, data in (extra_parts or []):
        enc = binascii.b2a_base64(data).rstrip(b"\n")
        resources.append((f"Content-Type: {media}\r\n"
                          "Content-Transfer-Encoding: base64\r\n\r\n"
                          ).encode("latin-1") + enc)
    parts = ([*resources, html_part] if start and resources
             else [html_part, *resources])
    top_ct = (f'multipart/related; boundary="{boundary}"'
              + ('; start="<root@mhtml>"' if start else ""))
    delim = b"--" + boundary.encode("latin-1")
    out = (b"From: <Saved by the engine>\r\n"
           b"MIME-Version: 1.0\r\n"
           b"Content-Type: " + top_ct.encode("latin-1") + b"\r\n\r\n")
    for p in parts:
        out += delim + b"\r\n" + p + b"\r\n"
    return out + delim + b"--\r\n"
