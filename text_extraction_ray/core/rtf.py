"""RTF text extraction (SURVEY §2.2 M35, round 4).

The pre-OOXML office format still abundant in older crawl strata (and
the usual container for .doc exports that aren't OLE).  Implemented
from the published RTF 1.9.1 specification — a completely different
grammar from the ZIP/XML family: a brace-group token stream of control
words, control symbols and literal text.

``parse_rtf`` is a single bounded scan with an explicit group-state
stack (the spec's reading model, §"Formal Syntax"):

- control words ``\\word[-]N`` with the optional single space eaten;
  control symbols ``\\{`` ``\\}`` ``\\\\`` (literals), ``\\~`` (nbsp),
  ``\\-``/``\\_`` (soft hyphens → dropped), ``\\*`` (mark the NEXT
  destination ignorable);
- ``\\'hh`` hex-escaped bytes decoded through the document's declared
  code page (``\\ansicpgN``, default cp1252) — bytes accumulate so
  multi-byte codepages (cp932 etc.) decode correctly in runs;
- ``\\uN`` Unicode escapes with the ``\\ucN`` skip-count protocol
  (the following N fallback bytes/escapes are consumed, per group);
  negative N means N+65536 (signed 16-bit form);
- destination groups whose content is NOT body text are skipped by a
  depth counter: ``fonttbl colortbl stylesheet info pict header footer
  footnote annotation field-instructions...`` plus every ``{\\*\\...}``
  unknown destination (spec: readers must ignore these) — footnote
  exclusion matches the docx/ODT policy;
- ``\\par``/``\\sect``/``\\page`` close a paragraph; ``\\line``/
  ``\\tab``/``\\cell`` fold to a space; ``\\row`` closes the (cell-
  joined) table-row paragraph.

``extract_rtf`` assembles non-empty paragraphs under the HTML
joiner/span conventions so ``doc_type="rtf"`` rows join the
byte-identity contract.  ``build_rtf`` writes deterministic documents
(font/color tables, escape forms cycled) so the corpus stays closed.
"""

from __future__ import annotations

import re

from .dom import collapse_ws

_MAX_SCAN = 8 << 20

_CW_RE = re.compile(r"\\([a-z]+)(-?\d+)? ?", re.ASCII)

# destination control words whose group content is never body text
_SKIP_DESTS = frozenset("""
    fonttbl colortbl stylesheet info pict object header footer headerl
    headerr headerf footerl footerr footerf footnote annotation xe tc
    field fldinst bkmkstart bkmkend themedata colorschememapping
    listtable listoverridetable generator operator title subject author
    keywords comment doccomm
""".split())


def _decode_pending(pending: bytearray, codec: str, out: list[str]) -> None:
    if pending:
        out.append(pending.decode(codec, "replace"))
        pending.clear()


def parse_rtf(data: bytes) -> list[str]:
    """RTF bytes → paragraphs (ws-collapsed) in document order.
    Raises ValueError if the payload is not RTF."""
    if not data.startswith(b"{\\rtf"):
        raise ValueError("rtf: missing {\\rtf header")
    hay = data[:_MAX_SCAN].decode("latin-1")   # byte-transparent carrier
    codec = "cp1252"
    paras: list[str] = []
    buf: list[str] = []
    pending = bytearray()                      # undecoded \'hh run
    # group state: (skip_depth_marker, uc_count)
    stack: list[tuple[bool, int]] = []
    skipping = 0            # depth of enclosing skipped destinations
    uc = 1                  # current \ucN skip count
    star = False            # saw \* — next control word opens a dest
    uc_pending = 0          # fallback units still to swallow after \uN
    i, n = 1, len(hay)      # past the opening '{'
    stack.append((False, uc))

    def close_para() -> None:
        _decode_pending(pending, codec, buf)
        text = collapse_ws("".join(buf)).strip()
        paras.append(text)
        buf.clear()

    while i < n:
        ch = hay[i]
        if ch == "{":
            stack.append((skipping > 0, uc))
            if star:
                # {\*\dest ...}: ignorable destination
                skipping += 1
                star = False
            i += 1
        elif ch == "}":
            if stack:
                was_skipping, uc = stack.pop()
                if skipping and not was_skipping:
                    skipping -= 1
            star = False
            i += 1
            if not stack:
                break
        elif ch == "\\":
            nxt = hay[i + 1:i + 2]
            if nxt == "'":
                code = hay[i + 2:i + 4]
                i += 4
                if uc_pending:
                    uc_pending -= 1
                elif not skipping:
                    try:
                        pending.append(int(code, 16))
                    except ValueError:
                        pass
            elif nxt == "*":
                star = True
                i += 2
            elif nxt in ("{", "}", "\\"):
                if not skipping and not uc_pending:
                    _decode_pending(pending, codec, buf)
                    buf.append(nxt)
                i += 2
            elif nxt == "~":
                if not skipping and not uc_pending:
                    _decode_pending(pending, codec, buf)
                    buf.append(" ")
                i += 2
            elif nxt in ("-", "_"):
                i += 2
            elif nxt == "\n" or nxt == "\r":
                # \<newline> is \par in old writers
                if not skipping:
                    close_para()
                i += 2
            else:
                m = _CW_RE.match(hay, i)
                if not m:
                    i += 1      # lone backslash: tolerate
                    continue
                word, num = m.group(1), m.group(2)
                i = m.end()
                if star and word not in ("u",):
                    # \*\anything: the whole current group is ignorable
                    star = False
                    if not skipping:
                        skipping += 1
                        if stack:
                            stack[-1] = (False, stack[-1][1])
                    continue
                if word in _SKIP_DESTS:
                    if not skipping:
                        skipping += 1
                        if stack:
                            stack[-1] = (False, stack[-1][1])
                elif word == "ansicpg" and num:
                    try:
                        b"".decode(f"cp{int(num)}")
                    except (LookupError, ValueError):
                        pass
                    else:
                        codec = f"cp{int(num)}"
                elif word == "uc" and num is not None:
                    uc = max(0, int(num))
                elif word == "u" and num is not None:
                    if uc_pending:
                        uc_pending -= 1
                    elif not skipping:
                        cp = int(num)
                        if cp < 0:
                            cp += 65536
                        _decode_pending(pending, codec, buf)
                        buf.append(chr(cp) if 0 <= cp < 0x110000
                                   else "\ufffd")
                    uc_pending += uc
                elif skipping:
                    pass
                elif uc_pending:
                    uc_pending -= 1
                elif word in ("par", "sect", "page", "row"):
                    close_para()
                elif word in ("line", "tab", "cell"):
                    _decode_pending(pending, codec, buf)
                    buf.append(" ")
                elif word in ("emdash", "endash"):
                    _decode_pending(pending, codec, buf)
                    buf.append("\u2014" if word == "emdash" else "\u2013")
                elif word in ("lquote", "rquote"):
                    _decode_pending(pending, codec, buf)
                    buf.append("\u2018" if word == "lquote" else "\u2019")
                elif word in ("ldblquote", "rdblquote"):
                    _decode_pending(pending, codec, buf)
                    buf.append("\u201c" if word == "ldblquote"
                               else "\u201d")
                # every other control word is formatting: ignored
        elif ch in ("\r", "\n", "\x00"):
            i += 1              # raw newlines are NOT text in RTF
        else:
            j = i
            while j < n and hay[j] not in "\\{}\r\n\x00":
                j += 1
            if uc_pending:
                take = min(uc_pending, j - i)
                uc_pending -= take
                i += take
                continue
            if not skipping:
                # plain text travels as bytes of the document codepage
                pending.extend(hay[i:j].encode("latin-1"))
            i = j
    # tail after the last \par: a paragraph only if it has content
    _decode_pending(pending, codec, buf)
    if "".join(buf).strip():
        close_para()
    return paras


def extract_rtf(payload: bytes, joiner: str) -> dict:
    """bytes → the flagship extraction contract fields."""
    try:
        paras = parse_rtf(payload)
    except ValueError as exc:
        return {"extracted_text": "", "spans": [], "n_blocks_kept": 0,
                "n_blocks_dropped": 0, "parse_ok": False,
                "error": f"rtf: {exc}"}
    pieces = [p for p in paras if p]
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
# Writer — deterministic RTF (fixtures stay closed)
# --------------------------------------------------------------------------

def _escape_unicode(text: str) -> str:
    out: list[str] = []
    for ch in text:
        o = ord(ch)
        if ch in "\\{}":
            out.append("\\" + ch)
        elif o < 128:
            out.append(ch)
        else:
            out.append(f"\\u{o if o < 32768 else o - 65536}?")
    return "".join(out)


def build_rtf(paragraphs: list[str], *, unicode_form: bool = False,
              with_footnote: str | None = None) -> bytes:
    """Paragraphs → a deterministic RTF doc with the furniture real
    writers emit (font/color tables, generator info — all must be
    skipped by readers).  ``unicode_form`` writes non-ASCII as \\uN?,
    else as \\'hh cp1252 bytes where representable."""
    body: list[str] = []
    for k, t in enumerate(paragraphs):
        enc = _escape_rtf_cp1252(t) if not unicode_form \
            else _escape_unicode(t)
        if k == 0 and with_footnote is not None:
            enc += ("{\\*\\footnote " +
                    _escape_rtf_cp1252(with_footnote) + "}")
        body.append(enc + "\\par\n")
    return (
        "{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1"
        "{\\fonttbl{\\f0\\froman Times New Roman;}}"
        "{\\colortbl ;\\red0\\green0\\blue0;}"
        "{\\*\\generator text_extraction_ray 1.0;}"
        "\\viewkind4\\f0\\fs24 " + "".join(body) + "}"
    ).encode("latin-1", "replace")


def _escape_rtf_cp1252(text: str) -> str:
    out: list[str] = []
    for ch in text:
        o = ord(ch)
        if ch in "\\{}":
            out.append("\\" + ch)
        elif o < 128:
            out.append(ch)
        else:
            try:
                b = ch.encode("cp1252")
                out.append(f"\\'{b[0]:02x}")
            except UnicodeEncodeError:
                out.append(f"\\u{o if o < 32768 else o - 65536}?")
    return "".join(out)
