"""Single-document extraction entry point (SURVEY.md SS2.2 M1-M11).

``extract_document`` is the ONE function whose output bytes are the
engine's contract: the oracle calls it per url in a single process, the Ray
actor pools call it per row inside Arrow batches, and both must (and do,
by construction) agree byte-for-byte.  It is total — any internal failure
becomes a ``parse_ok=False`` row, never an exception (M11).
"""

from __future__ import annotations

from .encoding import decode_html, decode_xml, sniff_doc_type
from .html_extract import extract_html
from .pdf import extract_pdf


def empty_result(doc_type: str, lang: str, error: str = "") -> dict:
    return {
        "doc_type": doc_type,
        "lang": lang,
        "charset": "",
        "extracted_text": "",
        "spans": [],
        "n_blocks_kept": 0,
        "n_blocks_dropped": 0,
        "parse_ok": error == "",
        "error": error,
    }


_GUNZIP_CAP = 64 << 20      # zip-bomb bound (the WARC body discipline)


def _gunzip_salvage(payload: bytes) -> bytes | None:
    """Bounded gzip inflate with truncation salvage: a torn download
    still yields its decoded prefix (crawl reality); None when nothing
    decodes at all."""
    import zlib

    d = zlib.decompressobj(31)
    try:
        out = d.decompress(payload, _GUNZIP_CAP)
    except zlib.error:
        return None
    return out if out else None


def _unzstd_bounded(payload: bytes) -> bytes | None:
    """Zstandard inflate through pyarrow's bundled codec (the WARC
    br/zstd discipline, sources/warc.py M41); None when the codec is
    unavailable on this build or nothing decodes.  Output bounded by
    the codec's declared frame size; the depth cap in the caller plus
    the 64 MiB convention keep bombs bounded."""
    out = bytearray()
    try:
        import pyarrow as pa

        if not pa.Codec.is_available("zstd"):
            return None
        st = pa.input_stream(pa.BufferReader(payload), compression="zstd")
        while len(out) < _GUNZIP_CAP:
            chunk = st.read(1 << 16)
            if not chunk:
                break
            out += chunk
    except Exception:  # noqa: BLE001 — total by contract (salvage prefix)
        pass
    return bytes(out) if out else None


def extract_document(payload: bytes, crawl_lang: str = "",
                     _depth: int = 0) -> dict:
    """bytes in → extraction result dict out.  Never raises.

    Keys: doc_type, lang, charset, extracted_text, spans[(s,e)...],
    n_blocks_kept, n_blocks_dropped, parse_ok, error.
    """
    try:
        doc_type = sniff_doc_type(payload)
        if doc_type in ("gzip", "zstd"):
            # compression transports (M46): inflate and re-extract the
            # inner document — the OUT row carries the INNER doc_type;
            # depth cap keeps nested-bomb payloads bounded
            if _depth >= 2:
                return empty_result("unknown", crawl_lang,
                                    f"{doc_type}: nesting too deep")
            inner = (_gunzip_salvage(payload) if doc_type == "gzip"
                     else _unzstd_bounded(payload))
            if inner is None:
                return empty_result("unknown", crawl_lang,
                                    f"{doc_type}: undecodable stream")
            return extract_document(inner, crawl_lang, _depth + 1)
        if doc_type == "empty":
            return empty_result("empty", crawl_lang)
        if doc_type == "unknown":
            return empty_result(
                "unknown", crawl_lang, "payload is neither markup nor pdf"
            )
        if doc_type == "feed":
            from .feed import feed_to_text, parse_feed
            from .html_extract import JOINER
            from .stopwords import STOPWORDS, vote_lang

            text, charset = decode_xml(payload)
            parsed = parse_feed(text)
            body, spans, kept = feed_to_text(parsed, JOINER)
            lang = (crawl_lang if crawl_lang in STOPWORDS
                    else vote_lang(body.split(" ")) if body else "en")
            return {
                "doc_type": "feed",
                "lang": lang,
                "charset": charset,
                "extracted_text": body,
                "spans": spans,
                "n_blocks_kept": kept,
                "n_blocks_dropped": 0,
                "parse_ok": parsed["kind"] is not None,
                "error": ("" if parsed["kind"] is not None
                          else "feed root not parseable"),
            }
        if doc_type == "text":
            # plain-text documents (M49): .txt files, READMEs, logs —
            # paragraphs split on blank lines, each block ws-collapsed
            # under the shared byte conventions, ALL non-empty blocks
            # kept (plain text has no boilerplate markup to classify)
            import re as _re

            from .dom import collapse_ws
            from .html_extract import JOINER
            from .stopwords import STOPWORDS, vote_lang

            text = payload.decode("utf-8", "strict")
            pieces = [collapse_ws(p).strip()
                      for p in _re.split(r"\n[ \t\r\x0c]*\n", text)]
            pieces = [p for p in pieces if p]
            spans: list[tuple[int, int]] = []
            pos = 0
            for k, p in enumerate(pieces):
                if k:
                    pos += len(JOINER)
                spans.append((pos, pos + len(p)))
                pos += len(p)
            body = JOINER.join(pieces)
            lang = (crawl_lang if crawl_lang in STOPWORDS
                    else vote_lang(body.split(" ")) if body else "en")
            return {
                "doc_type": "text",
                "lang": lang,
                "charset": "utf-8",
                "extracted_text": body,
                "spans": spans,
                "n_blocks_kept": len(pieces),
                "n_blocks_dropped": 0,
                "parse_ok": True,
                "error": "",
            }
        if doc_type == "mhtml":
            from .mhtml import extract_mhtml

            r = extract_mhtml(payload, crawl_lang)
            return {"doc_type": "mhtml", **r}
        if doc_type in ("docx", "xlsx", "pptx", "odt", "ods", "odp",
                        "rtf", "doc", "xls", "ppt", "epub"):
            from .html_extract import JOINER
            from .stopwords import STOPWORDS, vote_lang

            if doc_type == "docx":
                from .docx import extract_docx
                r = extract_docx(payload, JOINER)
            elif doc_type == "xlsx":
                from .xlsx import extract_xlsx
                r = extract_xlsx(payload, JOINER)
            elif doc_type == "pptx":
                from .pptx import extract_pptx
                r = extract_pptx(payload, JOINER)
            elif doc_type == "odt":
                from .odt import extract_odt
                r = extract_odt(payload, JOINER)
            elif doc_type == "doc":
                from .doc_legacy import extract_doc
                r = extract_doc(payload, JOINER)
            elif doc_type == "xls":
                from .xls_legacy import extract_xls
                r = extract_xls(payload, JOINER)
            elif doc_type == "ppt":
                from .ppt_legacy import extract_ppt
                r = extract_ppt(payload, JOINER)
            elif doc_type == "epub":
                from .epub import extract_epub
                r = extract_epub(payload, JOINER)
            elif doc_type == "ods":
                from .ods_odp import extract_ods
                r = extract_ods(payload, JOINER)
            elif doc_type == "odp":
                from .ods_odp import extract_odp
                r = extract_odp(payload, JOINER)
            else:
                from .rtf import extract_rtf
                r = extract_rtf(payload, JOINER)
            body = r["extracted_text"]
            lang = (crawl_lang if crawl_lang in STOPWORDS
                    else vote_lang(body.split(" ")) if body else "en")
            return {
                "doc_type": doc_type,
                "lang": lang,
                "charset": "utf-8" if r["parse_ok"] else "",
                "extracted_text": body,
                "spans": r["spans"],
                "n_blocks_kept": r["n_blocks_kept"],
                "n_blocks_dropped": r["n_blocks_dropped"],
                "parse_ok": r["parse_ok"],
                "error": r["error"],
            }
        if doc_type == "pdf":
            r = extract_pdf(payload)
            return {
                "doc_type": "pdf",
                "lang": crawl_lang or "en",
                "charset": "",
                "extracted_text": r["extracted_text"],
                "spans": r["spans"],
                "n_blocks_kept": r["n_blocks_kept"],
                "n_blocks_dropped": r["n_blocks_dropped"],
                "parse_ok": r["parse_ok"],
                "error": "" if r["parse_ok"] else "no page content streams",
            }
        text, charset = decode_html(payload)
        r = extract_html(text, crawl_lang)
        return {
            "doc_type": "html",
            "lang": r["lang"],
            "charset": charset,
            "extracted_text": r["extracted_text"],
            "spans": r["spans"],
            "n_blocks_kept": r["n_blocks_kept"],
            "n_blocks_dropped": r["n_blocks_dropped"],
            "parse_ok": True,
            "error": "",
        }
    except Exception as exc:  # noqa: BLE001 — M11 failure routing
        return empty_result("unknown", crawl_lang, f"{type(exc).__name__}: {exc}")
