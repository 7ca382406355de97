"""Deterministic synthetic Common-Crawl-style corpus (SURVEY S5, FIXTURES SS1).

No external data exists in this sandbox, so the pages table of the
BASELINE.json input_hint shape is synthesized here, seeded, with the row mix
FIXTURES.md prescribes (boilerplate-rich HTML, charset variants, adversarial
markup, minimal PDFs from core/pdf_write, degenerate payloads, giant pages,
duplicate urls).  Every row is a pure function of ``(seed, row_index)`` so
the corpus is identical regardless of shard count or generation order —
that's what makes goldens, resume tests and the two-parallelism benchmark
meaningful.
"""

from __future__ import annotations

import datetime as _dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..core.pdf_write import PageBuilder, build_pdf
from ..core.stopwords import STOPWORDS
from ..schemas import PAGES

_BASE_TS = _dt.datetime(2024, 1, 1, 0, 0, 0)

_CONTENT: dict[str, list[str]] = {
    "en": """data system research market people world government time work
        service report company number information school community program
        business question policy health science technology water energy
        history development project result analysis example language student
        national public century process model problem economic growth industry
        region culture method value design engine network software image
        article author editor source study journal review summary section
        chapter website page content reader comment forum travel music sport
        weather city country nature animal plant food recipe garden museum
        library bridge river mountain island forest village street building
        factory hospital""".split(),
    "de": """daten system forschung markt leute welt regierung zeit arbeit
        dienst bericht firma nummer information schule gemeinde programm
        geschäft frage politik gesundheit wissenschaft technologie wasser
        energie geschichte entwicklung projekt ergebnis analyse beispiel
        sprache student staat öffentlich jahrhundert prozess modell problem
        wirtschaft wachstum industrie region kultur methode wert entwurf
        netz software bild artikel autor quelle studie zeitschrift abschnitt
        kapitel seite inhalt leser kommentar reise musik stadt land natur
        tier pflanze essen garten museum bibliothek brücke fluss berg insel
        wald dorf straße gebäude fabrik größe schön müller""".split(),
    "es": """datos sistema investigación mercado gente mundo gobierno tiempo
        trabajo servicio informe empresa número información escuela comunidad
        programa negocio pregunta política salud ciencia tecnología agua
        energía historia desarrollo proyecto resultado análisis ejemplo idioma
        estudiante nacional público siglo proceso modelo problema economía
        crecimiento industria región cultura método valor diseño red software
        imagen artículo autor fuente estudio revista sección capítulo página
        contenido lector comentario viaje música ciudad país naturaleza animal
        planta comida jardín museo biblioteca puente río montaña isla bosque
        pueblo calle edificio fábrica""".split(),
    "zh": """数据 系统 研究 市场 世界 政府 时间 工作 服务 报告 公司 号码 信息
        学校 社区 程序 商业 政策 健康 科学 技术 能源 历史 发展 项目 结果 分析
        例子 语言 学生 国家 公共 世纪 过程 模型 经济 增长 工业 地区 文化 方法
        价值 设计 网络 软件 图片 文章 作者 来源 期刊 评论 摘要 部分 章节 表格
        页面 内容 读者 旅行 音乐 城市 自然 动物 植物 食物 花园 博物馆 图书馆
        桥梁 河流 山脉 岛屿 森林 村庄 街道 建筑 工厂 医院""".split(),
}
_STOPS: dict[str, list[str]] = {k: sorted(v) for k, v in STOPWORDS.items()}
_LANGS = ("en", "de", "es", "zh")
_NAV_WORDS = ["Home", "About", "Contact", "Login", "Register", "Search",
              "Archive", "Tags", "Privacy", "Terms", "Sitemap", "RSS",
              "Jobs", "Press", "Help", "API", "Blog", "Shop"]


def _words(rng: random.Random, lang: str, n: int, stop_frac: float = 0.55) -> list[str]:
    stops = _STOPS[lang]
    content = _CONTENT[lang]
    return [
        rng.choice(stops) if rng.random() < stop_frac else rng.choice(content)
        for _ in range(n)
    ]


def _sentence(rng: random.Random, lang: str, n: int | None = None) -> str:
    n = n or rng.randint(8, 22)
    ws = _words(rng, lang, n)
    s = " ".join(ws)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, lang: str, n_sentences: int | None = None) -> str:
    n_sentences = n_sentences or rng.randint(3, 7)
    return " ".join(_sentence(rng, lang) for _ in range(n_sentences))


def _nav_html(rng: random.Random, n: int = 8) -> str:
    items = "".join(
        f'<li><a href="/{w.lower()}">{w}</a></li>'
        for w in rng.sample(_NAV_WORDS, min(n, len(_NAV_WORDS)))
    )
    return f"<nav><ul>{items}</ul></nav>"


def _sidebar_html(rng: random.Random, lang: str) -> str:
    items = "".join(
        f'<li><a href="/t/{i}">{" ".join(_words(rng, lang, rng.randint(2, 4)))}</a></li>'
        for i in range(rng.randint(4, 10))
    )
    return f'<div class="sidebar"><h3>{" ".join(_words(rng, lang, 2))}</h3><ul>{items}</ul></div>'


def _table_html(rng: random.Random, lang: str) -> str:
    rows = []
    for _ in range(rng.randint(2, 5)):
        cells = "".join(
            f"<td>{' '.join(_words(rng, lang, rng.randint(1, 3)))}</td>"
            for _ in range(rng.randint(2, 4))
        )
        rows.append(f"<tr>{cells}</tr>")
    return f"<table>{''.join(rows)}</table>"


def _main_html(rng: random.Random, lang: str, n_paras: int) -> str:
    parts = [f"<h1>{' '.join(_words(rng, lang, rng.randint(3, 7)))}</h1>"]
    for p in range(n_paras):
        if p and rng.random() < 0.25:
            parts.append(f"<h2>{' '.join(_words(rng, lang, rng.randint(2, 5)))}</h2>")
        body = _paragraph(rng, lang)
        if rng.random() < 0.3:  # inline link inside content
            body += f' <a href="/ref/{p}">{" ".join(_words(rng, lang, 2))}</a> ' + _sentence(rng, lang)
        parts.append(f"<p>{body}</p>")
        if rng.random() < 0.15:
            parts.append(f"<blockquote>{_sentence(rng, lang, 14)}</blockquote>")
        if rng.random() < 0.12:
            items = "".join(f"<li>{_sentence(rng, lang, 6)}</li>" for _ in range(rng.randint(2, 5)))
            parts.append(f"<ul>{items}</ul>")
    if rng.random() < 0.15:
        parts.append(_table_html(rng, lang))
    return "<main>" + "".join(parts) + "</main>"


def _page_html(rng: random.Random, lang: str, n_paras: int | None = None,
               charset: str = "utf-8", include_meta: bool = True) -> str:
    title = " ".join(_words(rng, lang, 4))
    meta = f'<meta charset="{charset}">' if include_meta else ""
    return (
        "<!DOCTYPE html><html><head>"
        f"{meta}<title>{title}</title>"
        "<style>.sidebar{float:left} a{color:#06c}</style>"
        "<script>var t=0;function f(a,b){return a<b?a:b}</script>"
        "</head><body>"
        f"<header>{_nav_html(rng)}</header>"
        f"{_sidebar_html(rng, lang)}"
        f"{_main_html(rng, lang, n_paras or rng.randint(1, 8))}"
        f"<footer><p>© 2024 {title}. All rights reserved.</p>"
        f"{_nav_html(rng, 4)}</footer>"
        "</body></html>"
    )


def _adversarial_html(rng: random.Random, lang: str) -> bytes:
    """Unclosed tags, comments, CDATA, entities, maybe truncated."""
    body = _page_html(rng, lang)
    muts = []
    if rng.random() < 0.6:
        body = body.replace("</p>", "", rng.randint(1, 3))
        muts.append("unclosed")
    if rng.random() < 0.5:
        body = body.replace(
            "<main>",
            "<main><!-- boilerplate <p>not text</p> comment -->", 1)
    if rng.random() < 0.5:
        body = body.replace(
            "<main>", "<main><![CDATA[raw & <notatag> cdata text]]>", 1)
    if rng.random() < 0.7:
        ents = " &amp; &lt;tag&gt; &#65;&#x42; &nbsp;&copy; &eacute &unknown; "
        body = body.replace("</main>", f"<p>{_sentence(rng, lang)}{ents}{_sentence(rng, lang)}</p></main>", 1)
    data = body.encode("utf-8")
    if rng.random() < 0.3:
        cut = rng.randint(len(data) // 3, len(data) - 1)
        data = data[:cut]
    return data


# non-ASCII PDF paragraphs (corpus v=3): shown under a custom single-byte
# encoding declared as ToUnicode or /Differences — exercises the round-3
# font-CMap subset in core/pdf.py end to end
_PDF_UNI_LINES = [
    "Résumé: café déjà vu — naïve façade près du musée",
    "Größe und Straße: schöne Grüße aus München",
    "Español: años de diseño, la niña pequeña",
    "русский текст: пример обработки данных",
    "日本語 テスト 抽出 処理 結果",
]

# corpus v=20: lines encodable under BOTH WinAnsi (cp1252) and MacRoman
# — the named-base-encoding fonts real Type1 PDFs use (M10j)
_PDF_BASE_LINES = [
    "Smart “quotes” and — em-dashes in café prose",
    "Naïve façade: ±10° of légèreté, § 42",
    "Äußerst schöne Grüße — München, œuvre complète…",
]

# CJK paragraphs (corpus v=7): shown as TWO-BYTE codes under a
# Type0/Identity-H font with a two-byte ToUnicode CMap — exercises the
# round-4 CID subset in core/pdf.py end to end (the common real-PDF
# shape for CJK text)
_PDF_CJK_LINES = [
    "こんにちは世界、これは抽出テストです。",
    "中文文本处理：大规模网页数据清洗流程",
    "한국어 텍스트 추출 파이프라인 검증 문장",
    "漢字かな交じり文の抽出結果を確認する",
    "简体字与繁體字混合的段落示例文本",
]


# corpus v=8: PDF content streams cycle the round-4 filter set —
# mostly Flate (the real-PDF majority) with LZW / ASCII85+Flate /
# RunLength / Flate+PNG-predictor minorities exercising the full
# core/pdf_filters.py decode chain end to end
_STREAM_SPECS = [False, True, True, True, "lzw", "a85+flate", "rl",
                 "flate-pred"]


def _stream_spec(rng: random.Random):
    return rng.choice(_STREAM_SPECS)


def _encrypt_spec(rng: random.Random):
    # corpus v=10/v=11: ~25% of PDFs carry the standard security handler
    # with an empty user password (the dominant encrypted-crawl-PDF
    # case) — RC4-128 most common, legacy RC4-40 and modern AES-128
    # /AESV2 (v=11) minorities; extraction must be byte-identical to
    # the plaintext twin (core/pdf_crypt.py M10f/M10g)
    return rng.choice([False] * 12
                      + ["rc4-128", "rc4-128", "rc4-40", "aes-128"])


def _pdf_payload(rng: random.Random) -> bytes:
    if rng.random() < 0.25:
        # scanned-document PDF (corpus v=4, widened in v=5/v=6): no
        # text runs at all — each page is an embedded /XObject /Image
        # of a noisy scan: a ruled TABLE (cell-grid reader) or a
        # FREE-TEXT page of numeric words (page-OCR reader, v=5), and
        # since v=6 ~30% of either kind carry a planted ±MAX_SHEAR row
        # shear (the crooked-flatbed defect) that the route's DESKEWING
        # readers estimate and invert — exactly the crawl population
        # the reference's OCR handled; extract_pdf routes each image by
        # what the readers detect
        from ..core.pdf_write import build_image_pdf
        from ..functions.table_image import (render_page_image,
                                             render_page_image_skewed,
                                             render_table_image,
                                             render_table_image_skewed)

        def scan_image():
            sid = rng.randrange(1 << 20)
            page = rng.random() < 0.4
            skew = rng.random() < 0.3
            fn = (render_page_image_skewed if page and skew
                  else render_page_image if page
                  else render_table_image_skewed if skew
                  else render_table_image)
            return fn(sid)

        # corpus v=9: real scanned PDFs are mostly DCT-compressed —
        # cycle the image filter so the flagship route decodes JPEG
        # (baseline AND progressive) scans end to end; v=12 embeds ~25%
        # of scans as BI/ID/EI INLINE images (core/pdf.py M10h) instead
        # of XObjects — the form small real-world scans take; v=14 adds
        # CCITT G4 fax scans (core/ccitt.py M30 — the office-scanner
        # codec; binary rasters round-trip losslessly through 1-bit G4)
        # v=20 adds JBIG2 (MQ generic region, core/jbig2.py M42) to the
        # scan-codec cycle; JBIG2 is not a permitted inline filter so
        # those scans always ride XObjects
        filt = rng.choice(["flate", "flate", "dct", "dct-prog",
                           "ccitt", "ccitt-ba", "jbig2"])
        return build_image_pdf(
            [scan_image() for _ in range(rng.randint(1, 2))],
            image_filter=filt,
            encrypt=_encrypt_spec(rng),
            inline=filt != "jbig2" and rng.random() < 0.25)
    n_pages = rng.randint(1, 3)
    unicode_lines: list[str] | None = None
    cid_lines: list[str] | None = None
    base_lines: list[str] | None = None
    base_enc = "WinAnsiEncoding"
    if rng.random() < 0.35:
        unicode_lines = [rng.choice(_PDF_UNI_LINES) for _ in range(2)]
    elif rng.random() < 0.25:          # corpus v=7: Type0/CID CJK pages
        cid_lines = [rng.choice(_PDF_CJK_LINES) for _ in range(2)]
    elif rng.random() < 0.3:           # corpus v=20: named base encodings
        base_lines = [rng.choice(_PDF_BASE_LINES) for _ in range(2)]
        base_enc = ("WinAnsiEncoding" if rng.random() < 0.6
                    else "MacRomanEncoding")
    pages = []
    for pi in range(n_pages):
        pb = PageBuilder()
        n_regions = rng.randint(1, 3)
        for _r in range(n_regions):
            lines = [
                " ".join(_words(rng, "en", rng.randint(6, 10)))
                for _ in range(rng.randint(2, 6))
            ]
            pb.text_lines(lines)
        if rng.random() < 0.6:
            n_cols = rng.randint(2, 4)
            rows = [
                [f"{rng.choice(_CONTENT['en'])} {rng.randint(1, 999)}"
                 for _ in range(n_cols)]
                for _row in range(rng.randint(2, 5))
            ]
            pb.table(rows)
        if rng.random() < 0.4:
            lines = [" ".join(_words(rng, "en", 7)) for _ in range(3)]
            pb.text_lines(lines)
        if unicode_lines is not None and pi == 0:
            from ..core.pdf_write import make_code_map

            cmap = make_code_map(unicode_lines)
            pb.text_lines_encoded(unicode_lines, cmap)
        if cid_lines is not None and pi == 0:
            from ..core.pdf_write import make_cid_map

            pb.text_lines_cid(cid_lines, make_cid_map(cid_lines))
        if base_lines is not None and pi == 0:
            pb.text_lines_codec(
                base_lines,
                "cp1252" if base_enc == "WinAnsiEncoding" else "mac_roman")
        pages.append(pb)
    # corpus v=22: ~20% of text PDFs put their page content inside a
    # /Subtype /Form XObject invoked via Do (core/pdf.py M10k — the
    # real-world generator shape); v=24 cycles another ~20% through the
    # /Contents ARRAY form (M10l — multiple streams concatenating per
    # §7.8.2); both are byte-identical to the direct-content twin
    as_form = rng.random() < 0.2
    split = not as_form and rng.random() < 0.25
    if unicode_lines is not None:
        from ..core.pdf_write import make_code_map

        return build_pdf(
            pages, compress=_stream_spec(rng),
            code_map=make_code_map(unicode_lines),
            encoding_style=rng.choice(["tounicode", "differences"]),
            encrypt=_encrypt_spec(rng), as_form=as_form,
            split_contents=split)
    if cid_lines is not None:
        from ..core.pdf_write import make_cid_map

        return build_pdf(
            pages, compress=_stream_spec(rng),
            code_map=make_cid_map(cid_lines),
            encoding_style="cid",
            encrypt=_encrypt_spec(rng), as_form=as_form,
            split_contents=split)
    if base_lines is not None:
        return build_pdf(pages, compress=_stream_spec(rng),
                         base_encoding=base_enc,
                         encrypt=_encrypt_spec(rng), as_form=as_form,
                         split_contents=split)
    return build_pdf(pages, compress=_stream_spec(rng),
                     encrypt=_encrypt_spec(rng), as_form=as_form,
                     split_contents=split)


def _giant_html(rng: random.Random, lang: str, cap_bytes: int) -> bytes:
    target = min(cap_bytes, int(rng.lognormvariate(11.5, 1.0)) + 64 * 1024)
    parts = []
    size = 0
    while size < target:
        chunk = _page_html(rng, lang, n_paras=8)
        # keep only the body content of subsequent chunks to stay one document
        parts.append(chunk if not parts else chunk.split("<body>", 1)[1].rsplit("</body>", 1)[0])
        size += len(chunk)
    return "".join(parts).encode("utf-8")


# (charset, charset-native phrase) — each phrase is losslessly encodable
# in its charset; shift_jis/gb2312 resolve via the alias table, the rest
# via codecs.lookup (core/encoding.py round-2 breadth)
_MB_CHARSETS = [
    ("shift_jis", "日本語 テスト 抽出 処理"),
    ("gb2312", "中文 测试 文本 处理"),
    ("koi8-r", "русский текст пример обработки"),
    ("cp1251", "кириллица проверка текста"),
    ("euc-kr", "한국어 테스트 문서"),
]


def _feed_payload(rng: random.Random, lang: str) -> bytes:
    """An RSS 2.0 or Atom feed (corpus v=13, M28): item titles +
    summaries are the main content; CDATA, entities and the Atom
    href-link form all appear so the parser's branches stay exercised
    by the flagship route."""
    feed_title = " ".join(_words(rng, lang, 3))
    n_items = rng.randint(2, 5)
    items = []
    for k in range(n_items):
        t = " ".join(_words(rng, lang, rng.randint(4, 8)))
        s = _sentence(rng, lang)
        link = f"https://feeds.example/{lang}/{rng.randrange(1 << 20)}"
        date = (_BASE_TS + _dt.timedelta(hours=k)).strftime(
            "%a, %d %b %Y %H:%M:%S GMT")
        items.append((t, s, link, date))
    if rng.random() < 0.5:
        body = "".join(
            ("<item><title>" + t + "</title><link>" + link + "</link>"
             + "<pubDate>" + date + "</pubDate>"
             + ("<description><![CDATA[" + s + "]]></description>"
                if k % 2 else "<description>" + s + "</description>")
             + "</item>")
            for k, (t, s, link, date) in enumerate(items))
        xml = ('<?xml version="1.0" encoding="utf-8"?>\n'
               '<rss version="2.0"><channel><title>' + feed_title
               + "</title>" + body + "</channel></rss>")
    else:
        body = "".join(
            ("<entry><title>" + t + "</title>"
             + f'<link rel="alternate" href="{link}"/>'
             + "<updated>" + date + "</updated>"
             + "<summary>" + s + "</summary></entry>")
            for (t, s, link, date) in items)
        xml = ('<?xml version="1.0" encoding="utf-8"?>\n'
               '<feed xmlns="http://www.w3.org/2005/Atom"><title>'
               + feed_title + "</title>" + body + "</feed>")
    return xml.encode("utf-8")


def _docx_payload(rng: random.Random, lang: str) -> bytes:
    """An OOXML .docx (corpus v=15, M31): heading + body paragraphs,
    sometimes a table and split-mid-word preserve-space runs, stored or
    deflate members — the container/markup branches the extractor must
    hold on the flagship route."""
    from ..core.docx import build_docx

    paras: list[tuple[str, str]] = [
        (" ".join(_words(rng, lang, rng.randint(2, 5))), "Heading1")]
    for _ in range(rng.randint(2, 6)):
        paras.append((_sentence(rng, lang), ""))
    if rng.random() < 0.3:
        paras.append(("", ""))          # empty paragraph → dropped block
    table = None
    if rng.random() < 0.4:
        table = [[" ".join(_words(rng, lang, 2)) for _ in range(2)]
                 for _ in range(rng.randint(1, 3))]
    return build_docx(paras, table,
                      deflate=rng.random() < 0.8,
                      split_runs=rng.random() < 0.5)


def _xlsx_payload(rng: random.Random, lang: str) -> bytes:
    """An OOXML .xlsx (corpus v=16, M32): 1-2 sheets of mixed strings,
    numbers and booleans, cycling shared vs inline strings and stored
    vs deflate members — the SpreadsheetML branches on the flagship
    route."""
    from ..core.xlsx import build_xlsx

    def sheet_rows() -> list[list[object]]:
        rows: list[list[object]] = []
        for _ in range(rng.randint(2, 5)):
            row: list[object] = [" ".join(_words(rng, lang, rng.randint(1, 3)))]
            row.append(rng.randint(0, 9999))
            if rng.random() < 0.4:
                row.append(rng.random() < 0.5)
            if rng.random() < 0.2:
                row.append(None)        # gap: next ref is explicit
                row.append(" ".join(_words(rng, lang, 2)))
            rows.append(row)
        return rows

    sheets = [("Data", sheet_rows())]
    if rng.random() < 0.3:
        sheets.append((" ".join(_words(rng, lang, 2)), sheet_rows()))
    return build_xlsx(sheets, deflate=rng.random() < 0.8,
                      shared=rng.random() < 0.6)


def _pptx_payload(rng: random.Random, lang: str) -> bytes:
    """An OOXML .pptx (corpus v=17, M33): 1-3 slides of title + bullet
    paragraphs, sometimes an empty paragraph and split runs, stored or
    deflate members — the PresentationML branches on the flagship
    route."""
    from ..core.pptx import build_pptx

    slides: list[list[str]] = []
    for _ in range(rng.randint(1, 3)):
        paras = [" ".join(_words(rng, lang, rng.randint(2, 5)))]
        for _ in range(rng.randint(1, 4)):
            paras.append(_sentence(rng, lang, rng.randint(4, 12)))
        if rng.random() < 0.25:
            paras.append("")            # empty paragraph → dropped block
        slides.append(paras)
    return build_pptx(slides, deflate=rng.random() < 0.8,
                      split_runs=rng.random() < 0.5)


def _odt_payload(rng: random.Random, lang: str) -> bytes:
    """An OpenDocument .odt (corpus v=18, M34): heading + body
    paragraphs, sometimes nested spans and an empty paragraph, stored
    or deflate members — the ODF branches on the flagship route."""
    from ..core.odt import build_odt

    paras: list[tuple[str, int]] = [
        (" ".join(_words(rng, lang, rng.randint(2, 5))), 1)]
    for _ in range(rng.randint(2, 5)):
        paras.append((_sentence(rng, lang), 0))
    if rng.random() < 0.25:
        paras.append(("", 0))           # empty paragraph → dropped block
    return build_odt(paras, deflate=rng.random() < 0.8,
                     use_spans=rng.random() < 0.5)


def _rtf_payload(rng: random.Random, lang: str) -> bytes:
    """An RTF document (corpus v=19, M35): title + body paragraphs,
    cycling cp1252 hex-escape and \\uN? unicode forms, sometimes an
    ignorable footnote destination the reader must skip."""
    from ..core.rtf import build_rtf

    paras = [" ".join(_words(rng, lang, rng.randint(2, 5)))]
    for _ in range(rng.randint(2, 5)):
        paras.append(_sentence(rng, lang))
    fn = _sentence(rng, lang, 5) if rng.random() < 0.3 else None
    return build_rtf(paras, unicode_form=rng.random() < 0.5,
                     with_footnote=fn)


def _doc_payload(rng: random.Random, lang: str) -> bytes:
    """A legacy Word .doc (corpus v=20, M37): CFB container + piece
    table, cycling cp1252 vs unicode pieces, split pieces, either
    table stream, sometimes a field construct whose instruction text
    must be excluded."""
    from ..core.doc_legacy import build_doc

    paras = [" ".join(_words(rng, lang, rng.randint(2, 5)))]
    for _ in range(rng.randint(2, 5)):
        paras.append(_sentence(rng, lang))
    field = (("HYPERLINK http://x.example", _sentence(rng, lang, 4))
             if rng.random() < 0.3 else None)
    return build_doc(paras, unicode_pieces=rng.random() < 0.5,
                     which_tbl=rng.randrange(2),
                     split_pieces=rng.random() < 0.5, field=field)


def _xls_payload(rng: random.Random, lang: str) -> bytes:
    """A legacy Excel .xls (corpus v=20, M38): BIFF8 workbook of mixed
    strings/numbers/bools, shared vs inline strings, RK vs NUMBER."""
    from ..core.xls_legacy import build_xls

    nr = rng.randint(2, 4)
    rows = []
    for r in range(nr):
        rows.append([" ".join(_words(rng, lang, rng.randint(1, 3))),
                     rng.randint(-10000, 10000),
                     rng.random() < 0.5])
    sheets = [("Sheet1", rows)]
    if rng.random() < 0.3:
        sheets.append((" ".join(_words(rng, lang, 1)),
                       [[_sentence(rng, lang, 4)]]))
    return build_xls(sheets, shared=rng.random() < 0.7,
                     use_rk=rng.random() < 0.5)


def _ppt_payload(rng: random.Random, lang: str) -> bytes:
    """A legacy PowerPoint .ppt (corpus v=20, M39): slide containers of
    text atoms, chars vs bytes form cycled."""
    from ..core.ppt_legacy import build_ppt

    slides = []
    for _ in range(rng.randint(1, 3)):
        paras = [" ".join(_words(rng, lang, rng.randint(2, 4)))]
        for _ in range(rng.randint(1, 3)):
            paras.append(_sentence(rng, lang))
        slides.append(paras)
    return build_ppt(slides, chars_atoms=rng.random() < 0.5)


def _epub_payload(rng: random.Random, lang: str) -> bytes:
    """An EPUB e-book (corpus v=21, M44): 1-3 spine chapters of titled
    paragraphs, stored vs deflated ZIP members — the OCF/OPF walk on
    the flagship route."""
    from ..core.epub import build_epub

    chapters = []
    for _ in range(rng.randint(1, 3)):
        title = " ".join(_words(rng, lang, rng.randint(2, 4)))
        paras = [_sentence(rng, lang) for _ in range(rng.randint(1, 4))]
        chapters.append((title, paras))
    return build_epub(chapters, deflate=rng.random() < 0.8)


def _mhtml_payload(rng: random.Random, lang: str) -> bytes:
    """An MHTML web archive (corpus v=21, M45): a normal synthetic page
    wrapped in a multipart/related envelope, cycling QP/base64/7bit
    CTEs, declared vs sniffed charset, start= root selection and a
    binary resource part the text route must skip."""
    from ..core.mhtml import build_mhtml

    html = _page_html(rng, lang).encode("utf-8")
    cte = ("quoted-printable", "base64", "7bit")[rng.randrange(3)]
    extra = ([("image/png",
               bytes(rng.randrange(256) for _ in range(rng.randint(8, 64))))]
             if rng.random() < 0.4 else None)
    return build_mhtml(html, cte=cte,
                       charset="utf-8" if rng.random() < 0.5 else "",
                       start=rng.random() < 0.3, extra_parts=extra)


def _ods_payload(rng: random.Random, lang: str) -> bytes:
    """An ODF spreadsheet (corpus v=25, M47): typed cells (strings,
    ints, floats, booleans, gaps), repeated-column pairs, stored vs
    deflated packages."""
    from ..core.ods_odp import build_ods

    def rows() -> list[list[object]]:
        out: list[list[object]] = []
        for _ in range(rng.randint(2, 5)):
            row: list[object] = [" ".join(_words(rng, lang,
                                                 rng.randint(1, 3)))]
            row.append(rng.randint(-9999, 9999))
            if rng.random() < 0.4:
                row.append(rng.random() < 0.5)
            if rng.random() < 0.2:
                row.append(None)
                row.append(" ".join(_words(rng, lang, 2)))
            out.append(row)
        return out

    sheets = [("Data", rows())]
    if rng.random() < 0.3:
        sheets.append((" ".join(_words(rng, lang, 2)), rows()))
    return build_ods(sheets, deflate=rng.random() < 0.8,
                     repeat_cols=rng.random() < 0.3)


def _odp_payload(rng: random.Random, lang: str) -> bytes:
    """An ODF presentation (corpus v=25, M48): 1-3 slides of title +
    bullets, presenter notes planted on some decks (reader excludes)."""
    from ..core.ods_odp import build_odp

    slides = []
    for _ in range(rng.randint(1, 3)):
        paras = [" ".join(_words(rng, lang, rng.randint(2, 4)))]
        for _ in range(rng.randint(1, 3)):
            paras.append(_sentence(rng, lang))
        slides.append(paras)
    return build_odp(slides, deflate=rng.random() < 0.8,
                     with_notes=rng.random() < 0.3)


def make_row(i: int, seed: int = 42, giant_cap: int = 256 * 1024) -> dict:
    """Pure function (seed, i) → one pages row; i%50==49 duplicates i-1."""
    if i % 50 == 49 and i > 0:
        base = make_row(i - 1, seed, giant_cap)
        base["warc_ts"] = base["warc_ts"] + _dt.timedelta(hours=1)
        return base
    rng = random.Random(f"{seed}:{i}")
    lang = _LANGS[rng.randrange(4)] if rng.random() < 0.9 else ""
    gen_lang = lang or _LANGS[rng.randrange(4)]
    url = f"https://site{i % 97}.example/{gen_lang}/page-{i}"
    ts = _BASE_TS + _dt.timedelta(seconds=i * 137)
    roll = rng.random()
    if roll < 0.66 or 0.699 <= roll < 0.70:
        html = _page_html(rng, gen_lang).encode("utf-8")
    elif roll < 0.6706:
        # corpus v=15-19: the [0.66, 0.68) office band splits five
        # ways so the 200-row tiny golden corpus draws each office
        # type (seed-42 rolls: 14/85 docx, 18 xlsx, 1 pptx, 127 odt,
        # 181 rtf)
        html = _docx_payload(rng, gen_lang)
    elif roll < 0.673:
        html = _xlsx_payload(rng, gen_lang)
    elif roll < 0.675:
        html = _pptx_payload(rng, gen_lang)
    elif roll < 0.678:
        html = _odt_payload(rng, gen_lang)
    elif roll < 0.68:
        html = _rtf_payload(rng, gen_lang)
    elif roll < 0.683:
        # corpus v=20: the [0.68, 0.687) legacy-binary band (M37-M39)
        html = _doc_payload(rng, gen_lang)
    elif roll < 0.685:
        html = _xls_payload(rng, gen_lang)
    elif roll < 0.687:
        html = _ppt_payload(rng, gen_lang)
    elif roll < 0.690:
        # corpus v=21: the [0.687, 0.693) crawl-container band (M44-M45)
        html = _epub_payload(rng, gen_lang)
    elif roll < 0.693:
        html = _mhtml_payload(rng, gen_lang)
    elif roll < 0.696:
        # corpus v=23: gzip-wrapped payloads (M46) — .gz assets and
        # mislabeled content-encoding leftovers; mostly pages, ~20% PDFs
        import zlib as _z
        inner = (_pdf_payload(rng) if rng.random() < 0.2
                 else _page_html(rng, gen_lang).encode("utf-8"))
        if rng.random() < 0.33:
            # v=24: a zstd-framed minority (decoded via pyarrow's codec)
            import pyarrow as _pa
            html = bytes(_pa.Codec("zstd").compress(inner))
        else:
            co = _z.compressobj(6, _z.DEFLATED, 31)
            html = co.compress(inner) + co.flush()
    elif roll < 0.697:
        # corpus v=25: ODF spreadsheet/presentation band (M47/M48)
        html = _ods_payload(rng, gen_lang)
    elif roll < 0.698:
        html = _odp_payload(rng, gen_lang)
    elif roll < 0.699:
        # corpus v=26: plain-text documents (M49) — .txt/READMEs;
        # paragraphs separated by blank lines, no markup at all
        html = "\n\n".join(
            _paragraph(rng, gen_lang, rng.randint(1, 3))
            for _ in range(rng.randint(1, 5))).encode("utf-8")
    elif roll < 0.80:  # charset variants
        sub = rng.random()
        if sub < 0.3 and gen_lang in ("de", "es"):
            html = _page_html(rng, gen_lang, charset="ISO-8859-1").encode("latin-1", "replace")
        elif sub < 0.55:
            html = b"\xef\xbb\xbf" + _page_html(rng, gen_lang).encode("utf-8")
        elif sub < 0.75:
            html = _page_html(rng, gen_lang, include_meta=False).encode("utf-8")
        else:
            # multi-byte charsets (round 2, VERDICT r1 'Missing' #3):
            # declared via <meta>, body carries charset-native text so the
            # decode genuinely exercises the multi-byte path
            cs, phrase = _MB_CHARSETS[rng.randrange(len(_MB_CHARSETS))]
            page = _page_html(rng, gen_lang, charset=cs)
            page = page.replace(
                "</body>", f"<p>{phrase} {phrase}</p></body>", 1)
            html = page.encode(cs, "replace")
    elif roll < 0.88:
        html = _adversarial_html(rng, gen_lang)
    elif roll < 0.93:
        html = _pdf_payload(rng)
    elif roll < 0.95:
        html = b""
    elif roll < 0.965:
        html = bytes(rng.randrange(256) for _ in range(rng.randint(16, 512)))
    elif roll < 0.98:  # corpus v=13: RSS/Atom feeds (M28)
        html = _feed_payload(rng, gen_lang)
    else:
        html = _giant_html(rng, gen_lang, giant_cap)
    wet = " ".join(_words(rng, gen_lang, 40))
    return {"url": url, "warc_ts": ts, "html": html, "text": wet, "lang": lang}


def gen_corpus(out_dir: str, n_rows: int, seed: int = 42, n_shards: int = 8,
               giant_cap: int = 256 * 1024, force: bool = False) -> list[str]:
    """Write the corpus as ``{out_dir}/part-{s:05d}.parquet`` shards.

    Idempotent: if the directory already holds the expected shard set (and a
    stamp matching the request), it is reused — bench excludes generation
    time this way.  Returns the shard paths in order.
    """
    os.makedirs(out_dir, exist_ok=True)
    stamp_path = os.path.join(out_dir, "_STAMP")
    stamp = f"seed={seed} n={n_rows} shards={n_shards} cap={giant_cap} v=26"
    paths = [os.path.join(out_dir, f"part-{s:05d}.parquet") for s in range(n_shards)]
    if not force and os.path.exists(stamp_path):
        with open(stamp_path) as fh:
            if fh.read() == stamp and all(os.path.exists(p) for p in paths):
                return paths
    for s in range(n_shards):
        rows = [make_row(i, seed, giant_cap) for i in range(s, n_rows, n_shards)]
        cols = {name: [r[name] for r in rows] for name in PAGES.names}
        table = pa.Table.from_pydict(cols, schema=PAGES)
        pq.write_table(table, paths[s], row_group_size=max(64, len(rows) // 4))
    with open(stamp_path, "w") as fh:
        fh.write(stamp)
    return paths
