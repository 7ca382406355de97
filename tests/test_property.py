"""Property-based tests (hypothesis) for the pure extraction core.

The fused fast path must be classification-equivalent to the reference
path for ARBITRARY inputs, not just the corpus — this is the invariant
the byte-identity contract stands on (SURVEY SS2.2 M6-M8)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core import html_extract as hx
from text_extraction_ray.core.extract import extract_document
from text_extraction_ray.core.stopwords import STOPWORDS, stoplist_for

# html-ish soup: text, tags (balanced-ish and junk), entities, links,
# rawtext traps, malformed comments/CDATA — the full grammar both
# segmenter implementations must agree on
_tag = st.sampled_from([
    "<p>", "</p>", "<p >", "<P>", "<div class='x y'>", '<div id="z">',
    "<a href='u'>", '<a href="v">', "<a href=w q>", "<a>", "</a>", "</A>",
    "<script>", "</script>", "<script >var a='</scr'+'ipt>'</script>",
    "<style>p{}</style>", "<textarea></textarea>", "<pre>", "</pre>",
    "<br>", "<br/>", "<br />", "<img src=x>", "<input value='<p>'>",
    "<td>", "</td>", "<li>", "<ul>", "</ul>", "<h1>", "</h1>", "<h6>",
    "<!-- <p>no</p> -->", "<!--", "-->", "<![CDATA[raw < text]]>",
    "<!doctype html>", "<?php ?>", "</", "< ", "<1", "<>", ">", "<", "<x",
    "&amp;", "&lt;", "&#60;", "&#x3C;", "&#X3c;", "&notareal;", "&amp",
    "&copy;", "&copy", "&AMP;", "&;", "&", ";", "\xa9"])
_word = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="<>&"),
    min_size=1, max_size=12)
_chunk = st.one_of(_tag, _word, st.just(" "), st.just("\n"))
_soup = st.lists(_chunk, max_size=120).map("".join)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_fused_segmenter_equivalent(doc):
    a = hx.segment_blocks(doc)
    b = hx.segment_blocks_reference(doc)
    assert [(x.block_id, x.tag_path, x.text, x.n_link_chars) for x in a] \
        == [(y.block_id, y.tag_path, y.text, y.n_link_chars) for y in b]


@settings(max_examples=300, deadline=None)
@given(_soup, st.sampled_from(sorted(STOPWORDS)))
def test_fused_classify_equivalent(doc, lang):
    sl = stoplist_for(lang)
    a = hx.segment_blocks(doc)
    hx.featurize_classify(a, sl)
    b = hx.segment_blocks(doc)
    hx.featurize(b, sl)
    hx.classify_context_free(b)
    assert [(x.cf_class, x.heading) for x in a] \
        == [(y.cf_class, y.heading) for y in b]


@settings(max_examples=200, deadline=None)
@given(_soup)
def test_extract_html_spans_consistent(doc):
    r = hx.extract_html(doc)
    text = r["extracted_text"]
    prev_end = None
    for s, e in r["spans"]:
        assert 0 <= s <= e <= len(text)
        if prev_end is not None:
            assert s == prev_end + 2  # JOINER "\n\n" between blocks
        prev_end = e
    assert r["n_blocks_kept"] == len(r["spans"])


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4096))
def test_extract_document_total_on_bytes(payload):
    r = extract_document(payload, "en")
    assert isinstance(r["extracted_text"], str)
    assert r["doc_type"] in ("html", "pdf", "empty", "unknown")


@settings(max_examples=200, deadline=None)
@given(_soup, st.sampled_from(sorted(STOPWORDS)))
def test_context_sensitive_resolves_all(doc, lang):
    """After jusText phase 2 every block is good or bad — short/neargood
    never leak into assembly."""
    blocks = hx.segment_blocks(doc)
    hx.featurize_classify(blocks, stoplist_for(lang))
    hx.classify_context_sensitive(blocks)
    assert all(b.cls in ("good", "bad") for b in blocks)


# --- PDF writer↔parser roundtrip property ----------------------------------

_cell = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
                min_size=0, max_size=3)
_pword = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=6)
_para = st.lists(
    st.lists(_pword, min_size=1, max_size=5).map(" ".join),
    min_size=1, max_size=4)
_table = st.lists(st.lists(_cell, min_size=1, max_size=4),
                  min_size=1, max_size=4)
_regions = st.lists(
    st.one_of(st.tuples(st.just("p"), _para), st.tuples(st.just("t"), _table)),
    min_size=1, max_size=4)


@settings(max_examples=250, deadline=None)
@given(_regions)
def test_pdf_roundtrip_random_layouts(regions):
    """Any writer-emittable page (random mix of paragraphs and ruled
    tables, incl. ragged/empty cells and stacked tables) must extract to
    exactly the constructed text in reading order."""
    from text_extraction_ray.core.pdf import extract_pdf
    from text_extraction_ray.core.pdf_write import PageBuilder, build_pdf

    pb = PageBuilder()
    expected = []
    for kind, content in regions:
        if kind == "p":
            pb.text_lines(content)
            expected.append(" ".join(content))
        else:
            n_cols = max(len(r) for r in content)
            pb.table(content)
            expected.append("\n".join(
                "\t".join((r + [""] * n_cols)[:n_cols]) for r in content))
    out = extract_pdf(build_pdf([pb], compress=True))
    assert out["parse_ok"]
    assert out["extracted_text"] == "\n\n".join(t for t in expected if t)


# --- HTML table-grid extraction properties ---------------------------------

_tcell = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789 ", max_size=6)
_tgrid = st.lists(st.lists(_tcell, min_size=1, max_size=4),
                  min_size=1, max_size=4)


@settings(max_examples=200, deadline=None)
@given(_tgrid)
def test_html_table_roundtrip(grid):
    from text_extraction_ray.functions.html_tables import tables_in_doc

    doc = "<table>" + "".join(
        "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
        for row in grid) + "</table>"
    expect = [[" ".join(c.split()) for c in row] for row in grid]
    assert tables_in_doc(doc) == [expect]


@settings(max_examples=200, deadline=None)
@given(_soup)
def test_html_tables_total_on_soup(doc):
    from text_extraction_ray.functions.html_tables import tables_in_doc

    for rows in tables_in_doc(doc):
        for row in rows:
            assert all(isinstance(c, str) for c in row)


_pline = st.lists(_pword, min_size=1, max_size=4).map(" ".join)
_col = st.lists(_pline, min_size=3, max_size=6)


@settings(max_examples=150, deadline=None)
@given(_col, _col)
def test_pdf_two_column_reading_order(left, right):
    """Left column reads fully before the right column for any two
    overlapping >=3-line columns (the documented column-split condition)."""
    from text_extraction_ray.core.pdf import extract_pdf
    from text_extraction_ray.core.pdf_write import TOP_Y, PageBuilder, build_pdf

    pb = PageBuilder()
    pb.text_lines(left)
    pb.text_lines_at(right, x=360.0, y=TOP_Y)
    out = extract_pdf(build_pdf([pb]))
    assert out["extracted_text"] == " ".join(left) + "\n\n" + " ".join(right)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",),
                                      blacklist_characters="﻿"),
               max_size=500))
def test_utf8_decode_roundtrip(t):
    """Strict-utf8 sniffing: any BOM-free unicode payload decodes back
    byte-exactly."""
    from text_extraction_ray.core.encoding import decode_html

    decoded, _charset = decode_html(t.encode("utf-8"))
    assert decoded == t


@settings(max_examples=150, deadline=None)
@given(st.lists(_regions, min_size=1, max_size=3))
def test_pdf_multipage_roundtrip_and_spans(pages):
    """Multi-page documents: pages join with JOINER and the returned spans
    tile extracted_text exactly (page boundaries are the span edges)."""
    from text_extraction_ray.core.pdf import extract_pdf
    from text_extraction_ray.core.pdf_write import PageBuilder, build_pdf

    pbs, page_texts = [], []
    for regions in pages:
        pb = PageBuilder()
        parts = []
        for kind, content in regions:
            if kind == "p":
                pb.text_lines(content)
                parts.append(" ".join(content))
            else:
                n_cols = max(len(r) for r in content)
                pb.table(content)
                parts.append("\n".join(
                    "\t".join((r + [""] * n_cols)[:n_cols]) for r in content))
        pbs.append(pb)
        text = "\n\n".join(t for t in parts if t)
        if text:
            page_texts.append(text)
    out = extract_pdf(build_pdf(pbs, compress=True))
    assert out["extracted_text"] == "\n\n".join(page_texts)
    pos = 0
    for (s, e), pt in zip(out["spans"], page_texts):
        assert (s, e) == (pos, pos + len(pt))
        pos = e + 2


# --- raster codecs (round 2) ------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    filt=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_bmp_roundtrip_property(w, h, filt, seed):
    """Any 8-bit grey raster survives encode→decode byte-exactly through
    BOTH from-scratch codecs, for every PNG filter type."""
    import numpy as np

    from text_extraction_ray.core.raster import (
        decode_bmp,
        decode_png,
        encode_bmp,
        encode_png,
    )

    gray = np.random.RandomState(seed).randint(
        0, 256, size=w * h, dtype=np.uint8).tobytes()
    assert decode_png(encode_png(w, h, gray, filter_type=filt)) == (w, h, gray)
    assert decode_bmp(encode_bmp(w, h, gray)) == (w, h, gray)


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_raster_decoders_total_on_garbage(data):
    """Decoders are TOTAL: arbitrary bytes either decode or raise
    ValueError — never crash with anything else (engine error-routing
    contract)."""
    from text_extraction_ray.core.raster import decode_bmp, decode_png

    for dec in (decode_bmp, decode_png):
        try:
            dec(data)
        except ValueError:
            pass


# --- streaming WARC reader (round 2) ----------------------------------------

@settings(max_examples=30, deadline=None)
@given(
    chunk=st.integers(min_value=16, max_value=4096),
    n_recs=st.integers(min_value=0, max_value=10),
    gz=st.booleans(),
    cut_frac=st.one_of(st.none(), st.floats(min_value=0.05, max_value=0.99)),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_warc_stream_equals_whole_for_any_chunking(chunk, n_recs, gz,
                                                   cut_frac, seed):
    """iter_warc_stream must yield EXACTLY parse_warc(whole-buffer) for
    any chunk size, record mix, gzip-member setting and truncation point —
    the bounded-memory reader can never change results."""
    import datetime as dtm
    import io
    import random

    from text_extraction_ray.sources.warc import (
        iter_warc_stream,
        parse_warc,
        write_warc,
    )

    rng = random.Random(seed)
    ts0 = dtm.datetime(2024, 1, 1)
    recs = []
    for i in range(n_recs):
        body = bytes(rng.randrange(256) for _ in range(rng.randint(0, 3000)))
        recs.append((f"https://h{i}.example/p %z\r{i}",
                     ts0 + dtm.timedelta(seconds=i), body))
    buf = io.BytesIO()
    import tempfile

    with tempfile.NamedTemporaryFile(delete=False) as f:
        path = f.name
    write_warc(path, recs, gzip_members=gz)
    data = open(path, "rb").read()
    import os

    os.unlink(path)
    if cut_frac is not None:
        data = data[: int(len(data) * cut_frac)]
    whole = list(parse_warc(data))
    stream = list(iter_warc_stream(io.BytesIO(data), chunk_size=chunk))
    assert stream == whole
