"""Property tests for the page-OCR reader: exact recovery of ARBITRARY
word layouts (not just the planted doc_id spec), straight and under
every integer shear — decoupling the reader's correctness claim from
the synthetic corpus generator."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.functions.table_image import (
    _PITCH, GLYPH_H, GLYPH_W, MARGIN, MAX_SHEAR, PAGE_LEADING,
    PAGE_WORD_GAP, DeskewingPageTextExtractor, PageTextExtractor,
    font_tensor)

_FONT = font_tensor()

_lines_strategy = st.lists(
    st.lists(st.integers(min_value=0, max_value=999),
             min_size=1, max_size=4),
    min_size=1, max_size=4)


def _render(lines: list[list[int]]) -> np.ndarray:
    """Replicate render_page_image's geometry for arbitrary content
    (noise-free bool image)."""
    texts = [" ".join(str(v) for v in ws) for ws in lines]

    def line_width(text: str) -> int:
        wpx = 0
        for k, word in enumerate(text.split(" ")):
            if k:
                wpx += PAGE_WORD_GAP
            wpx += len(word) * _PITCH - (_PITCH - GLYPH_W)
        return wpx

    w = 2 * MARGIN + max(line_width(t) for t in texts)
    h = 2 * MARGIN + (len(texts) * GLYPH_H
                      + (len(texts) - 1) * PAGE_LEADING)
    dark = np.zeros((h, w), dtype=bool)
    for line, text in enumerate(texts):
        y0 = MARGIN + line * (GLYPH_H + PAGE_LEADING)
        x = MARGIN
        for k, word in enumerate(text.split(" ")):
            if k:
                x += PAGE_WORD_GAP
            for ch in word:
                dark[y0:y0 + GLYPH_H, x:x + GLYPH_W] |= _FONT[int(ch)]
                x += _PITCH
            x -= (_PITCH - GLYPH_W)
    return dark


@given(_lines_strategy)
@settings(max_examples=120, deadline=None)
def test_reader_recovers_arbitrary_layouts(lines):
    ex = PageTextExtractor()
    dark = _render(lines)
    got = ex._read_page(ex._dist_tensor(dark[None])[0])
    assert got == [" ".join(str(v) for v in ws) for ws in lines]


@given(_lines_strategy,
       st.integers(min_value=-MAX_SHEAR, max_value=MAX_SHEAR))
@settings(max_examples=120, deadline=None)
def test_deskewing_reader_recovers_under_every_shear(lines, s):
    ex = DeskewingPageTextExtractor()
    dark = _render(lines)
    h, w = dark.shape
    sk = np.zeros((h, w + abs(s)), dtype=bool)
    base = abs(s) if s < 0 else 0
    for y in range(h):
        off = base + round(s * y / (h - 1)) if h > 1 else 0
        sk[y, off:off + w] = dark[y]
    got = ex._read_page(ex._page_dist(sk))
    assert got == [" ".join(str(v) for v in ws) for ws in lines]


@given(_lines_strategy,
       st.integers(min_value=-MAX_SHEAR, max_value=MAX_SHEAR),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=80, deadline=None)
def test_fast_page_dist_matches_reference(lines, s, seed):
    """The row-decomposed deskew scorer is byte-identical to the direct
    per-shear unshear+dist-tensor formulation — same winning shear, same
    returned dist tensor — including under ~1.5% salt-and-pepper noise
    (noise is what makes the margin rule's tie-breaking observable)."""
    ex = DeskewingPageTextExtractor()
    dark = _render(lines)
    h, w = dark.shape
    sk = np.zeros((h, w + abs(s)), dtype=bool)
    base = abs(s) if s < 0 else 0
    for y in range(h):
        off = base + round(s * y / (h - 1)) if h > 1 else 0
        sk[y, off:off + w] = dark[y]
    rng = np.random.default_rng(seed)
    sk = sk ^ (rng.random(sk.shape) < 0.015)
    fast = ex._page_dist(sk)
    fast_shear = ex.last_shear
    ref = ex._page_dist_reference(sk)
    assert fast_shear == ex.last_shear
    assert np.array_equal(fast, ref)
