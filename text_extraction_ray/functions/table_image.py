"""Noisy-image tabular extraction via cell-grid detection — the raster
counterpart of the PDF (`core/pdf.py:494`) and HTML
(`functions/html_tables.py`) table paths, and the closest echo of the
reference's image-OCR table capability (BASELINE.json north_star:
"noisy-image tabular extraction via cell-grid detection") that a
no-image-libs sandbox permits: every codec and the glyph reader are
from scratch.

Synthesis (``synth_table_image_batch``) renders a ruled table image per
document — grid shape and one digit per cell are pure functions of
``doc_id`` (SQL-expressible, so the extraction query carries a full
DuckDB oracle) — drawn with a built-in 5×7 bitmap font, salted with
deterministic ~1 % salt-and-pepper pixel noise, and encoded through the
real from-scratch containers (BMP / PNG / GIF cycling by id).

Extraction (``TableImageExtractor``, an actor-pool stage) recovers the
table WITHOUT knowing the layout: binarize → ruling lines from
row/column darkness profiles (a ruling row stays >50 % dark under the
noise; interior rows are mostly light) → cell grid from consecutive
ruling pairs → per cell, a sliding-window template match of the 5×7
font over every placement in the cell (min Hamming distance wins) reads
the glyph — segmentation-free, so isolated noise flips cannot break a
bounding box.  State (the font tensor) is built once per actor in
``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .multimodal import (BMP_MEDIA_TYPE, GIF_MEDIA_TYPE, PNG_MEDIA_TYPE,
                         _decode_any, _encode_any)

# --- 5x7 bitmap digit font (from scratch; rows top-down, '#'=ink) -----------

_FONT_ROWS = {
    "0": (" ### ", "#   #", "#  ##", "# # #", "##  #", "#   #", " ### "),
    "1": ("  #  ", " ##  ", "  #  ", "  #  ", "  #  ", "  #  ", " ### "),
    "2": (" ### ", "#   #", "    #", "   # ", "  #  ", " #   ", "#####"),
    "3": (" ### ", "#   #", "    #", "  ## ", "    #", "#   #", " ### "),
    "4": ("   # ", "  ## ", " # # ", "#  # ", "#####", "   # ", "   # "),
    "5": ("#####", "#    ", "#### ", "    #", "    #", "#   #", " ### "),
    "6": (" ### ", "#    ", "#    ", "#### ", "#   #", "#   #", " ### "),
    "7": ("#####", "    #", "   # ", "  #  ", " #   ", " #   ", " #   "),
    "8": (" ### ", "#   #", "#   #", " ### ", "#   #", "#   #", " ### "),
    "9": (" ### ", "#   #", "#   #", " ####", "    #", "    #", " ### "),
}

GLYPH_H, GLYPH_W = 7, 5


def font_tensor() -> np.ndarray:
    """(10, 7, 5) bool — digit d at index d."""
    t = np.zeros((10, GLYPH_H, GLYPH_W), dtype=bool)
    for d in range(10):
        for y, row in enumerate(_FONT_ROWS[str(d)]):
            for x, ch in enumerate(row):
                t[d, y, x] = ch == "#"
    return t


# --- deterministic table spec (mirrored in SQL_IMAGE_TABLES) ----------------

CELL_W, CELL_H = 11, 11          # cell interior, excluding 1-px rulings
MARGIN = 3
_NOISE_MOD = 97                  # ~1% of pixels inverted


def table_shape(doc_id: int) -> tuple[int, int]:
    """(n_rows, n_cols) — 2-4 each, pure function of doc_id."""
    return 2 + doc_id % 3, 2 + (doc_id // 3) % 3


def cell_digit(doc_id: int, r: int, c: int) -> int:
    return (doc_id * 7 + r * 3 + c) % 10


def render_table_image(doc_id: int) -> tuple[int, int, bytes]:
    """(w, h, grayscale bytes) — ruled grid + one digit per cell + noise."""
    n_rows, n_cols = table_shape(doc_id)
    w = 2 * MARGIN + 1 + n_cols * (CELL_W + 1)
    h = 2 * MARGIN + 1 + n_rows * (CELL_H + 1)
    img = np.full((h, w), 255, dtype=np.uint8)
    ys = [MARGIN + k * (CELL_H + 1) for k in range(n_rows + 1)]
    xs = [MARGIN + k * (CELL_W + 1) for k in range(n_cols + 1)]
    for y in ys:
        img[y, xs[0]:xs[-1] + 1] = 0
    for x in xs:
        img[ys[0]:ys[-1] + 1, x] = 0
    font = font_tensor()
    for r in range(n_rows):
        for c in range(n_cols):
            g = font[cell_digit(doc_id, r, c)]
            y0 = ys[r] + 1 + 2
            x0 = xs[c] + 1 + 3
            cell = img[y0:y0 + GLYPH_H, x0:x0 + GLYPH_W]
            cell[g] = 0
    # deterministic salt-and-pepper: invert ~1/_NOISE_MOD of pixels
    k = np.arange(h * w, dtype=np.uint64)
    hsh = ((np.uint64(doc_id % (1 << 32)) * np.uint64(2654435761)
            + k * np.uint64(40503)) >> np.uint64(7)) % np.uint64(_NOISE_MOD)
    flip = (hsh == 0).reshape(h, w)
    img[flip] = 255 - img[flip]
    return w, h, img.tobytes()


def synth_table_image_batch(batch: pa.Table,
                            id_col: str = "doc_id") -> pa.Table:
    """One encoded table image per row, cycling BMP / PNG / GIF by id."""
    ids = batch.column(id_col).to_pylist()
    media, mtype = [], []
    for i in ids:
        w, h, gray = render_table_image(i)
        mt = (BMP_MEDIA_TYPE, PNG_MEDIA_TYPE, GIF_MEDIA_TYPE)[i % 3]
        media.append(_encode_any(mt, w, h, gray))
        mtype.append(mt)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "media": pa.array(media, type=pa.binary()),
        "media_type": pa.array(mtype, type=pa.string()),
    })


# --- extraction -------------------------------------------------------------

def _ruling_lines(frac: np.ndarray, thresh: float = 0.5) -> list[int]:
    """Centers of consecutive runs of profile positions above thresh."""
    on = frac > thresh
    lines, start = [], None
    for i, v in enumerate(on):
        if v and start is None:
            start = i
        elif not v and start is not None:
            lines.append((start + i - 1) // 2)
            start = None
    if start is not None:
        lines.append((start + len(on) - 1) // 2)
    return lines


class TableImageExtractor:
    """Actor-pool stage: (doc_id, media, media_type) → one row per
    detected cell (doc_id, r, c, cell).  Used with::

        ds.map_batches(TableImageExtractor, concurrency=(1, N),
                       batch_size=64, batch_format="pyarrow")
    """

    def __init__(self, match_max_dist: int = 12) -> None:
        self._font = font_tensor()           # once per actor
        self._max_dist = match_max_dist

    def _read_cells(self, cells: np.ndarray) -> list[str]:
        """Best 5×7 template over every placement, for a whole
        (n, ch, cw) stack of same-shape cells in ONE tensor op — a
        per-cell Python dispatch was the hot spot at bench scale."""
        n, ch, cw = cells.shape
        if ch < GLYPH_H or cw < GLYPH_W:
            return [""] * n
        win = np.lib.stride_tricks.sliding_window_view(
            cells, (GLYPH_H, GLYPH_W), axis=(1, 2))  # (n, ph, pw, 7, 5)
        diff = (win[:, :, :, None, :, :]
                != self._font[None, None, None, :, :, :])
        dist = diff.sum(axis=(4, 5)).reshape(n, -1)  # (n, ph*pw*10)
        flat = np.argmin(dist, axis=1)
        best = dist[np.arange(n), flat]
        digit = flat % 10
        return ["" if best[i] > self._max_dist else str(int(digit[i]))
                for i in range(n)]

    def _grid(self, media_type: str, payload: bytes):
        w, h, gray = _decode_any(media_type, payload)
        img = np.frombuffer(gray, dtype=np.uint8)[:w * h].reshape(h, w)
        dark = img < 128
        ys = _ruling_lines(dark.mean(axis=1))
        xs = _ruling_lines(dark.mean(axis=0))
        return dark, ys, xs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        media = batch.column("media").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        o_id, o_r, o_c = [], [], []
        # cells accumulate per shape so each group matches in one op
        groups: dict[tuple[int, int], list[np.ndarray]] = {}
        order: list[tuple[tuple[int, int], int]] = []
        for i, m, mt in zip(ids, media, mtypes):
            dark, ys, xs = self._grid(mt, m)
            for r in range(len(ys) - 1):
                for c in range(len(xs) - 1):
                    cell = dark[ys[r] + 1:ys[r + 1],
                                xs[c] + 1:xs[c + 1]]
                    lst = groups.setdefault(cell.shape, [])
                    order.append((cell.shape, len(lst)))
                    lst.append(cell)
                    o_id.append(i)
                    o_r.append(r)
                    o_c.append(c)
        read = {s: self._read_cells(np.stack(lst))
                for s, lst in groups.items()}
        o_cell = [read[s][j] for s, j in order]
        return pa.table({
            "doc_id": pa.array(o_id, type=pa.int64()),
            "r": pa.array(o_r, type=pa.int64()),
            "c": pa.array(o_c, type=pa.int64()),
            "cell": pa.array(o_cell, type=pa.string()),
        })
