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
table WITHOUT knowing the layout: binarize → three-step grid detection
(extremes from permissive full profiles, per-axis re-profile restricted
to the other axis's extent — true ruling ≈0.99 dark vs ≤0.65 for the
worst glyph-stroke impostor — then uniform-pitch snap that recovers
noise-weakened interior lines; see ``_grid``) → per cell, a
sliding-window template match of the 5×7 font over every placement
(min Hamming distance wins) reads the glyph — segmentation-free, so
isolated noise flips cannot break a bounding box.
``TableStringExtractor`` extends this to multi-glyph cells: anchor at
the globally best hit, then walk the fixed glyph pitch left and right.
State (the font tensor) is built once per actor in ``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .multimodal import (BMP_MEDIA_TYPE, GIF_MEDIA_TYPE, PNG_MEDIA_TYPE,
                         _decode_any, _encode_any)

# --- 5x7 bitmap digit font (from scratch; rows top-down, '#'=ink) -----------

# Margin-optimized: the classic 5×7 set has digit pairs only 3 pixels
# apart (3/8, 6/8, 8/9) — two adversarial noise flips could tip the
# argmin.  This variant (diamond 0, angular 3, diagonal-top 6, tailed 9)
# has min pairwise Hamming distance 6, min shifted-placement distance 5,
# min glyph-straddle distance 6, background distance 10 — so reads
# survive the planted ~1 % salt-and-pepper with wide margin.
_FONT_ROWS = {
    "0": ("  #  ", " # # ", "#   #", "#   #", "#   #", " # # ", "  #  "),
    "1": ("  #  ", " ##  ", "  #  ", "  #  ", "  #  ", "  #  ", " ### "),
    "2": (" ### ", "#   #", "    #", "   # ", "  #  ", " #   ", "#####"),
    "3": ("#### ", "    #", "    #", " ### ", "    #", "    #", "#### "),
    "4": ("   # ", "  ## ", " # # ", "#  # ", "#####", "   # ", "   # "),
    "5": ("#####", "#    ", "#### ", "    #", "    #", "#   #", " ### "),
    "6": ("   # ", "  #  ", " #   ", "#### ", "#   #", "#   #", " ### "),
    "7": ("#####", "    #", "   # ", "  #  ", " #   ", " #   ", " #   "),
    "8": (" ### ", "#   #", "#   #", " ### ", "#   #", "#   #", " ### "),
    "9": (" ### ", "#   #", "#   #", " ####", "    #", "   # ", "  #  "),
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


def _noise_mask(doc_id: int, h: int, w: int) -> np.ndarray:
    """(h, w) bool, ~1/_NOISE_MOD True — splitmix64-finalized per pixel.
    The first version used a single multiply-shift hash whose flips
    STREAKED down columns (consecutive rows differ by w*const, and the
    recurrence survives the >>7), producing 4-in-a-column noise runs
    that defeated any Hamming margin; the finalizer decorrelates."""
    salt = ((doc_id % (1 << 32)) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
    k = np.arange(h * w, dtype=np.uint64) ^ np.uint64(salt)
    k ^= k >> np.uint64(30)
    k *= np.uint64(0xBF58476D1CE4E5B9)
    k ^= k >> np.uint64(27)
    k *= np.uint64(0x94D049BB133111EB)
    k ^= k >> np.uint64(31)
    return (k % np.uint64(_NOISE_MOD) == 0).reshape(h, w)


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
    flip = _noise_mask(doc_id, h, w)
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


def _regular_grid(lines: list[int], min_pitch: int = 8) -> list[int]:
    """Snap detected ruling positions to the uniform grid they imply:
    pitch = smallest plausible gap, line count = span/pitch — this
    RECOVERS an interior ruling whose profile dipped under noise (its
    predicted position is filled in) and is a no-op on a clean set."""
    if len(lines) < 2:
        return lines
    first, last = lines[0], lines[-1]
    gaps = [b - a for a, b in zip(lines, lines[1:]) if b - a >= min_pitch]
    pitch = min(gaps) if gaps else last - first
    k = max(1, round((last - first) / pitch))
    return [first + int(round(j * (last - first) / k))
            for j in range(k + 1)]


# --- multi-digit variant: read a STRING per cell ----------------------------

CELL_W2 = 23                     # fits up to 3 glyphs at pitch 6
_PITCH = GLYPH_W + 1


def cell_value2(doc_id: int, r: int, c: int) -> int:
    return (doc_id * 7 + r * 3 + c) % 1000


def render_table_image2(doc_id: int) -> tuple[int, int, bytes]:
    """Like render_table_image but each cell holds a 1-3 digit NUMBER
    (decimal, no leading zeros) at fixed glyph pitch — the extractor
    must segment glyphs, not just classify one."""
    n_rows, n_cols = table_shape(doc_id)
    w = 2 * MARGIN + 1 + n_cols * (CELL_W2 + 1)
    h = 2 * MARGIN + 1 + n_rows * (CELL_H + 1)
    img = np.full((h, w), 255, dtype=np.uint8)
    ys = [MARGIN + k * (CELL_H + 1) for k in range(n_rows + 1)]
    xs = [MARGIN + k * (CELL_W2 + 1) for k in range(n_cols + 1)]
    for y in ys:
        img[y, xs[0]:xs[-1] + 1] = 0
    for x in xs:
        img[ys[0]:ys[-1] + 1, x] = 0
    font = font_tensor()
    for r in range(n_rows):
        for c in range(n_cols):
            text = str(cell_value2(doc_id, r, c))
            y0 = ys[r] + 1 + 2
            for k, ch in enumerate(text):
                x0 = xs[c] + 1 + 3 + k * _PITCH
                g = font[int(ch)]
                cell = img[y0:y0 + GLYPH_H, x0:x0 + GLYPH_W]
                cell[g] = 0
    flip = _noise_mask(doc_id, h, w)
    img[flip] = 255 - img[flip]
    return w, h, img.tobytes()


def synth_table_image2_batch(batch: pa.Table,
                             id_col: str = "doc_id") -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    media, mtype = [], []
    for i in ids:
        w, h, gray = render_table_image2(i)
        mt = (BMP_MEDIA_TYPE, PNG_MEDIA_TYPE, GIF_MEDIA_TYPE)[i % 3]
        media.append(_encode_any(mt, w, h, gray))
        mtype.append(mt)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "media": pa.array(media, type=pa.binary()),
        "media_type": pa.array(mtype, type=pa.string()),
    })


# --- skewed-scan variant: deskew before grid detection ----------------------

MAX_SHEAR = 4                    # |total horizontal shear| in pixels


def scan_shear(doc_id: int) -> int:
    """Planted shear in [-MAX_SHEAR, +MAX_SHEAR], pure fn of doc_id."""
    return (doc_id * 31 + 7) % (2 * MAX_SHEAR + 1) - MAX_SHEAR


def render_table_image_skewed(doc_id: int) -> tuple[int, int, bytes]:
    """The single-digit table image run through an integer ROW SHEAR
    (row y shifts right by round(s*y/h) px, s = scan_shear(doc_id)) —
    the crooked-flatbed-scan defect, exactly invertible so the oracle
    stays deterministic.  Width grows by |s| to hold the shifted rows."""
    w, h, gray = render_table_image(doc_id)
    img = np.frombuffer(gray, dtype=np.uint8).reshape(h, w)
    s = scan_shear(doc_id)
    out = np.full((h, w + abs(s)), 255, dtype=np.uint8)
    base = abs(s) if s < 0 else 0
    for y in range(h):
        off = base + round(s * y / (h - 1))
        out[y, off:off + w] = img[y]
    return out.shape[1], h, out.tobytes()


def _unshear(dark: np.ndarray, s: int) -> np.ndarray:
    """Invert the render-side row shear for candidate s: row y shifts
    LEFT by the same offset render_table_image_skewed shifted it right;
    the vacated right margin pads light."""
    h, w = dark.shape
    out = np.zeros_like(dark)
    base = abs(s) if s < 0 else 0
    for y in range(h):
        off = base + round(s * y / (h - 1)) if h > 1 else 0
        out[y, :w - off] = dark[y, off:]
    return out


def synth_table_image_skewed_batch(batch: pa.Table,
                                   id_col: str = "doc_id") -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    media, mtype = [], []
    for i in ids:
        w, h, gray = render_table_image_skewed(i)
        mt = (BMP_MEDIA_TYPE, PNG_MEDIA_TYPE, GIF_MEDIA_TYPE)[i % 3]
        media.append(_encode_any(mt, w, h, gray))
        mtype.append(mt)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "media": pa.array(media, type=pa.binary()),
        "media_type": pa.array(mtype, type=pa.string()),
    })


class TableImageExtractor:
    """Actor-pool stage: (doc_id, media, media_type) → one row per
    detected cell (doc_id, r, c, cell).  Used with::

        ds.map_batches(TableImageExtractor, concurrency=(1, N),
                       batch_size=64, batch_format="pyarrow")
    """

    def __init__(self, match_max_dist: int = 12) -> None:
        self._font = font_tensor()           # once per actor
        # each 7×5 template packed into 35 bits (pos = y*5 + x) —
        # window matching is then XOR + popcount on uint64 lattices
        # instead of a 6-D bool-tensor reduction (the former hot spot)
        masks = np.zeros(10, dtype=np.uint64)
        for d in range(10):
            for y in range(GLYPH_H):
                for x in range(GLYPH_W):
                    if self._font[d, y, x]:
                        masks[d] |= np.uint64(1 << (y * GLYPH_W + x))
        self._font_masks = masks
        self._max_dist = match_max_dist

    @staticmethod
    def _pack_windows(stack: np.ndarray) -> np.ndarray:
        """(n, ch, cw) bool → (n, ph, pw) uint64: every 7×5 window's
        pixels packed into one word (35 shifted ORs, all vectorized)."""
        n, ch, cw = stack.shape
        ph, pw = ch - GLYPH_H + 1, cw - GLYPH_W + 1
        bits = np.zeros((n, ph, pw), dtype=np.uint64)
        for dy in range(GLYPH_H):
            for dx in range(GLYPH_W):
                bits |= (stack[:, dy:dy + ph, dx:dx + pw]
                         .astype(np.uint64)
                         << np.uint64(dy * GLYPH_W + dx))
        return bits

    @staticmethod
    def _popcount64(x: np.ndarray) -> np.ndarray:
        """SWAR popcount (numpy 1.x has no bitwise_count)."""
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = ((x & np.uint64(0x3333333333333333))
             + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return ((x * np.uint64(0x0101010101010101))
                >> np.uint64(56)).astype(np.uint8)

    def _dist_tensor(self, stack: np.ndarray) -> np.ndarray:
        """(n, ch, cw) bool cells → (n, ph, pw, 10) Hamming distances."""
        bits = self._pack_windows(stack)
        return self._popcount64(
            bits[:, :, :, None] ^ self._font_masks[None, None, None, :])

    def _read_cells(self, cells: np.ndarray) -> list[str]:
        """Best 5×7 template over every placement, for a whole
        (n, ch, cw) stack of same-shape cells in ONE tensor op — a
        per-cell Python dispatch was the hot spot at bench scale."""
        n, ch, cw = cells.shape
        if ch < GLYPH_H or cw < GLYPH_W:
            return [""] * n
        dist = self._dist_tensor(cells).reshape(n, -1)  # (n, ph*pw*10)
        flat = np.argmin(dist, axis=1)
        best = dist[np.arange(n), flat]
        digit = flat % 10
        return ["" if best[i] > self._max_dist else str(int(digit[i]))
                for i in range(n)]

    def read_table_cells(self, w: int, h: int, gray: bytes
                         ) -> list[tuple[int, int, str]]:
        """One raw grayscale raster → [(row, col, cell_text)] — the
        single-image entry point used by the scanned-PDF route in
        ``core/pdf.py:extract_pdf`` (and anything else holding decoded
        pixels rather than a media container)."""
        dark, ys, xs = self._grid_raw(w, h, gray)
        coords, groups, order = [], {}, []
        for r in range(len(ys) - 1):
            for c in range(len(xs) - 1):
                cell = dark[ys[r] + 1:ys[r + 1], xs[c] + 1:xs[c + 1]]
                lst = groups.setdefault(cell.shape, [])
                order.append((cell.shape, len(lst)))
                lst.append(cell)
                coords.append((r, c))
        read = {s: self._read_cells(np.stack(lst))
                for s, lst in groups.items()}
        return [(r, c, read[s][j])
                for (r, c), (s, j) in zip(coords, order)]

    def _grid(self, media_type: str, payload: bytes):
        """Three-step noise-robust grid detection.

        1. Extremes from permissive full-image profiles (thresh 0.5):
           glyph-stroke impostor columns (a stacked tens-digit '1' can
           mean ~0.6 over the full height) are always strictly INTERIOR,
           so min/max of the candidates are true border rulings even
           when impostors fire.
        2. Re-profile each axis RESTRICTED to the other axis's extent:
           a true ruling is ~0.99 dark there vs ≤ ~0.65 for the worst
           impostor — thresh 0.8 separates with wide margin.
        3. Snap to the implied uniform grid (_regular_grid), recovering
           any interior ruling the noise happened to weaken."""
        w, h, gray = _decode_any(media_type, payload)
        return self._grid_raw(w, h, gray)

    def _grid_raw(self, w: int, h: int, gray: bytes):
        img = np.frombuffer(gray, dtype=np.uint8)[:w * h].reshape(h, w)
        return self._grid_from_dark(img < 128)

    def _grid_from_dark(self, dark: np.ndarray):
        rcand = _ruling_lines(dark.mean(axis=1))
        ccand = _ruling_lines(dark.mean(axis=0))
        if len(rcand) < 2 or len(ccand) < 2:
            return dark, rcand, ccand
        y0, y1 = rcand[0], rcand[-1]
        x0, x1 = ccand[0], ccand[-1]
        xs = _regular_grid(_ruling_lines(
            dark[y0:y1 + 1, :].mean(axis=0), 0.8))
        ys = _regular_grid(_ruling_lines(
            dark[:, x0:x1 + 1].mean(axis=1), 0.8))
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


class TableStringExtractor(TableImageExtractor):
    """Reads a multi-glyph STRING per cell: glyph count and left edge
    are inferred from the cell's ink-column span (columns with ≥2 dark
    pixels — single noise flips can't register), each glyph window is
    matched with ±1-column jitter tolerance (a trimmed 1-ink-pixel edge
    column, e.g. '7''s left edge, shifts the anchor; the slide absorbs
    it).  Same actor-pool shape as the single-glyph extractor."""

    # ≤5 mismatches accepts a glyph at a pitch slot: misses need ≥6
    # noise flips inside one 35-px window (P≈6e-7/glyph), false extras
    # need ≥5 targeted flips in a background slot (P≈3e-8/slot) — both
    # tails vanish at any realistic corpus size; 4 rejected real glyphs
    # that drew 5 flips (~2e-5/glyph, observed in the 20k-id sweep)
    _CHAR_ACCEPT = 5

    def _read_string(self, cell: np.ndarray) -> str:
        ch, cw = cell.shape
        if ch < GLYPH_H or cw < GLYPH_W:
            return ""
        return self._read_string_from(self._dist_tensor(cell[None])[0])

    def _read_string_from(self, dist: np.ndarray) -> str:
        """Anchor at the globally best template hit, then walk LEFT and
        RIGHT at the fixed glyph pitch (±1-pixel jitter per probe):
        digits are contiguous, background slots measure ≥10 mismatches
        (font margin), so the walk stops exactly at the number's edges.
        No ink-span detection anywhere — a noise speck outside the
        glyphs cannot shift an anchor the way it shifted the earlier
        span-based segmentation.  ``dist`` is the (ph, pw, 10) Hamming
        tensor — batched per shape group in __call__ so the expensive
        window compare runs as ONE tensor op per group."""
        dmin = dist.min(axis=2)
        ph, pw = dmin.shape
        y0, x0 = np.unravel_index(int(np.argmin(dmin)), dmin.shape)
        if dmin[y0, x0] > self._CHAR_ACCEPT:
            return ""

        def probe(x: int) -> tuple[int, int]:
            best, dig = 99, -1
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yy, xx = y0 + dy, x + dx
                    if 0 <= yy < ph and 0 <= xx < pw:
                        d = int(dist[yy, xx].min())
                        if d < best:
                            best, dig = d, int(dist[yy, xx].argmin())
            return best, dig

        out = {}
        k = 0
        while True:
            b, dg = probe(x0 + k * _PITCH)
            if b > self._CHAR_ACCEPT:
                break
            out[k] = dg
            k += 1
        k = -1
        while True:
            b, dg = probe(x0 + k * _PITCH)
            if b > self._CHAR_ACCEPT:
                break
            out[k] = dg
            k -= 1
        return "".join(str(out[k]) for k in sorted(out))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        media = batch.column("media").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        o_id, o_r, o_c = [], [], []
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
        read: dict[tuple[int, int], list[str]] = {}
        for shape, lst in groups.items():
            ch, cw = shape
            if ch < GLYPH_H or cw < GLYPH_W:
                read[shape] = [""] * len(lst)
                continue
            dist = self._dist_tensor(np.stack(lst))  # (n, ph, pw, 10)
            read[shape] = [self._read_string_from(dist[j])
                           for j in range(len(lst))]
        return pa.table({
            "doc_id": pa.array(o_id, type=pa.int64()),
            "r": pa.array(o_r, type=pa.int64()),
            "c": pa.array(o_c, type=pa.int64()),
            "cell": pa.array([read[s][j] for s, j in order],
                             type=pa.string()),
        })


class DeskewingTableExtractor(TableImageExtractor):
    """Skew-tolerant variant: before grid detection, estimate the scan's
    horizontal shear by trying every candidate in ±MAX_SHEAR and keeping
    the one whose UNSHEARED image has the sharpest vertical-ruling peak
    (a truly vertical 1-px ruling concentrates its full extent in one
    column ≈0.85 mean; off by one shear it spreads over several columns
    ≈0.4).  Candidates are visited in |s| order and only a strictly
    better score switches, so the smallest consistent shear wins ties.
    2·MAX_SHEAR+1 cheap profile passes — no rotation resampling, exact
    inversion, deterministic."""

    def _grid_raw(self, w: int, h: int, gray: bytes):
        img = np.frombuffer(gray, dtype=np.uint8)[:w * h].reshape(h, w)
        dark = img < 128
        best_s, best_score, best_dark = 0, -1.0, dark
        for s in sorted(range(-MAX_SHEAR, MAX_SHEAR + 1), key=abs):
            un = _unshear(dark, s) if s else dark
            score = float(un.mean(axis=0).max())
            if score > best_score + 1e-9:
                best_s, best_score, best_dark = s, score, un
        self.last_shear = best_s          # introspection for tests
        return self._grid_from_dark(best_dark)


# --- full-page scanned-text OCR (round 3 batch AK) --------------------------
# The reference's free-text leg for the raster modality: a scanned PAGE
# of numeric words (multiple lines, multiple words per line) is read
# back line-by-line — document → line regions → ordered text — with the
# same bit-packed matcher the table family uses.  The planted content is
# a pure function of doc_id (mirrored in SQL_SCANNED_PAGE_TEXT), so the
# query is fully oracled.

PAGE_LEADING = 7                 # blank rows between lines; >= GLYPH_H so
                                 # no match window can straddle two lines
PAGE_WORD_GAP = 8                # background px between words (> _PITCH+1
                                 # so the pitch walk can never bridge it)


def page_lines(doc_id: int) -> int:
    return 3 + doc_id % 4


def page_line_words(doc_id: int, line: int) -> int:
    return 2 + (doc_id + line) % 3


def page_word_value(doc_id: int, line: int, j: int) -> int:
    return (doc_id * 13 + line * 5 + j * 3) % 1000


def page_line_text(doc_id: int, line: int) -> str:
    return " ".join(str(page_word_value(doc_id, line, j))
                    for j in range(page_line_words(doc_id, line)))


def render_page_image(doc_id: int) -> tuple[int, int, bytes]:
    """(w, h, grayscale bytes) — numeric words at fixed glyph pitch,
    PAGE_WORD_GAP background px between words, PAGE_LEADING blank rows
    between lines, ~1% salt-and-pepper noise."""
    font = font_tensor()
    lines = [page_line_text(doc_id, line)
             for line in range(page_lines(doc_id))]

    def line_width(text: str) -> int:
        wpx = 0
        for k, word in enumerate(text.split(" ")):
            if k:
                wpx += PAGE_WORD_GAP
            wpx += len(word) * _PITCH - (_PITCH - GLYPH_W)
        return wpx

    w = 2 * MARGIN + max(line_width(t) for t in lines)
    h = 2 * MARGIN + (len(lines) * GLYPH_H
                      + (len(lines) - 1) * PAGE_LEADING)
    img = np.full((h, w), 255, dtype=np.uint8)
    for line, text in enumerate(lines):
        y0 = MARGIN + line * (GLYPH_H + PAGE_LEADING)
        x = MARGIN
        for k, word in enumerate(text.split(" ")):
            if k:
                x += PAGE_WORD_GAP
            for ch in word:
                g = font[int(ch)]
                cell = img[y0:y0 + GLYPH_H, x:x + GLYPH_W]
                cell[g] = 0
                x += _PITCH
            x -= (_PITCH - GLYPH_W)
    flip = _noise_mask(doc_id, h, w)
    img[flip] = 255 - img[flip]
    return w, h, img.tobytes()


def synth_page_image_batch(batch: pa.Table,
                           id_col: str = "doc_id") -> pa.Table:
    """One encoded page scan per row, cycling BMP / PNG / GIF by id."""
    ids = batch.column(id_col).to_pylist()
    media, mtype = [], []
    for i in ids:
        w, h, gray = render_page_image(i)
        mt = (BMP_MEDIA_TYPE, PNG_MEDIA_TYPE, GIF_MEDIA_TYPE)[i % 3]
        media.append(_encode_any(mt, w, h, gray))
        mtype.append(mt)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "media": pa.array(media, type=pa.binary()),
        "media_type": pa.array(mtype, type=pa.string()),
    })


class PageTextExtractor(TableStringExtractor):
    """Actor-pool stage: (doc_id, media, media_type) → one row per
    detected text line (doc_id, line, text).

    No projection-profile heuristics anywhere: at ~1% noise a row
    projection over a 200-px-wide page sees 2 dark pixels per BLANK row
    in expectation, so ink-count line segmentation is hopeless.  Instead
    the proven anchor-and-walk reader runs repeatedly over the page's
    Hamming dist tensor: take the GLOBAL best window (a true glyph —
    false anchors need ≥5 targeted flips in one 35-px window,
    P≈3e-8/slot), walk the fixed glyph pitch to read its whole word,
    CONSUME the word's neighborhood (±(GLYPH_H−1) rows ×
    ±(_PITCH+1) cols — covers every straddle window between its glyphs
    and into its word gaps; PAGE_LEADING ≥ GLYPH_H means no window can
    mix two lines), and repeat until no window passes.  Words then
    group into lines by anchor row and order by x."""

    def _read_page(self, dist: np.ndarray) -> list[str]:
        # the reader only ever reduces dist over the digit axis, so
        # (min, argmin) are precomputed ONCE: the per-word full-page
        # re-reduction and the tens of thousands of 10-element slice
        # mins were the bench hot spot; consumed regions poison dmin
        # directly (argmin there is never read — every darg read is
        # gated on dmin <= _CHAR_ACCEPT)
        dmin = dist.min(axis=2).astype(np.int16)
        darg = dist.argmin(axis=2)
        ph, pw = dmin.shape
        words: list[tuple[int, int, str]] = []       # (y, x_first, text)
        while True:
            y0, x0 = np.unravel_index(int(np.argmin(dmin)), dmin.shape)
            if dmin[y0, x0] > self._CHAR_ACCEPT:
                break

            def probe(x: int) -> tuple[int, int, int, int]:
                best, dig, by, bx = 99, -1, y0, x
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        yy, xx = y0 + dy, x + dx
                        if 0 <= yy < ph and 0 <= xx < pw:
                            d = int(dmin[yy, xx])
                            if d < best:
                                best, dig, by, bx = d, int(
                                    darg[yy, xx]), yy, xx
                return best, dig, by, bx

            got, hits = {}, {}
            edges = [x0, x0]
            for step in (1, -1):
                k = step if step == 1 else -1
                if step == 1:
                    got[0] = int(darg[y0, x0])
                    hits[0] = (y0, x0)
                while True:
                    b, dg, by, bx = probe(x0 + k * _PITCH)
                    if b > self._CHAR_ACCEPT:
                        break
                    got[k] = dg
                    hits[k] = (by, bx)
                    edges[0 if step == -1 else 1] = bx
                    k += step
            # consensus-lattice re-read: a noisy slot can win at a ±1
            # jittered window and misread (observed 1/150k glyphs);
            # the word's glyphs sit on an exact pitch lattice, so take
            # the median per-slot offset and re-decide each digit at
            # its lattice window when that window itself passes
            ks = sorted(got)
            dy_off = int(np.median([hits[k][0] - y0 for k in ks]))
            dx_off = int(np.median([hits[k][1] - (x0 + k * _PITCH)
                                    for k in ks]))
            for k in ks:
                yy = y0 + dy_off
                xx = x0 + k * _PITCH + dx_off
                if 0 <= yy < ph and 0 <= xx < pw and \
                        int(dmin[yy, xx]) <= self._CHAR_ACCEPT:
                    got[k] = int(darg[yy, xx])
            text = "".join(str(got[k]) for k in sorted(got))
            x_lo, x_hi = min(edges), max(edges)
            words.append((int(y0), x_lo, text))
            dmin[max(0, y0 - GLYPH_H + 1):y0 + GLYPH_H,
                 max(0, x_lo - _PITCH - 1):x_hi + _PITCH + 2] = 99
        lines: dict[int, list[tuple[int, str]]] = {}
        for y, x, text in sorted(words):
            row = next((ly for ly in lines if abs(ly - y) <= 1), y)
            lines.setdefault(row, []).append((x, text))
        return [" ".join(t for _, t in sorted(ws))
                for _, ws in sorted(lines.items())]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        media = batch.column("media").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        o_id, o_line, o_text = [], [], []
        groups: dict[tuple[int, int], list] = {}
        for i, m, mt in zip(ids, media, mtypes):
            w, h, gray = _decode_any(mt, m)
            dark = (np.frombuffer(gray, dtype=np.uint8)[:w * h]
                    .reshape(h, w) < 128)
            groups.setdefault(dark.shape, []).append((i, dark))
        for shape, members in groups.items():
            stack = np.stack([d for _, d in members])
            dists = self._dist_tensor(stack)
            for (i, _), dist in zip(members, dists):
                for line, text in enumerate(self._read_page(dist)):
                    o_id.append(i)
                    o_line.append(line)
                    o_text.append(text)
        return pa.table({
            "doc_id": pa.array(o_id, type=pa.int64()),
            "line": pa.array(o_line, type=pa.int64()),
            "text": pa.array(o_text, type=pa.string()),
        })


# --- skewed free-text page scans (round 3 batch AK+) ------------------------

def render_page_image_skewed(doc_id: int) -> tuple[int, int, bytes]:
    """The free-text page scan run through the same integer ROW SHEAR
    as the skewed tables (s = scan_shear(doc_id)), exactly invertible."""
    w, h, gray = render_page_image(doc_id)
    img = np.frombuffer(gray, dtype=np.uint8).reshape(h, w)
    s = scan_shear(doc_id)
    out = np.full((h, w + abs(s)), 255, dtype=np.uint8)
    base = abs(s) if s < 0 else 0
    for y in range(h):
        off = base + round(s * y / (h - 1))
        out[y, off:off + w] = img[y]
    return out.shape[1], h, out.tobytes()


def synth_page_image_skewed_batch(batch: pa.Table,
                                  id_col: str = "doc_id") -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    media, mtype = [], []
    for i in ids:
        w, h, gray = render_page_image_skewed(i)
        mt = (BMP_MEDIA_TYPE, PNG_MEDIA_TYPE, GIF_MEDIA_TYPE)[i % 3]
        media.append(_encode_any(mt, w, h, gray))
        mtype.append(mt)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "media": pa.array(media, type=pa.binary()),
        "media_type": pa.array(mtype, type=pa.string()),
    })


class DeskewingPageTextExtractor(PageTextExtractor):
    """Skew-tolerant page reader.  A free-text page has NO rulings, so
    the table family's sharpest-vertical-ruling deskew signal does not
    exist; the page's own GLYPH MATCH QUALITY is the signal instead: for
    each candidate shear in ±MAX_SHEAR (|s| order), unshear and sum
    (ACCEPT+1 − d) over all match windows within _CHAR_ACCEPT.  A raw
    anchor COUNT is too blunt (row offsets round(s·y/(h−1)) coincide
    across neighboring shears for many rows, so wrong shears keep most
    anchors and occasionally out-count the truth, misreading glyph
    edges — observed 22/4500 lines); the quality sum drops whenever ANY
    glyph row is misaligned, so the shear that restores every glyph row
    wins even when several shears are count-tied.  Switching requires
    beating the incumbent by _SHEAR_MARGIN (smallest consistent |s|
    otherwise): shears that restore every glyph row score within ±1-2
    of each other (noise pixels drifting across window edges), while a
    shear that damages even one glyph loses far more — without the
    margin, a noise-lucky +1 at a damaging shear misread 1/27000 lines
    (doc 4263: q 322 at s=-4 vs 321 at the true s=0).
    Naively that is 2·MAX_SHEAR+1 full dist-tensor passes; instead the
    Hamming distance is decomposed PER GLYPH ROW (disjoint 5-bit groups
    of the 35-bit window ⇒ dist = Σ_dy rowdist(dy)).  Because the shear
    only shifts whole pixel ROWS horizontally, the per-row distances are
    shear-invariant up to a column offset: pack every row's 5-px windows
    once on the zero-padded ORIGINAL page, gather a (32, 10, 7) popcount
    table into RD[y, x, digit, dy], and each candidate shear's full dist
    tensor is then just 7 offset-banded uint8 adds — byte-identical to
    the per-shear ``_dist_tensor(_unshear(...))`` result (pinned by
    test) at ~4× less work, and the winning shear's tensor is already
    materialized.  The zero right-pad of width MAX_SHEAR makes the
    gathered row windows agree exactly with ``_unshear``'s light-padded
    rows for every offset."""

    _SHEAR_MARGIN = 4
    _SHEARS = tuple(sorted(range(-MAX_SHEAR, MAX_SHEAR + 1), key=abs))

    def __init__(self, match_max_dist: int = 12) -> None:
        super().__init__(match_max_dist)
        # P[v, digit, dy] = popcount(v ^ row dy of digit's 5-bit mask)
        P = np.zeros((1 << GLYPH_W, 10, GLYPH_H), dtype=np.uint8)
        for d in range(10):
            for dy in range(GLYPH_H):
                mrow = (int(self._font_masks[d]) >> (dy * GLYPH_W)) & 31
                for v in range(1 << GLYPH_W):
                    P[v, d, dy] = bin(v ^ mrow).count("1")
        self._row_dist_table = P

    def _page_dists_all_shears(self, dark: np.ndarray) -> np.ndarray:
        """(h, w) bool page → (n_shears, ph, pw, 10) uint8: the exact
        dist tensor of ``_unshear(dark, s)`` for every candidate s, in
        ``_SHEARS`` order, via the row decomposition above."""
        h, w = dark.shape
        ph, pw = h - GLYPH_H + 1, w - GLYPH_W + 1
        pad = np.zeros((h, w + MAX_SHEAR), dtype=bool)
        pad[:, :w] = dark
        pwp = pad.shape[1] - GLYPH_W + 1
        rb = np.zeros((h, pwp), dtype=np.uint8)
        for dx in range(GLYPH_W):
            rb |= pad[:, dx:dx + pwp].astype(np.uint8) << dx
        RD = self._row_dist_table[rb]          # (h, pwp, 10, GLYPH_H)
        out = np.empty((len(self._SHEARS), ph, pw, 10), dtype=np.uint8)
        for k, s in enumerate(self._SHEARS):
            base = abs(s) if s < 0 else 0
            ov = np.array([base + round(s * y / (h - 1)) if h > 1 else 0
                           for y in range(h)])
            acc = np.zeros((ph, pw, 10), dtype=np.uint8)
            for dy in range(GLYPH_H):
                o_rows = ov[dy:dy + ph]
                # contiguous bands of equal offset → one sliced add each
                cuts = np.flatnonzero(np.diff(o_rows)) + 1
                a = 0
                for b in list(cuts) + [ph]:
                    o = int(o_rows[a])
                    acc[a:b] += RD[dy + a:dy + b, o:o + pw, :, dy]
                    a = b
            out[k] = acc
        return out

    def _page_dist(self, dark: np.ndarray) -> np.ndarray:
        dists = self._page_dists_all_shears(dark)
        dmin = dists.min(axis=3).astype(np.int16)
        best_s, best_q, best_k = 0, -1, -1
        for k, s in enumerate(self._SHEARS):
            dm = dmin[k]
            m = dm <= self._CHAR_ACCEPT
            q = int(((self._CHAR_ACCEPT + 1) - dm[m]).sum())
            if q > best_q + (self._SHEAR_MARGIN if best_k >= 0 else 0):
                best_s, best_q, best_k = s, q, k
        self.last_shear = best_s          # introspection for tests
        return dists[best_k]

    def _page_dist_reference(self, dark: np.ndarray) -> np.ndarray:
        """The direct per-shear formulation (unshear + full dist-tensor
        pass per candidate) — kept as the oracle the fast path is pinned
        against in test_table_image."""
        best_s, best_q, best_dist = 0, -1, None
        for s in self._SHEARS:
            un = _unshear(dark, s) if s else dark
            dist = self._dist_tensor(un[None])[0]
            dmin = dist.min(axis=2)
            m = dmin <= self._CHAR_ACCEPT
            q = int(((self._CHAR_ACCEPT + 1) - dmin[m]).sum())
            if q > best_q + (self._SHEAR_MARGIN if best_dist is not None
                             else 0):
                best_s, best_q, best_dist = s, q, dist
        self.last_shear = best_s
        return best_dist

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        media = batch.column("media").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        o_id, o_line, o_text = [], [], []
        for i, m, mt in zip(ids, media, mtypes):
            w, h, gray = _decode_any(mt, m)
            dark = (np.frombuffer(gray, dtype=np.uint8)[:w * h]
                    .reshape(h, w) < 128)
            dist = self._page_dist(dark)
            for line, text in enumerate(self._read_page(dist)):
                o_id.append(i)
                o_line.append(line)
                o_text.append(text)
        return pa.table({
            "doc_id": pa.array(o_id, type=pa.int64()),
            "line": pa.array(o_line, type=pa.int64()),
            "text": pa.array(o_text, type=pa.string()),
        })
