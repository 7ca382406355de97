"""Minimal deterministic PDF writer for synthetic fixtures (SURVEY SS2.3(b)).

The sandbox has no PDF libraries and no external data, so fixture PDFs are
emitted by this writer and parsed by core/pdf.py — the pair is closed under
the subset below (SURVEY SS7 hard part #3):

  - one content stream per page, optionally Flate-compressed
  - text via BT/ET, /F1 Tf, Td positioning, Tj show (ASCII / latin-1 only)
  - ruled tables drawn as thin ``re`` rectangles (the cell grid)
  - classic letter pages, y axis up, top margin at y=720

Page layout model (mirrored by the parser's constants in params.py):
14pt leading inside a paragraph, >=28pt gap between regions, tables as
fully ruled grids, optional two-column pages.
"""

from __future__ import annotations

import zlib

PAGE_W = 612
PAGE_H = 792
TOP_Y = 720.0
LEFT_X = 72.0
LINE_LEADING = 14.0
REGION_GAP = 32.0
CELL_W = 110.0
CELL_H = 18.0


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class PageBuilder:
    """Accumulates content-stream ops for one page, tracking a y cursor."""

    def __init__(self) -> None:
        self.ops: list[str] = []
        self.y = TOP_Y

    def text_lines(self, lines: list[str], x: float = LEFT_X) -> None:
        """A paragraph region: consecutive lines at LINE_LEADING."""
        for line in lines:
            self.ops.append(
                f"BT /F1 11 Tf {x:.1f} {self.y:.1f} Td ({_esc(line)}) Tj ET"
            )
            self.y -= LINE_LEADING
        self.y -= REGION_GAP - LINE_LEADING

    def text_lines_at(self, lines: list[str], x: float, y: float) -> None:
        """Positioned paragraph (used for the second column)."""
        for i, line in enumerate(lines):
            self.ops.append(
                f"BT /F1 11 Tf {x:.1f} {y - i * LINE_LEADING:.1f} Td "
                f"({_esc(line)}) Tj ET"
            )

    def table(self, rows: list[list[str]], x: float = LEFT_X) -> None:
        """Fully ruled cell grid + cell text — the reference's tabular case."""
        n_rows = len(rows)
        n_cols = max(len(r) for r in rows) if rows else 0
        top = self.y
        w = n_cols * CELL_W
        h = n_rows * CELL_H
        # horizontal rulings (n_rows+1), thin rects
        for r in range(n_rows + 1):
            yy = top - r * CELL_H
            self.ops.append(f"{x:.1f} {yy:.1f} {w:.1f} 0.5 re f")
        # vertical rulings (n_cols+1)
        for c in range(n_cols + 1):
            xx = x + c * CELL_W
            self.ops.append(f"{xx:.1f} {top - h:.1f} 0.5 {h:.1f} re f")
        # cell text, baseline 5pt above cell bottom, 3pt right inset
        for r, row in enumerate(rows):
            for c, cell in enumerate(row):
                cx = x + c * CELL_W + 3.0
                cy = top - (r + 1) * CELL_H + 5.0
                self.ops.append(
                    f"BT /F1 10 Tf {cx:.1f} {cy:.1f} Td ({_esc(cell)}) Tj ET"
                )
        self.y = top - h - REGION_GAP

    def content(self) -> bytes:
        return "\n".join(self.ops).encode("latin-1", "replace")


def build_pdf(pages: list[PageBuilder], compress: bool = False) -> bytes:
    """Assemble a complete PDF with xref table and trailer."""
    objects: list[bytes] = []  # 1-indexed object bodies (without N 0 obj wrapper)
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    for i, page in enumerate(pages):
        content_num = 4 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                f"/Contents {content_num} 0 R "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        data = page.content()
        if compress:
            data = zlib.compress(data, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            head = f"<< /Length {len(data)} >>".encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )  # font

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    n_obj = len(objects) + 1
    out += f"xref\n0 {n_obj}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_obj} /Root 1 0 R >>\nstartxref\n{xref_pos}\n"
        "%%EOF\n"
    ).encode()
    return bytes(out)
