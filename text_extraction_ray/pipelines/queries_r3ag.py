"""Round-3 continuation batch AG: scanned-PDF table OCR — the complete
reference loop in one pipeline.

The reference repo's core workflow is "PDF/image of a table → OCR →
cells".  Batch AF built the image half; this batch closes the loop
through the PDF container: every document gets a 'scanned' PDF whose
page is an embedded /XObject /Image (8-bit /DeviceGray, /FlateDecode —
`core/pdf_write.py:build_image_pdf`) of its noisy ruled-table raster;
the reader stage parses the PDF (`core/pdf.py:pdf_images` — /Length
sliced, Flate inflated), recovers the grid and reads the digits with
the batch-AF matcher.  Planted content is the SAME doc_id function as
``image_tables``, so the DuckDB parity twin is shared
(SQL_IMAGE_TABLES); registered rows-only (the oracled window is full),
pinned at two scales in tests/test_queries_r3ag.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.table_image import TableImageExtractor, render_table_image

from .extraction import heavy_concurrency as _conc

_PYA = {"batch_format": "pyarrow"}


def synth_scanned_pdf_batch(batch: pa.Table,
                            id_col: str = "doc_id") -> pa.Table:
    """One single-page scanned PDF per row, the table raster embedded
    as a grayscale image XObject cycling Flate / baseline-JPEG /
    progressive-JPEG compression by doc_id (round 4: real scanned PDFs
    are DCT-compressed; the oracle is unchanged because near-lossless
    JPEG keeps the binarized OCR read exact)."""
    from ..core.pdf_write import build_image_pdf

    ids = batch.column(id_col).to_pylist()
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "pdf": pa.array(
            [build_image_pdf(
                [render_table_image(i)],
                image_filter=("flate", "dct", "dct-prog")[i % 3])
             for i in ids], type=pa.binary()),
    })


class ScannedPdfTableReader(TableImageExtractor):
    """Actor-pool stage: (doc_id, pdf) → (doc_id, page, r, c, cell).

    PDF parse → embedded image extract → grid detect → template read,
    all per batch; the font tensor is actor state via the parent's
    ``__init__``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.pdf import pdf_images

        ids = batch.column("doc_id").to_pylist()
        pdfs = batch.column("pdf").to_pylist()
        o_id, o_pg, o_r, o_c, cells, order = [], [], [], [], {}, []
        for i, payload in zip(ids, pdfs):
            for pg, (w, h, gray) in enumerate(pdf_images(payload)):
                dark, ys, xs = self._grid_raw(w, h, gray)
                for r in range(len(ys) - 1):
                    for c in range(len(xs) - 1):
                        cell = dark[ys[r] + 1:ys[r + 1],
                                    xs[c] + 1:xs[c + 1]]
                        lst = cells.setdefault(cell.shape, [])
                        order.append((cell.shape, len(lst)))
                        lst.append(cell)
                        o_id.append(i)
                        o_pg.append(pg)
                        o_r.append(r)
                        o_c.append(c)
        read = {s: self._read_cells(np.stack(lst))
                for s, lst in cells.items()}
        return pa.table({
            "doc_id": pa.array(o_id, type=pa.int64()),
            "page": pa.array(o_pg, type=pa.int64()),
            "r": pa.array(o_r, type=pa.int64()),
            "c": pa.array(o_c, type=pa.int64()),
            "cell": pa.array([read[s][j] for s, j in order],
                             type=pa.string()),
        })


def q_scanned_pdf_tables(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(synth_scanned_pdf_batch, **_PYA)
            .map_batches(ScannedPdfTableReader, concurrency=_conc(),
                         batch_size=64, **_PYA))


SQL_SCANNED_PDF_TABLES = """
SELECT d.doc_id,
       0 AS page,
       r.range AS r,
       c.range AS c,
       CAST((d.doc_id * 7 + r.range * 3 + c.range) % 10 AS VARCHAR)
         AS cell
FROM documents d, range(0, 4) r, range(0, 4) c
WHERE r.range < 2 + d.doc_id % 3
  AND c.range < 2 + (d.doc_id // 3) % 3
"""


def queries_r3ag() -> dict:
    return {"scanned_pdf_tables": q_scanned_pdf_tables}
