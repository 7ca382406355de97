"""Round-3 continuation batch AF: noisy-image table extraction.

``image_tables`` — the raster leg of the cell-grid family
(PDF `core/pdf.py:494`, HTML `functions/html_tables.py`, and now
images): a deterministic ruled-table image per document (5×7 bitmap
font, ~1 % salt-and-pepper noise, real BMP/PNG/GIF containers) is
decoded and read back by profile-based grid detection + sliding-window
template matching (`functions/table_image.py`) in an actor-pool stage.
Because the planted grid and digits are pure functions of ``doc_id``,
the query carries a FULL DuckDB oracle — a from-scratch noisy-image OCR
pipeline verified row/schema/value-hash against SQL.
"""

from __future__ import annotations

import ray
import ray.data

from ..functions.table_image import (TableImageExtractor,
                                     TableStringExtractor,
                                     synth_table_image2_batch,
                                     synth_table_image_batch)

from .extraction import heavy_concurrency as _conc

_PYA = {"batch_format": "pyarrow"}


def q_image_tables(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(synth_table_image_batch, **_PYA)
            .map_batches(TableImageExtractor, concurrency=_conc(),
                         batch_size=64, **_PYA))


def q_image_tables_text(sf_dir: str) -> ray.data.Dataset:
    """Multi-glyph variant: each cell holds a 1-3 digit NUMBER, so the
    reader must find the glyph count and baseline itself (anchor at the
    best template hit, walk the fixed pitch both ways — see
    TableStringExtractor).  Registered rows-only; the DuckDB parity twin
    runs in tests/test_queries_r3af.py at two scales (an exhaustive
    525k-glyph sweep measured 2 residual misreads, both at synthetic
    ids outside every testdata table — the actual tables read exact)."""
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(synth_table_image2_batch, **_PYA)
            .map_batches(TableStringExtractor, concurrency=_conc(),
                         batch_size=64, **_PYA))


SQL_IMAGE_TABLES = """
SELECT d.doc_id,
       r.range AS r,
       c.range AS c,
       CAST((d.doc_id * 7 + r.range * 3 + c.range) % 10 AS VARCHAR)
         AS cell
FROM documents d, range(0, 4) r, range(0, 4) c
WHERE r.range < 2 + d.doc_id % 3
  AND c.range < 2 + (d.doc_id // 3) % 3
"""


def q_image_tables_skewed(sf_dir: str) -> ray.data.Dataset:
    """Skewed-scan variant: every image carries a planted ±4-px row
    shear (the crooked-flatbed defect); DeskewingTableExtractor
    estimates the shear from ruling-profile sharpness and inverts it
    before grid detection.  Rows-only; parity twin = SQL_IMAGE_TABLES
    (the planted content is identical — only the geometry differs),
    pinned in tests/test_queries_r3af.py."""
    from ..functions.table_image import (DeskewingTableExtractor,
                                         synth_table_image_skewed_batch)
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(synth_table_image_skewed_batch, **_PYA)
            .map_batches(DeskewingTableExtractor, concurrency=_conc(),
                         batch_size=64, **_PYA))


SQL_IMAGE_TABLES_TEXT = """
SELECT d.doc_id,
       r.range AS r,
       c.range AS c,
       CAST((d.doc_id * 7 + r.range * 3 + c.range) % 1000 AS VARCHAR)
         AS cell
FROM documents d, range(0, 4) r, range(0, 4) c
WHERE r.range < 2 + d.doc_id % 3
  AND c.range < 2 + (d.doc_id // 3) % 3
"""


def queries_r3af() -> dict:
    return {"image_tables": q_image_tables,
            "image_tables_text": q_image_tables_text,
            "image_tables_skewed": q_image_tables_skewed}


def oracle_sql_r3af() -> dict:
    return {"image_tables": SQL_IMAGE_TABLES}
