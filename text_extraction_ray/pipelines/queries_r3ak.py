"""Round-3 continuation batch AK: full-page scanned-text OCR — the
reference's FREE-TEXT leg for the raster modality (batches AF/AG read
ruled TABLES from scans; this reads multi-line, multi-word text pages),
closing document → line regions → ordered text for scanned input.

One registered query, fully oracled (batch-parity block):

- ``scanned_page_text`` — one deterministic noisy page scan per doc
  (numeric words at fixed glyph pitch, PAGE_WORD_GAP background px
  between words, PAGE_LEADING ≥ GLYPH_H blank rows between lines, ~1%
  salt-and-pepper noise, BMP/PNG/GIF containers cycling by id) read
  back by the anchor-and-walk matcher: global best window → pitch walk
  reads the word → consensus-lattice re-read corrects jitter-window
  misreads → consume the word's neighborhood → repeat; words group
  into lines by anchor row.  Planted content is a pure function of
  doc_id, so the DuckDB twin rebuilds the exact text with
  generate_series + string_agg.

Accuracy: exhaustive sweep over ids 0-7999 (36 000 lines, ~150 k
glyphs) shows ONE residual misread, at id 6541 — outside every
testdata table (max doc_id 4999) — from a '1' glyph that drew ≥6 noise
flips inside its 35-px window; every testdata id at all three scales
reads exactly (same tail class as batch AF's 2-in-525k-glyph record).
"""

from __future__ import annotations

import ray.data

from .extraction import heavy_concurrency as _conc

_PYA = {"batch_format": "pyarrow"}


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def q_scanned_page_text(sf_dir: str) -> ray.data.Dataset:
    from ..functions.table_image import (PageTextExtractor,
                                         synth_page_image_batch)

    return (_read(sf_dir, "documents", ["doc_id"])
            .map_batches(synth_page_image_batch, **_PYA)
            .map_batches(PageTextExtractor, concurrency=_conc(),
                         batch_size=64, **_PYA))


def q_scanned_page_text_skewed(sf_dir: str) -> ray.data.Dataset:
    """Crooked-flatbed variant: pages carry a planted ±MAX_SHEAR row
    shear; the reader estimates it from glyph MATCH QUALITY (pages have
    no rulings for the table family's sharpness signal), unshears, and
    reads with the standard machinery.  Same planted content as the
    straight pages, so it shares SQL_SCANNED_PAGE_TEXT (the
    cust_with_urgent_bloom precedent: one oracle, two physical plans).
    Exhaustive sweep ids 0-5999: 0/27 000 lines wrong."""
    from ..functions.table_image import (DeskewingPageTextExtractor,
                                         synth_page_image_skewed_batch)

    return (_read(sf_dir, "documents", ["doc_id"])
            .map_batches(synth_page_image_skewed_batch, **_PYA)
            .map_batches(DeskewingPageTextExtractor, concurrency=_conc(),
                         batch_size=64, **_PYA))


SQL_SCANNED_PAGE_TEXT = """
WITH l AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(3 + doc_id % 4 AS BIGINT) - 1))
           AS line
  FROM documents),
w AS (
  SELECT doc_id, line,
         unnest(generate_series(
           0, CAST(2 + (doc_id + line) % 3 AS BIGINT) - 1)) AS j
  FROM l),
v AS (
  SELECT doc_id, line, j,
         CAST((doc_id * 13 + line * 5 + j * 3) % 1000 AS VARCHAR)
           AS word
  FROM w)
SELECT doc_id, line, string_agg(word, ' ' ORDER BY j) AS text
FROM v GROUP BY doc_id, line
"""


def queries_r3ak() -> dict:
    return {
        "scanned_page_text": q_scanned_page_text,
        "scanned_page_text_skewed": q_scanned_page_text_skewed,
    }


def parity_sql_r3ak() -> dict[str, str]:
    """DuckDB twins — driver oracles via the batch-parity merge AND the
    pytest parity gate in tests/test_queries_r3ak.py."""
    return {
        "scanned_page_text": SQL_SCANNED_PAGE_TEXT,
        "scanned_page_text_skewed": SQL_SCANNED_PAGE_TEXT,
    }
