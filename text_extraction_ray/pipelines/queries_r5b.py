"""Round-5 batch B: crawl-container breadth oracles (M44 EPUB, M45
MHTML).

Same value-level discipline as ``queries_r5``: per ``doc_id`` a
deterministic document is BUILT, run through the REAL parser/route, and
the oracle recomputes every expected string in SQL from ``doc_id``.

- ``epub_chapters`` — OCF/OPF e-book packages (container.xml → OPF
  manifest+spine → XHTML chapters through the flagship DOM segmenter):
  per-chapter per-block rows; any drift in the ZIP walk, rootfile/
  spine resolution or block segmentation breaks the hash.
- ``mhtml_pages`` — the SAME planted jusText spec as the in-window
  ``extract_pages_parity``, but physically transported as an MHTML
  archive (cycling quoted-printable / base64 / 7bit CTEs and declared
  vs sniffed charset) and routed through the REAL ``extract_pages``
  actor pool — one planted spec, two physical plans (the skewed-OCR
  pattern): the MIME envelope, CTE decode and root selection must be
  extraction-invisible for the hash to match.

Scale shape: pure ``map_batches`` scans over a pruned single-column
read — zero shuffle (epub) / the flagship actor-pool plan (mhtml).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

_PYA = {"batch_format": "pyarrow", "zero_copy_batch": True}


# --- epub_chapters: value-level OCF/OPF oracle (M44) ----------------------

def _epub_chapters_batch(batch: pa.Table) -> pa.Table:
    from ..core.epub import build_epub, parse_epub

    ids = batch.column("doc_id").to_pylist()
    o_id, o_chap, o_blk, o_text = [], [], [], []
    for i in ids:
        chapters = []
        for s in range(1 + i % 2):
            paras = [f"epub {i}-{s}-{k} & café {(i * 17 + s * 5 + k) % 50}"
                     for k in range(1 + (i + s) % 2)]
            chapters.append((f"Ch {i}-{s}", paras))
        payload = build_epub(chapters, deflate=i % 2 == 0)
        for ci, (_, blocks) in enumerate(parse_epub(payload)):
            for bi, text in enumerate(blocks):
                o_id.append(i)
                o_chap.append(ci)
                o_blk.append(bi)
                o_text.append(text)
    return pa.table({
        "doc_id": pa.array(o_id, type=pa.int64()),
        "chap_idx": pa.array(o_chap, type=pa.int64()),
        "blk_idx": pa.array(o_blk, type=pa.int64()),
        "text": pa.array(o_text, type=pa.string()),
    })


def q_epub_chapters(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_epub_chapters_batch, **_PYA))


SQL_EPUB_CHAPTERS = """
WITH d AS (
  SELECT doc_id, CAST(doc_id % 2 AS BIGINT) + 1 AS ns FROM documents
), s AS (
  SELECT doc_id, unnest(generate_series(0, ns - 1)) AS sl FROM d)
SELECT doc_id, sl AS chap_idx, CAST(0 AS BIGINT) AS blk_idx,
       'Ch ' || doc_id || '-' || sl AS text
FROM s
UNION ALL
SELECT doc_id, sl, 1 + k,
       'epub ' || doc_id || '-' || sl || '-' || k || ' & café '
         || (doc_id * 17 + sl * 5 + k) % 50
FROM s, LATERAL (SELECT unnest(generate_series(
    0, (doc_id + sl) % 2)) AS k) t
"""


# --- mhtml_pages: the flagship parity spec through the MIME envelope ------

_CTES = ("quoted-printable", "base64", "7bit")


def _mhtml_pages_batch(batch: pa.Table) -> pa.Table:
    """doc_id → one PAGES-schema row whose payload is the planted
    parity page WRAPPED as an MHTML archive (CTE + charset cycling)."""
    from ..core.mhtml import build_mhtml
    from .queries_r5 import _PARITY_TS, _parity_page

    ids = batch.column("doc_id").to_pylist()
    return pa.table({
        "url": pa.array([f"https://parity.test/{i}" for i in ids],
                        type=pa.string()),
        "warc_ts": pa.array([_PARITY_TS] * len(ids),
                            type=pa.timestamp("us")),
        "html": pa.array(
            [build_mhtml(_parity_page(i), cte=_CTES[i % 3],
                         charset="utf-8" if i % 2 else "")
             for i in ids], type=pa.binary()),
        "lang": pa.array(["en"] * len(ids), type=pa.string()),
    })


def q_mhtml_pages(sf_dir: str) -> ray.data.Dataset:
    from .extraction import extract_pages
    from .queries import read_table
    from .queries_r5 import _parity_blocks_batch

    pages = (read_table(sf_dir, "documents", ["doc_id"])
             .map_batches(_mhtml_pages_batch, **_PYA))
    return (extract_pages(pages, mode="single_pass")
            .map_batches(_parity_blocks_batch, **_PYA))


def _sql_mhtml_pages() -> str:
    # one planted spec, two physical plans: the archived transport must
    # be extraction-invisible, so the oracle IS the parity template
    from .queries_r5 import SQL_EXTRACT_PAGES_PARITY

    return SQL_EXTRACT_PAGES_PARITY


# --- gzip_pages: the parity spec through the gzip transport (M46) ---------

def _gzip_pages_batch(batch: pa.Table) -> pa.Table:
    """doc_id → one PAGES-schema row whose payload is the planted
    parity page gzip-wrapped (M46); odd ids truncate the stream mid-way
    THROUGH THE TRAILER ONLY (full deflate data, torn CRC/ISIZE) so the
    salvage path decodes the identical page."""
    import zlib

    from .queries_r5 import _PARITY_TS, _parity_page

    ids = batch.column("doc_id").to_pylist()
    payloads = []
    for i in ids:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        gz = co.compress(_parity_page(i)) + co.flush()
        payloads.append(gz[:-4] if i % 2 else gz)  # torn ISIZE on odd ids
    return pa.table({
        "url": pa.array([f"https://parity.test/{i}" for i in ids],
                        type=pa.string()),
        "warc_ts": pa.array([_PARITY_TS] * len(ids),
                            type=pa.timestamp("us")),
        "html": pa.array(payloads, type=pa.binary()),
        "lang": pa.array(["en"] * len(ids), type=pa.string()),
    })


def q_gzip_pages(sf_dir: str) -> ray.data.Dataset:
    from .extraction import extract_pages
    from .queries import read_table
    from .queries_r5 import _parity_blocks_batch

    pages = (read_table(sf_dir, "documents", ["doc_id"])
             .map_batches(_gzip_pages_batch, **_PYA))
    return (extract_pages(pages, mode="single_pass")
            .map_batches(_parity_blocks_batch, **_PYA))


def queries_r5b() -> dict:
    return {"epub_chapters": q_epub_chapters,
            "mhtml_pages": q_mhtml_pages,
            "gzip_pages": q_gzip_pages}


def parity_sql_r5b() -> dict[str, str]:
    return {"epub_chapters": SQL_EPUB_CHAPTERS,
            "mhtml_pages": _sql_mhtml_pages(),
            "gzip_pages": _sql_mhtml_pages()}
