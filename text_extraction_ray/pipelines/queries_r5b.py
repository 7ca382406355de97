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


# --- tar_source_stats: value-level ustar source oracle (S22) --------------

def _tar_fixture(sf_dir: str) -> list[str]:
    """Deterministic tar shards derived from the documents ids: member
    ``docs/<id>.txt`` with mtime ``1.7e9 + id`` and a body whose length
    is a pure id function — stamped idempotent under /tmp."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from ..sources.tar import write_tar

    ids = sorted(pq.read_table(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
                 .column("doc_id").to_pylist())
    root = os.path.join(tempfile.gettempdir(),
                        f"tx_tar_fixture_{len(ids)}")
    names = [os.path.join(root, f"shard-{k}.tar" + (".gz" if k % 2
                                                    else ""))
             for k in range(4)]
    stamp = os.path.join(root, "_STAMP")
    want = f"v1 n={len(ids)}"
    if os.path.exists(stamp):
        with open(stamp) as fh:
            if fh.read() == want and all(os.path.exists(p)
                                         for p in names):
                return names
    os.makedirs(root, exist_ok=True)
    for k, path in enumerate(names):
        members = [(f"docs/{i:08d}.txt", 1_700_000_000 + i,
                    (f"d{i:08d}e" * (1 + i % 3)).encode())
                   for i in ids if i % 4 == k]
        with open(path + ".tmp", "wb") as fh:
            fh.write(write_tar(members, gzip_out=k % 2 == 1))
        os.replace(path + ".tmp", path)
    with open(stamp, "w") as fh:
        fh.write(want)
    return names


def q_tar_source_stats(sf_dir: str) -> ray.data.Dataset:
    """Read the tar shards back through the PAGES-schema source and
    re-derive (doc_id, n_bytes, mtime_s) per member — name/mtime/body
    plumbing all inside the driver's hash."""
    import pyarrow.compute as pc

    from ..sources.tar import read_tar_pages

    paths = _tar_fixture(sf_dir)

    def stats(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        ids = [int(u.rsplit("/", 1)[1].split(".")[0]) for u in urls]
        epoch = pc.divide(pc.cast(b.column("warc_ts"), pa.int64()),
                          1_000_000)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_bytes": pc.cast(pc.binary_length(b.column("html")),
                               pa.int64()),
            "mtime_s": pc.cast(epoch, pa.int64()),
        })

    return read_tar_pages(paths).map_batches(stats, **_PYA)


SQL_TAR_SOURCE_STATS = """
SELECT doc_id,
       CAST(10 * (1 + doc_id % 3) AS BIGINT) AS n_bytes,
       CAST(1700000000 + doc_id AS BIGINT) AS mtime_s
FROM documents
"""


# --- ods_cells / odp_paragraphs: value-level ODF oracles (M47/M48) --------

def _ods_cells_batch(batch: pa.Table) -> pa.Table:
    from ..core.docx import zip_read
    from ..core.ods_odp import build_ods, parse_ods

    ids = batch.column("doc_id").to_pylist()
    o_id, o_sheet, o_row, o_col, o_val, o_kind = [], [], [], [], [], []
    for i in ids:
        nr = 2 + i % 2
        rows: list[list[object]] = [
            [f"v {i}-{r}", (i * 31 + r) % 97 - 40,
             float((i * 7 + r) % 50) + 0.5, bool((i + r) % 2)]
            for r in range(nr)]
        sheets = [("S0", rows)]
        if i % 4 == 0:
            sheets.append(("T1", [[f"t {i}"]]))
        payload = build_ods(sheets, deflate=i % 2 == 0)
        xml = zip_read(payload, "content.xml").decode("utf-8", "replace")
        for c in parse_ods(xml):
            o_id.append(i)
            o_sheet.append(c["sheet"])
            o_row.append(c["row"])
            o_col.append(c["col"])
            o_val.append(str(c["value"]))
            o_kind.append(c["kind"])
    return pa.table({
        "doc_id": pa.array(o_id, type=pa.int64()),
        "sheet": pa.array(o_sheet, type=pa.string()),
        "row_i": pa.array(o_row, type=pa.int64()),
        "col_i": pa.array(o_col, type=pa.int64()),
        "value": pa.array(o_val, type=pa.string()),
        "kind": pa.array(o_kind, type=pa.string()),
    })


def q_ods_cells(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_ods_cells_batch, **_PYA))


# the planted grid is IDENTICAL to xls_cells' (queries_r5.py), so the
# SQL differs only in the kind labels — both spreadsheet generations
# and both container families land on one value spec
SQL_ODS_CELLS = """
WITH d AS (
  SELECT doc_id, CAST(doc_id % 2 AS BIGINT) + 2 AS nr FROM documents
), r AS (
  SELECT doc_id, unnest(generate_series(1, nr)) AS row_i FROM d)
SELECT doc_id, 'S0' AS sheet, row_i, CAST(1 AS BIGINT) AS col_i,
       'v ' || doc_id || '-' || (row_i - 1) AS value, 's' AS kind
FROM r
UNION ALL
SELECT doc_id, 'S0', row_i, 2,
       CAST((doc_id * 31 + row_i - 1) % 97 - 40 AS VARCHAR), 'n'
FROM r
UNION ALL
SELECT doc_id, 'S0', row_i, 3,
       CAST((doc_id * 7 + row_i - 1) % 50 AS VARCHAR) || '.5', 'n'
FROM r
UNION ALL
SELECT doc_id, 'S0', row_i, 4,
       CAST((doc_id + row_i - 1) % 2 AS VARCHAR), 'b'
FROM r
UNION ALL
SELECT doc_id, 'T1', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
       't ' || doc_id, 's'
FROM d WHERE doc_id % 4 = 0
"""


def _odp_paras_batch(batch: pa.Table) -> pa.Table:
    from ..core.docx import zip_read
    from ..core.ods_odp import build_odp, parse_odp

    ids = batch.column("doc_id").to_pylist()
    o_id, o_slide, o_idx, o_text = [], [], [], []
    for i in ids:
        slides: list[list[str]] = []
        for s in range(1 + i % 2):
            paras = [f"Slide {i}-{s}" + (" …" if i % 5 == 0 else "")]
            for k in range(1 + (i + s) % 2):
                paras.append(
                    f"line {i}-{s}-{k} v {(i * 13 + s * 7 + k) % 40}")
            if (i + s) % 3 == 0:
                paras.append("")
            slides.append(paras)
        payload = build_odp(slides, deflate=i % 2 == 0,
                            with_notes=i % 3 == 0)
        xml = zip_read(payload, "content.xml").decode("utf-8", "replace")
        for p in parse_odp(xml):
            o_id.append(i)
            o_slide.append(p["slide"])
            o_idx.append(p["para_idx"])
            o_text.append(p["text"])
    return pa.table({
        "doc_id": pa.array(o_id, type=pa.int64()),
        "slide": pa.array(o_slide, type=pa.int64()),
        "para_idx": pa.array(o_idx, type=pa.int64()),
        "text": pa.array(o_text, type=pa.string()),
    })


def q_odp_paragraphs(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_odp_paras_batch, **_PYA))


def _sql_odp_paragraphs() -> str:
    # identical planted spec to ppt_paragraphs (queries_r5.py) — one
    # value spec, two presentation generations; the planted notes
    # paragraph must be excluded for the hash to match
    from .queries_r5 import SQL_PPT_PARAGRAPHS

    return SQL_PPT_PARAGRAPHS


# --- text_pages: the plain-text route through the actor pool (M49) --------

def _text_pages_batch(batch: pa.Table) -> pa.Table:
    from .queries_r5 import _PARITY_TS

    ids = batch.column("doc_id").to_pylist()
    payloads = []
    for i in ids:
        paras = [f"plain para {i}-{k} word {(i * 19 + k) % 70}"
                 for k in range(1 + i % 3)]
        payloads.append(("\n\n".join(paras) + "\n").encode("utf-8"))
    return pa.table({
        "url": pa.array([f"https://parity.test/{i}" for i in ids],
                        type=pa.string()),
        "warc_ts": pa.array([_PARITY_TS] * len(ids),
                            type=pa.timestamp("us")),
        "html": pa.array(payloads, type=pa.binary()),
        "lang": pa.array(["en"] * len(ids), type=pa.string()),
    })


def q_text_pages(sf_dir: str) -> ray.data.Dataset:
    from .extraction import extract_pages
    from .queries import read_table
    from .queries_r5 import _parity_blocks_batch

    pages = (read_table(sf_dir, "documents", ["doc_id"])
             .map_batches(_text_pages_batch, **_PYA))
    return (extract_pages(pages, mode="single_pass")
            .map_batches(_parity_blocks_batch, **_PYA))


SQL_TEXT_PAGES = """
WITH d AS (
  SELECT doc_id, CAST(doc_id % 3 AS BIGINT) + 1 AS nb FROM documents)
SELECT doc_id, k AS block_idx,
       'plain para ' || doc_id || '-' || k || ' word '
         || (doc_id * 19 + k) % 70 AS text,
       nb AS n_kept, CAST(0 AS BIGINT) AS n_dropped
FROM d, LATERAL (SELECT unnest(generate_series(0, nb - 1)) AS k) t
"""


# --- cross_label_align: bitext-mining shape (E7) --------------------------

def q_cross_label_align(sf_dir: str) -> ray.data.Dataset:
    """For every embedding, its max-cosine neighbour with a DIFFERENT
    label — the cross-lingual/bitext alignment shape (mine the best
    counterpart in the other corpus).  The corpus side broadcasts once
    (``ray.put``, the embed_neardup discipline) and each batch runs ONE
    rows×corpus matmul; selection uses the 4dp-ROUNDED cosine with a
    lowest-id tiebreak so both engines make the identical argmax
    decision.  At crawl scale the broadcast side is replaced by the ANN
    stack (ann_batch_queries / LSH buckets) — documented, as with
    embed_neardup."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    import ray

    from .queries import read_table

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding", "label"])
    all_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    order = np.argsort(all_ids)          # ascending ids → argmax ties
    all_ids = all_ids[order]             # resolve to the LOWEST id
    mat = np.asarray(t.column("embedding").to_pylist(),
                     dtype=np.float64)[order]
    labels = np.asarray(t.column("label").to_pylist(),
                        dtype=np.int64)[order]
    mat_n = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                             1e-30)
    ref = ray.put((all_ids, mat_n, labels))

    def align(b: pa.Table) -> pa.Table:
        ids_all, m_n, labs = ray.get(ref)
        q_ids = np.asarray(b.column("vec_id").to_pylist(),
                           dtype=np.int64)
        q = np.asarray(b.column("embedding").to_pylist(),
                       dtype=np.float64)
        q_labs = np.asarray(b.column("label").to_pylist(),
                            dtype=np.int64)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                            1e-30)
        sims = np.round(qn @ m_n.T, 4)
        sims[q_labs[:, None] == labs[None, :]] = -2.0  # same label: out
        best = np.argmax(sims, axis=1)   # first max → lowest vec_id
        return pa.table({
            "vec_id": pa.array(q_ids, type=pa.int64()),
            "match_id": pa.array(ids_all[best], type=pa.int64()),
            "cos": pa.array(sims[np.arange(len(q_ids)), best],
                            type=pa.float64()),
        })

    return (read_table(sf_dir, "embeddings",
                       ["vec_id", "embedding", "label"])
            .map_batches(align, **_PYA))


SQL_CROSS_LABEL_ALIGN = """
WITH sims AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS match_id,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])),
               4) AS cos
  FROM embeddings a JOIN embeddings b ON a.label <> b.label)
SELECT vec_id, match_id, cos FROM sims
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY cos DESC, match_id) = 1
"""


def queries_r5b() -> dict:
    return {"epub_chapters": q_epub_chapters,
            "mhtml_pages": q_mhtml_pages,
            "gzip_pages": q_gzip_pages,
            "tar_source_stats": q_tar_source_stats,
            "ods_cells": q_ods_cells,
            "odp_paragraphs": q_odp_paragraphs,
            "text_pages": q_text_pages,
            "cross_label_align": q_cross_label_align}


def parity_sql_r5b() -> dict[str, str]:
    return {"epub_chapters": SQL_EPUB_CHAPTERS,
            "mhtml_pages": _sql_mhtml_pages(),
            "gzip_pages": _sql_mhtml_pages(),
            "tar_source_stats": SQL_TAR_SOURCE_STATS,
            "ods_cells": SQL_ODS_CELLS,
            "odp_paragraphs": _sql_odp_paragraphs(),
            "text_pages": SQL_TEXT_PAGES,
            "cross_label_align": SQL_CROSS_LABEL_ALIGN}
