"""Round-4 batch C: OOXML office-document parsing oracles (M31/M32).

``xlsx_cells`` — same discipline for ``core/xlsx.py``: per document a
deterministic workbook (mixed string/number/boolean grid, a second
sheet every fourth doc, shared vs inline strings by ``id % 2``, stored
vs deflate by ``id % 3``) runs the real workbook-rels + shared-strings
+ sheet scan and emits one row per cell; the oracle recomputes sheet,
(row, col), value and cell kind from ``doc_id``.

``docx_paragraphs`` — registry-facing twin of ``core/docx.py``: per
document it BUILDS a deterministic .docx whose paragraph values derive
from ``doc_id`` (entity-encoded heading with non-ASCII, ``doc_id``-many
body paragraphs, an empty paragraph every fifth doc, a 2-cell table on
even ids), cycling the container/markup variants the extractor must
hold (stored vs deflate members by ``id % 3``, split-mid-word
preserve-space runs by ``id % 2``), then runs the REAL ZIP reader +
WordprocessingML parser and returns one row per paragraph.  The oracle
recomputes every expected string in SQL from ``doc_id`` — a value-level
check: any drift in the central-directory walk, inflate, CRC, run
concatenation, entity decode, whitespace collapse, style capture or
table-cell ordering breaks the hash match.

Scale shape: the stage is a pure ``map_batches`` scan over a pruned
single-column read — zero shuffle; per-doc work is bounded by the
(tiny) synthetic payload.  In production the same parser runs inside
the flagship extraction actor pool (pipelines/extraction.py routes
``doc_type="docx"`` through the pdf branch).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

_PYA = {"batch_format": "pyarrow", "zero_copy_batch": True}


def _docx_paras_batch(batch: pa.Table) -> pa.Table:
    from ..core.docx import build_docx, parse_docx, zip_read

    ids = batch.column("doc_id").to_pylist()
    o_id, o_idx, o_text, o_style, o_tbl = [], [], [], [], []
    for i in ids:
        paras = [(f"Title {i} & résumé {i % 7}", "Heading1")]
        for k in range(1 + i % 3):
            paras.append((f"para {i}-{k} v {(i * 7 + k) % 50}", ""))
        if i % 5 == 0:
            paras.append(("", ""))
        table = [[f"cell {i}-0", f"cell {i}-1"]] if i % 2 == 0 else None
        payload = build_docx(paras, table, deflate=i % 3 != 0,
                             split_runs=i % 2 == 1)
        xml = zip_read(payload, "word/document.xml").decode("utf-8")
        for k, p in enumerate(parse_docx(xml)):
            o_id.append(i)
            o_idx.append(k)
            o_text.append(p["text"])
            o_style.append(p["style"])
            o_tbl.append(p["in_table"])
    return pa.table({
        "doc_id": pa.array(o_id, type=pa.int64()),
        "para_idx": pa.array(o_idx, type=pa.int64()),
        "text": pa.array(o_text, type=pa.string()),
        "style": pa.array(o_style, type=pa.string()),
        "in_table": pa.array(o_tbl, type=pa.bool_()),
    })


def q_docx_paragraphs(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_docx_paras_batch, **_PYA))


SQL_DOCX_PARAGRAPHS = """
WITH d AS (
  SELECT doc_id,
         CAST(doc_id % 3 AS BIGINT) + 1 AS nb,
         CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS he,
         (doc_id % 2 = 0) AS ht
  FROM documents)
SELECT doc_id, CAST(0 AS BIGINT) AS para_idx,
       'Title ' || doc_id || ' & résumé ' || (doc_id % 7) AS text,
       'Heading1' AS style, FALSE AS in_table
FROM d
UNION ALL
SELECT doc_id, 1 + k,
       'para ' || doc_id || '-' || k || ' v ' || (doc_id * 7 + k) % 50,
       '', FALSE
FROM d, LATERAL (SELECT unnest(generate_series(0, nb - 1)) AS k) t
UNION ALL
SELECT doc_id, 1 + nb, '', '', FALSE FROM d WHERE he = 1
UNION ALL
SELECT doc_id, 1 + nb + he + j, 'cell ' || doc_id || '-' || j, '', TRUE
FROM d, LATERAL (SELECT unnest(generate_series(0, 1)) AS j) t
WHERE ht
"""


# --- xlsx_cells: value-level SpreadsheetML oracle (M32) ------------------

def _xlsx_cells_batch(batch: pa.Table) -> pa.Table:
    from ..core.xlsx import build_xlsx, parse_xlsx

    ids = batch.column("doc_id").to_pylist()
    o_id, o_sheet, o_row, o_col, o_val, o_kind = [], [], [], [], [], []
    for i in ids:
        nr = 2 + i % 2
        rows: list[list[object]] = [
            [f"w {i}-{r}", (i * 31 + r) % 97, bool((i + r) % 2)]
            for r in range(nr)]
        sheets = [("S0", rows)]
        if i % 4 == 0:
            sheets.append(("X1", [[f"x {i}"]]))
        payload = build_xlsx(sheets, deflate=i % 3 != 0,
                             shared=i % 2 == 0)
        for c in parse_xlsx(payload):
            o_id.append(i)
            o_sheet.append(c["sheet"])
            o_row.append(c["row"])
            o_col.append(c["col"])
            o_val.append(c["value"])
            o_kind.append(c["kind"])
    return pa.table({
        "doc_id": pa.array(o_id, type=pa.int64()),
        "sheet": pa.array(o_sheet, type=pa.string()),
        "row_i": pa.array(o_row, type=pa.int64()),
        "col_i": pa.array(o_col, type=pa.int64()),
        "value": pa.array(o_val, type=pa.string()),
        "kind": pa.array(o_kind, type=pa.string()),
    })


def q_xlsx_cells(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_xlsx_cells_batch, **_PYA))


SQL_XLSX_CELLS = """
WITH d AS (
  SELECT doc_id, CAST(doc_id % 2 AS BIGINT) + 2 AS nr,
         CASE WHEN doc_id % 2 = 0 THEN 's' ELSE 'inlineStr' END AS sk
  FROM documents
), r AS (
  SELECT doc_id, sk, unnest(generate_series(1, nr)) AS row_i FROM d)
SELECT doc_id, 'S0' AS sheet, row_i, CAST(1 AS BIGINT) AS col_i,
       'w ' || doc_id || '-' || (row_i - 1) AS value, sk AS kind
FROM r
UNION ALL
SELECT doc_id, 'S0', row_i, 2,
       CAST((doc_id * 31 + row_i - 1) % 97 AS VARCHAR), 'n'
FROM r
UNION ALL
SELECT doc_id, 'S0', row_i, 3,
       CAST((doc_id + row_i - 1) % 2 AS VARCHAR), 'b'
FROM r
UNION ALL
SELECT doc_id, 'X1', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
       'x ' || doc_id, sk
FROM d WHERE doc_id % 4 = 0
"""


# --- pptx_paragraphs: value-level PresentationML oracle (M33) ------------

def _pptx_paras_batch(batch: pa.Table) -> pa.Table:
    from ..core.pptx import build_pptx, parse_pptx

    ids = batch.column("doc_id").to_pylist()
    o_id, o_slide, o_idx, o_text = [], [], [], []
    for i in ids:
        slides: list[list[str]] = []
        for s in range(1 + i % 2):
            paras = [f"Slide {i}-{s} & notes"]
            for k in range(1 + (i + s) % 2):
                paras.append(
                    f"line {i}-{s}-{k} v {(i * 13 + s * 7 + k) % 40}")
            if (i + s) % 3 == 0:
                paras.append("")
            slides.append(paras)
        payload = build_pptx(slides, deflate=i % 3 != 0,
                             split_runs=i % 2 == 1)
        at: dict[int, int] = {}
        for p in parse_pptx(payload):
            k = at.get(p["slide"], 0)
            at[p["slide"]] = k + 1
            o_id.append(i)
            o_slide.append(p["slide"])
            o_idx.append(k)
            o_text.append(p["text"])
    return pa.table({
        "doc_id": pa.array(o_id, type=pa.int64()),
        "slide": pa.array(o_slide, type=pa.int64()),
        "para_idx": pa.array(o_idx, type=pa.int64()),
        "text": pa.array(o_text, type=pa.string()),
    })


def q_pptx_paragraphs(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_pptx_paras_batch, **_PYA))


SQL_PPTX_PARAGRAPHS = """
WITH d AS (
  SELECT doc_id, CAST(doc_id % 2 AS BIGINT) + 1 AS ns FROM documents
), s AS (
  SELECT doc_id, unnest(generate_series(0, ns - 1)) AS sl FROM d
), sb AS (
  SELECT doc_id, sl, CAST((doc_id + sl) % 2 AS BIGINT) + 1 AS nb,
         CASE WHEN (doc_id + sl) % 3 = 0 THEN 1 ELSE 0 END AS he
  FROM s)
SELECT doc_id, sl + 1 AS slide, CAST(0 AS BIGINT) AS para_idx,
       'Slide ' || doc_id || '-' || sl || ' & notes' AS text
FROM sb
UNION ALL
SELECT doc_id, sl + 1, 1 + k,
       'line ' || doc_id || '-' || sl || '-' || k || ' v ' ||
       (doc_id * 13 + sl * 7 + k) % 40
FROM sb, LATERAL (SELECT unnest(generate_series(0, nb - 1)) AS k) t
UNION ALL
SELECT doc_id, sl + 1, 1 + nb, '' FROM sb WHERE he = 1
"""


# --- odt_paragraphs: value-level ODF oracle (M34) -------------------------

def _odt_paras_batch(batch: pa.Table) -> pa.Table:
    from ..core.odt import build_odt, parse_odt, zip_read

    ids = batch.column("doc_id").to_pylist()
    o_id, o_idx, o_text, o_head = [], [], [], []
    for i in ids:
        lvl = 1 + i % 3
        paras: list[tuple[str, int]] = [(f"Head {i} & §{i % 9}", lvl)]
        for k in range(1 + i % 2):
            paras.append((f"odt {i}-{k} v {(i * 11 + k) % 60}", 0))
        if i % 4 == 0:
            paras.append(("", 0))
        payload = build_odt(paras, deflate=i % 3 != 0,
                            use_spans=i % 2 == 1)
        xml = zip_read(payload, "content.xml").decode("utf-8")
        for k, p in enumerate(parse_odt(xml)):
            o_id.append(i)
            o_idx.append(k)
            o_text.append(p["text"])
            o_head.append(p["heading"])
    return pa.table({
        "doc_id": pa.array(o_id, type=pa.int64()),
        "para_idx": pa.array(o_idx, type=pa.int64()),
        "text": pa.array(o_text, type=pa.string()),
        "heading": pa.array(o_head, type=pa.int64()),
    })


def q_odt_paragraphs(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_odt_paras_batch, **_PYA))


SQL_ODT_PARAGRAPHS = """
WITH d AS (
  SELECT doc_id, CAST(doc_id % 2 AS BIGINT) + 1 AS nb,
         CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS he,
         CAST(1 + doc_id % 3 AS BIGINT) AS lvl
  FROM documents)
SELECT doc_id, CAST(0 AS BIGINT) AS para_idx,
       'Head ' || doc_id || ' & §' || (doc_id % 9) AS text,
       lvl AS heading
FROM d
UNION ALL
SELECT doc_id, 1 + k,
       'odt ' || doc_id || '-' || k || ' v ' || (doc_id * 11 + k) % 60,
       CAST(0 AS BIGINT)
FROM d, LATERAL (SELECT unnest(generate_series(0, nb - 1)) AS k) t
UNION ALL
SELECT doc_id, 1 + nb, '', CAST(0 AS BIGINT) FROM d WHERE he = 1
"""


# --- docx_footnotes: value-level footnote-part oracle (M31b) --------------

def _docx_footnotes_batch(batch: pa.Table) -> pa.Table:
    from ..core.docx import build_docx, parse_footnotes

    ids = batch.column("doc_id").to_pylist()
    o_id, o_fn, o_idx, o_text = [], [], [], []
    for i in ids:
        fns: list[tuple[int, list[str]]] = []
        for j in range(1 + i % 2):
            paras = [f"fn {i}-{j}-{k} & ref {(i * 17 + j + k) % 30}"
                     for k in range(1 + (i + j) % 2)]
            fns.append((j + 1, paras))
        payload = build_docx([("body text", "")], footnotes=fns,
                             deflate=i % 3 != 0)
        at: dict[int, int] = {}
        for r in parse_footnotes(payload):
            k = at.get(r["fn_id"], 0)
            at[r["fn_id"]] = k + 1
            o_id.append(i)
            o_fn.append(r["fn_id"])
            o_idx.append(k)
            o_text.append(r["text"])
    return pa.table({
        "doc_id": pa.array(o_id, type=pa.int64()),
        "fn_id": pa.array(o_fn, type=pa.int64()),
        "para_idx": pa.array(o_idx, type=pa.int64()),
        "text": pa.array(o_text, type=pa.string()),
    })


def q_docx_footnotes(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_docx_footnotes_batch, **_PYA))


SQL_DOCX_FOOTNOTES = """
WITH d AS (
  SELECT doc_id, CAST(doc_id % 2 AS BIGINT) + 1 AS nf FROM documents
), f AS (
  SELECT doc_id, unnest(generate_series(1, nf)) AS fn_id FROM d
), fp AS (
  SELECT doc_id, fn_id,
         CAST((doc_id + fn_id - 1) % 2 AS BIGINT) + 1 AS np
  FROM f)
SELECT doc_id, fn_id, k AS para_idx,
       'fn ' || doc_id || '-' || (fn_id - 1) || '-' || k || ' & ref ' ||
       (doc_id * 17 + fn_id - 1 + k) % 30 AS text
FROM fp, LATERAL (SELECT unnest(generate_series(0, np - 1)) AS k) t
"""


# --- rtf_paragraphs: value-level RTF-grammar oracle (M35) -----------------

def _rtf_paras_batch(batch: pa.Table) -> pa.Table:
    from ..core.rtf import build_rtf, parse_rtf

    ids = batch.column("doc_id").to_pylist()
    o_id, o_idx, o_text = [], [], []
    for i in ids:
        paras = [f"rtf {i}-{k} café — v {(i * 7 + k) % 45}"
                 for k in range(1 + i % 3)]
        fn = f"hidden {i}" if i % 3 == 0 else None
        payload = build_rtf(paras, unicode_form=i % 2 == 1,
                            with_footnote=fn)
        for k, t in enumerate(parse_rtf(payload)):
            o_id.append(i)
            o_idx.append(k)
            o_text.append(t)
    return pa.table({
        "doc_id": pa.array(o_id, type=pa.int64()),
        "para_idx": pa.array(o_idx, type=pa.int64()),
        "text": pa.array(o_text, type=pa.string()),
    })


def q_rtf_paragraphs(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_rtf_paras_batch, **_PYA))


SQL_RTF_PARAGRAPHS = """
WITH d AS (
  SELECT doc_id, CAST(doc_id % 3 AS BIGINT) + 1 AS np FROM documents)
SELECT doc_id, k AS para_idx,
       'rtf ' || doc_id || '-' || k || ' café — v ' ||
       (doc_id * 7 + k) % 45 AS text
FROM d, LATERAL (SELECT unnest(generate_series(0, np - 1)) AS k) t
"""


def queries_r4c() -> dict:
    return {"docx_paragraphs": q_docx_paragraphs,
            "xlsx_cells": q_xlsx_cells,
            "pptx_paragraphs": q_pptx_paragraphs,
            "odt_paragraphs": q_odt_paragraphs,
            "docx_footnotes": q_docx_footnotes,
            "rtf_paragraphs": q_rtf_paragraphs}


def parity_sql_r4c() -> dict[str, str]:
    return {"docx_paragraphs": SQL_DOCX_PARAGRAPHS,
            "xlsx_cells": SQL_XLSX_CELLS,
            "pptx_paragraphs": SQL_PPTX_PARAGRAPHS,
            "odt_paragraphs": SQL_ODT_PARAGRAPHS,
            "docx_footnotes": SQL_DOCX_FOOTNOTES,
            "rtf_paragraphs": SQL_RTF_PARAGRAPHS}
