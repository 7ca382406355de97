"""Round-4 batch C: OOXML office-document parsing oracles (M31).

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


def queries_r4c() -> dict:
    return {"docx_paragraphs": q_docx_paragraphs}


def parity_sql_r4c() -> dict[str, str]:
    return {"docx_paragraphs": SQL_DOCX_PARAGRAPHS}
