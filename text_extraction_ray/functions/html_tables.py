"""Structured table extraction from HTML markup (the reference's tabular
capability on the HTML side, matching the PDF path's cell grid).

``<table>``/``<tr>``/``<td|th>`` markup folds into a grid: rows top-to-
bottom, cells left-to-right, same joiners as the PDF tables
(PDF_CELL_JOIN / PDF_ROW_JOIN).  Built on the reference tokenizer
(core/dom.tokenize) so malformed markup degrades instead of raising:
implied cell/row closes (a new <td> or <tr> closes the open one), content
of nested tables flows into the enclosing cell.
"""

from __future__ import annotations

import pyarrow as pa

from ..core.dom import collapse_ws, decode_entities, tokenize
from ..core.encoding import decode_html, sniff_doc_type
from ..params import PDF_CELL_JOIN, PDF_ROW_JOIN


def tables_in_doc(doc: str) -> list[list[list[str]]]:
    """All top-level tables → rows → normalized cell texts."""
    tables: list[list[list[list[str]]]] = []
    depth = 0
    cur_rows: list | None = None
    cur_row: list | None = None
    cur_cell: list | None = None

    def close_cell() -> None:
        nonlocal cur_row, cur_cell
        if cur_cell is not None:
            if cur_row is None:
                cur_row = []
            cur_row.append(cur_cell)
            cur_cell = None

    def close_row() -> None:
        nonlocal cur_row
        close_cell()
        if cur_row is not None:
            cur_rows.append(cur_row)
            cur_row = None

    for tok in tokenize(doc):
        kind = tok[0]
        if kind == "start":
            name = tok[1]
            if name == "table":
                depth += 1
                if depth == 1:
                    cur_rows, cur_row, cur_cell = [], None, None
            elif depth == 1:
                if name == "tr":
                    close_row()
                    cur_row = []
                elif name in ("td", "th"):
                    close_cell()
                    if cur_row is None:
                        cur_row = []
                    cur_cell = []
        elif kind == "end":
            name = tok[1]
            if name == "table":
                if depth == 1 and cur_rows is not None:
                    close_row()
                    if cur_rows:
                        tables.append(cur_rows)
                    cur_rows = None
                depth = max(0, depth - 1)
            elif depth == 1:
                if name in ("td", "th"):
                    close_cell()
                elif name == "tr":
                    close_row()
        else:  # text
            if depth >= 1 and cur_cell is not None:
                cur_cell.append(tok[1])

    return [
        [[collapse_ws(decode_entities("".join(c))).strip() for c in row]
         for row in rows]
        for rows in tables
    ]


def html_tables_batch(batch: pa.Table) -> pa.Table:
    """One output row per table row: (url, table_idx, row_idx, n_cells,
    row_text) with cells tab-joined — directly comparable to the PDF
    path's grid output."""
    urls, t_idx, r_idx, n_cells, row_text = [], [], [], [], []
    for url, payload in zip(batch.column("url").to_pylist(),
                            batch.column("html").to_pylist()):
        if sniff_doc_type(payload or b"") != "html":
            continue
        text, _ = decode_html(payload)
        for ti, rows in enumerate(tables_in_doc(text)):
            for ri, row in enumerate(rows):
                urls.append(url)
                t_idx.append(ti)
                r_idx.append(ri)
                n_cells.append(len(row))
                row_text.append(PDF_CELL_JOIN.join(row))
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "table_idx": pa.array(t_idx, type=pa.int32()),
        "row_idx": pa.array(r_idx, type=pa.int32()),
        "n_cells": pa.array(n_cells, type=pa.int32()),
        "row_text": pa.array(row_text, type=pa.string()),
    })


def render_tables(doc: str) -> list[str]:
    """Each table as the PDF-style grid string (cells \\t, rows \\n)."""
    return [PDF_ROW_JOIN.join(PDF_CELL_JOIN.join(row) for row in rows)
            for rows in tables_in_doc(doc)]
