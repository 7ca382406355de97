"""Structured HTML table extraction (grid parity with the PDF path)."""

from __future__ import annotations

from text_extraction_ray.functions.html_tables import (
    render_tables,
    tables_in_doc,
)


def test_simple_grid():
    doc = ("<table><tr><td>a</td><td>b</td></tr>"
           "<tr><td>1</td><td>2</td></tr></table>")
    assert render_tables(doc) == ["a\tb\n1\t2"]


def test_th_implied_closes_and_entities():
    # no </td>/</tr>: new cells/rows imply closes; entities decode
    doc = ("<table><tr><th>x &amp; y<th>z"
           "<tr><td>1<td>2</table>")
    assert render_tables(doc) == ["x & y\tz\n1\t2"]


def test_two_tables_and_surrounding_text():
    doc = ("<p>before</p><table><tr><td>a</td></tr></table>"
           "mid<table><tr><td>b</td><td>c</td></tr></table>")
    assert render_tables(doc) == ["a", "b\tc"]


def test_nested_table_flows_into_cell():
    doc = ("<table><tr><td>out "
           "<table><tr><td>in</td></tr></table></td>"
           "<td>next</td></tr></table>")
    assert render_tables(doc) == ["out in\tnext"]


def test_markup_inside_cells_and_malformed():
    doc = "<table><tr><td><b>bo</b>ld</td><td><a href=x>l</a></td>"
    assert render_tables(doc + "</tr></table>") == ["bold\tl"]
    # unterminated table: tokenizer hits EOF — no completed table emitted
    assert render_tables(doc) == []
    assert render_tables("") == []
    assert render_tables("<p>no tables</p>") == []


def test_corpus_query(ray_session):
    from text_extraction_ray.pipelines.queries import queries

    df = queries()["html_tables"]("/root/testdata/sf0.01").to_pandas()
    assert len(df) > 0
    assert (df["n_cells"] >= 1).all()
    assert set(df.columns) == {"url", "table_idx", "row_idx", "n_cells",
                               "row_text"}
