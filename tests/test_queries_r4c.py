"""Round-4 batch C: OOXML docx paragraph oracle (M31)."""

import duckdb
import pandas as pd
import pytest

SCALES = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf_dir}/documents.parquet'")
    return con.execute(
        sql + " ORDER BY doc_id, para_idx").fetchdf()


@pytest.mark.parametrize("sf_dir", SCALES)
def test_docx_paragraphs_duckdb_parity(ray_session, sf_dir):
    """Every paragraph value recovered through the real ZIP reader +
    WordprocessingML parser == the doc_id-derived expected strings in
    SQL — central-directory walk, inflate+CRC, run concatenation,
    entity decode, style capture and table-cell order all inside the
    hash; container variants (stored/deflate, split runs) must be
    value-invisible."""
    from text_extraction_ray.pipelines.queries_r4c import (
        SQL_DOCX_PARAGRAPHS, q_docx_paragraphs)

    got = (q_docx_paragraphs(sf_dir).to_pandas()
           .sort_values(["doc_id", "para_idx"]).reset_index(drop=True))
    want = _oracle(sf_dir, SQL_DOCX_PARAGRAPHS)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # non-vacuous in every dimension the parser distinguishes
    assert got.in_table.sum() > 0 and (~got.in_table).sum() > 0
    assert (got["style"] == "Heading1").sum() > 0
    assert (got["text"] == "").sum() > 0


@pytest.mark.parametrize("sf_dir", SCALES)
def test_xlsx_cells_duckdb_parity(ray_session, sf_dir):
    """Every cell recovered through the real workbook-rels +
    shared-strings + sheet scan == the doc_id-derived expected values
    in SQL — reference decode, shared-index resolution, kind tagging
    and sheet order all inside the hash; shared/inline and
    stored/deflate variants must be value-invisible."""
    from text_extraction_ray.pipelines.queries_r4c import (
        SQL_XLSX_CELLS, q_xlsx_cells)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf_dir}/documents.parquet'")
    want = con.execute(SQL_XLSX_CELLS + " ORDER BY doc_id, sheet, "
                       "row_i, col_i").fetchdf()
    got = (q_xlsx_cells(sf_dir).to_pandas()
           .sort_values(["doc_id", "sheet", "row_i", "col_i"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got["kind"]) == {"s", "inlineStr", "n", "b"}
    assert (got["sheet"] == "X1").sum() > 0


@pytest.mark.parametrize("sf_dir", SCALES)
def test_pptx_paragraphs_duckdb_parity(ray_session, sf_dir):
    """Every slide paragraph recovered through presentation-rels
    resolution + the shared paragraph scanner == the doc_id-derived
    expected strings in SQL."""
    from text_extraction_ray.pipelines.queries_r4c import (
        SQL_PPTX_PARAGRAPHS, q_pptx_paragraphs)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf_dir}/documents.parquet'")
    want = con.execute(SQL_PPTX_PARAGRAPHS + " ORDER BY doc_id, slide, "
                       "para_idx").fetchdf()
    got = (q_pptx_paragraphs(sf_dir).to_pandas()
           .sort_values(["doc_id", "slide", "para_idx"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["slide"] == 2).sum() > 0
    assert (got["text"] == "").sum() > 0


@pytest.mark.parametrize("sf_dir", SCALES)
def test_odt_paragraphs_duckdb_parity(ray_session, sf_dir):
    """Every ODF paragraph recovered through the container + content
    scan == the doc_id-derived expected strings in SQL — span
    transparency, entity decode, heading levels and empty-paragraph
    accounting all inside the hash."""
    from text_extraction_ray.pipelines.queries_r4c import (
        SQL_ODT_PARAGRAPHS, q_odt_paragraphs)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf_dir}/documents.parquet'")
    want = con.execute(SQL_ODT_PARAGRAPHS + " ORDER BY doc_id, "
                       "para_idx").fetchdf()
    got = (q_odt_paragraphs(sf_dir).to_pandas()
           .sort_values(["doc_id", "para_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got["heading"]) == {0, 1, 2, 3}


@pytest.mark.parametrize("sf_dir", SCALES)
def test_docx_footnotes_duckdb_parity(ray_session, sf_dir):
    """Footnote paragraphs recovered through the footnotes part (with
    separator pseudo-footnotes to skip) == the doc_id-derived strings
    in SQL."""
    from text_extraction_ray.pipelines.queries_r4c import (
        SQL_DOCX_FOOTNOTES, q_docx_footnotes)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf_dir}/documents.parquet'")
    want = con.execute(SQL_DOCX_FOOTNOTES + " ORDER BY doc_id, fn_id, "
                       "para_idx").fetchdf()
    got = (q_docx_footnotes(sf_dir).to_pandas()
           .sort_values(["doc_id", "fn_id", "para_idx"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["para_idx"] == 1).sum() > 0   # multi-paragraph notes


@pytest.mark.parametrize("sf_dir", SCALES)
def test_rtf_paragraphs_duckdb_parity(ray_session, sf_dir):
    """Paragraphs through the full RTF grammar (cp1252 hex escapes on
    even ids, \\uN? unicode form on odd, footnote destinations every
    third doc) == the doc_id-derived strings in SQL."""
    from text_extraction_ray.pipelines.queries_r4c import (
        SQL_RTF_PARAGRAPHS, q_rtf_paragraphs)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf_dir}/documents.parquet'")
    want = con.execute(SQL_RTF_PARAGRAPHS + " ORDER BY doc_id, "
                       "para_idx").fetchdf()
    got = (q_rtf_paragraphs(sf_dir).to_pandas()
           .sort_values(["doc_id", "para_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_registry_carries_r4c_queries(ray_session):
    """Registered past the pinned 50-row driver window, with SQL."""
    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    names = list(qs)
    for name in ("docx_paragraphs", "xlsx_cells", "pptx_paragraphs",
                 "odt_paragraphs", "docx_footnotes", "rtf_paragraphs"):
        assert name in qs and name in osql
        assert names.index(name) >= 50
    assert names[49] == "extract_pages_parity"
    assert names[50] == "extract_pages"
