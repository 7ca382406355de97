"""Batch-AG: scanned-PDF table OCR (PDF → embedded image → cells)."""

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def test_scanned_pdf_tables_match_duckdb(ray_session):
    """Driver-shaped DuckDB parity at two scales for the full loop:
    build PDF → parse PDF → extract image → grid → template read."""
    from text_extraction_ray.pipelines.queries_r3ag import (
        SQL_SCANNED_PDF_TABLES, q_scanned_pdf_tables)

    for sf in (SF_DIR, "/root/testdata/sf0.01"):
        got = (q_scanned_pdf_tables(sf).to_pandas()
               .sort_values(["doc_id", "r", "c"]).reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf}/documents.parquet'")
        want = con.execute(
            SQL_SCANNED_PDF_TABLES + " ORDER BY doc_id, r, c").fetchdf()
        assert got["cell"].tolist() == want["cell"].tolist()
        assert (got["page"] == 0).all()
        assert len(got) > 0


def test_image_pdf_roundtrip_exact():
    """build_image_pdf → pdf_images is byte-exact per embedded raster,
    including through the Flate compression."""
    from text_extraction_ray.core.pdf import pdf_images
    from text_extraction_ray.core.pdf_write import build_image_pdf
    from text_extraction_ray.functions.table_image import \
        render_table_image

    imgs = [render_table_image(i) for i in (0, 7, 99, 1234)]
    payload = build_image_pdf(imgs)
    assert payload.count(b"/FlateDecode") == len(imgs)
    got = pdf_images(payload)
    assert len(got) == len(imgs)
    for (w1, h1, g1), (w2, h2, g2) in zip(imgs, got):
        assert (w1, h1) == (w2, h2)
        assert g1 == g2


def test_multipage_scanned_pdf():
    """A multi-page scan extracts every page's table, page-ordered."""
    from text_extraction_ray.core.pdf_write import build_image_pdf
    from text_extraction_ray.functions.table_image import \
        render_table_image
    from text_extraction_ray.pipelines.queries_r3ag import \
        ScannedPdfTableReader
    import pyarrow as pa

    payload = build_image_pdf([render_table_image(3),
                               render_table_image(4)])
    out = ScannedPdfTableReader()(pa.table({
        "doc_id": pa.array([42], pa.int64()),
        "pdf": pa.array([payload], pa.binary()),
    }))
    pages = out.column("page").to_pylist()
    assert set(pages) == {0, 1}
    from text_extraction_ray.functions.table_image import (cell_digit,
                                                           table_shape)
    for pg, did in ((0, 3), (1, 4)):
        R, C = table_shape(did)
        cells = {(r, c): v for p, r, c, v in zip(
            pages, out.column("r").to_pylist(),
            out.column("c").to_pylist(),
            out.column("cell").to_pylist()) if p == pg}
        want = {(r, c): str(cell_digit(did, r, c))
                for r in range(R) for c in range(C)}
        assert cells == want


def test_text_pdf_has_no_images():
    """pdf_images on a text-only PDF (the existing writer) is empty —
    the image scan never misfires on content streams."""
    from text_extraction_ray.core.pdf import pdf_images
    from text_extraction_ray.core.pdf_write import PageBuilder, build_pdf

    p = PageBuilder()
    p.text_lines(["not a scan", "just text"])
    assert pdf_images(build_pdf([p])) == []
