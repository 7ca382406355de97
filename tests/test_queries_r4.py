"""Round-4 batch: registry-facing filter-chain parity query."""

import duckdb


def test_pdf_filter_parity_matches_duckdb(ray_session):
    """Driver-shaped DuckDB parity at two scales: every document's page
    content extracts to ONE distinct text across all six stream-filter
    encodings (the self-verifying constant-row oracle)."""
    from text_extraction_ray.pipelines.queries_r4 import (
        SQL_PDF_FILTER_PARITY, q_pdf_filter_parity)

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = (q_pdf_filter_parity(sf).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS "
                    f"SELECT * FROM '{sf}/documents.parquet'")
        want = con.execute(
            SQL_PDF_FILTER_PARITY + " ORDER BY doc_id").fetchdf()
        assert len(got) == len(want) > 0
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert (got["n_variants"] == 6).all()
        assert (got["n_distinct"] == 1).all()
        assert got["has_text"].all()


def test_pdf_encrypt_parity_matches_duckdb(ray_session):
    """Driver-shaped DuckDB parity at two scales: every document's page
    content extracts to ONE distinct text across plaintext, RC4-40,
    RC4-128 (± Flate) and AES-128 /AESV2 (± Flate) standard-security
    encryptions (M10f/M10g)."""
    from text_extraction_ray.pipelines.queries_r4 import (
        SQL_PDF_ENCRYPT_PARITY, q_pdf_encrypt_parity)

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = (q_pdf_encrypt_parity(sf).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS "
                    f"SELECT * FROM '{sf}/documents.parquet'")
        want = con.execute(
            SQL_PDF_ENCRYPT_PARITY + " ORDER BY doc_id").fetchdf()
        assert len(got) == len(want) > 0
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert (got["n_variants"] == 6).all()
        assert (got["n_distinct"] == 1).all()
        assert got["has_text"].all()


def test_registry_carries_r4_parity_queries(ray_session):
    """Registered past the pinned 50-row driver window, with SQL."""
    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    names = list(qs)
    for name in ("pdf_filter_parity", "pdf_encrypt_parity"):
        assert name in qs and name in osql
        assert names.index(name) >= 50
    # round-5 window layout: extract_pages_parity closes the 50-row
    # window (50/50 oracled), extract_pages sits first past it
    assert names[49] == "extract_pages_parity"
    assert names[50] == "extract_pages"
