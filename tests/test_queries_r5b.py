"""Round-5 batch B: EPUB (M44) + MHTML (M45) value-level oracles."""

import duckdb
import pandas as pd
import pytest

SCALES = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def _want(sf_dir: str, sql: str, order: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf_dir}/documents.parquet'")
    return con.execute(sql + " ORDER BY " + order).fetchdf()


@pytest.mark.parametrize("sf_dir", SCALES)
def test_epub_chapters_duckdb_parity(ray_session, sf_dir):
    """Every chapter block recovered through the real OCF/OPF walk
    (mimetype sniff, container.xml rootfile, manifest+spine resolution,
    XHTML through the flagship DOM segmenter) == the doc_id-derived
    expected strings in SQL — entity '&', non-ASCII 'café', stored vs
    deflated containers all inside the hash."""
    from text_extraction_ray.pipelines.queries_r5b import (
        SQL_EPUB_CHAPTERS, q_epub_chapters)

    got = (q_epub_chapters(sf_dir).to_pandas()
           .sort_values(["doc_id", "chap_idx", "blk_idx"])
           .reset_index(drop=True))
    want = _want(sf_dir, SQL_EPUB_CHAPTERS, "doc_id, chap_idx, blk_idx")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # non-vacuous: multi-chapter books + entity + accent survived
    assert (got["chap_idx"] == 1).sum() > 0
    assert got["text"].str.contains("&").sum() > 0
    assert got["text"].str.contains("café").sum() > 0


@pytest.mark.parametrize("sf_dir", SCALES)
def test_mhtml_pages_duckdb_parity(ray_session, sf_dir):
    """One planted spec, two physical plans: the extract_pages_parity
    page transported as an MHTML archive (QP / base64 / 7bit CTEs,
    declared vs sniffed charset) through the REAL extract_pages actor
    pool matches the SAME SQL template — the MIME envelope must be
    extraction-invisible."""
    from text_extraction_ray.pipelines.queries_r5b import (
        _sql_mhtml_pages, q_mhtml_pages)

    got = (q_mhtml_pages(sf_dir).to_pandas()
           .sort_values(["doc_id", "block_idx"]).reset_index(drop=True))
    want = _want(sf_dir, _sql_mhtml_pages(), "doc_id, block_idx")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_dropped"] == 3).all()


def test_registry_carries_r5b_queries(ray_session):
    """Registered past the pinned 50-row driver window, with SQL."""
    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    names = list(qs)
    for name in ("epub_chapters", "mhtml_pages"):
        assert name in qs and name in osql
        assert names.index(name) >= 50
    assert names[49] == "extract_pages_parity"
    assert names[50] == "extract_pages"


@pytest.mark.parametrize("sf_dir", SCALES)
def test_gzip_pages_duckdb_parity(ray_session, sf_dir):
    """Third transport of the planted spec: gzip-wrapped parity pages
    (odd ids with a torn trailer exercising the salvage path) through
    the real actor pool match the SAME SQL template — the gzip
    transport must be extraction-invisible and OUT rows carry the
    INNER doc_type."""
    from text_extraction_ray.pipelines.queries_r5b import (
        _sql_mhtml_pages, q_gzip_pages)

    got = (q_gzip_pages(sf_dir).to_pandas()
           .sort_values(["doc_id", "block_idx"]).reset_index(drop=True))
    want = _want(sf_dir, _sql_mhtml_pages(), "doc_id, block_idx")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("sf_dir", SCALES)
def test_tar_source_stats_duckdb_parity(ray_session, sf_dir):
    """S22: tar shards (plain + gzip, GNU-form names) read back through
    the PAGES-schema source — member name, mtime and body length all
    recompute from doc_id in SQL."""
    from text_extraction_ray.pipelines.queries_r5b import (
        SQL_TAR_SOURCE_STATS, q_tar_source_stats)

    got = (q_tar_source_stats(sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _want(sf_dir, SQL_TAR_SOURCE_STATS, "doc_id")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("sf_dir", SCALES)
def test_ods_cells_duckdb_parity(ray_session, sf_dir):
    """M47: the xls_cells planted grid through the ODF table grammar —
    typed attribute values, stored/deflated packages, repeat handling
    all inside the hash."""
    from text_extraction_ray.pipelines.queries_r5b import (
        SQL_ODS_CELLS, q_ods_cells)

    got = (q_ods_cells(sf_dir).to_pandas()
           .sort_values(["doc_id", "sheet", "row_i", "col_i"])
           .reset_index(drop=True))
    want = _want(sf_dir, SQL_ODS_CELLS, "doc_id, sheet, row_i, col_i")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got["kind"]) == {"s", "n", "b"}


@pytest.mark.parametrize("sf_dir", SCALES)
def test_odp_paragraphs_duckdb_parity(ray_session, sf_dir):
    """M48: the ppt_paragraphs planted spec through the ODF drawing
    grammar — one value spec, two presentation generations; planted
    presenter notes must be excluded for the hash to match."""
    from text_extraction_ray.pipelines.queries_r5b import (
        _sql_odp_paragraphs, q_odp_paragraphs)

    got = (q_odp_paragraphs(sf_dir).to_pandas()
           .sort_values(["doc_id", "slide", "para_idx"])
           .reset_index(drop=True))
    want = _want(sf_dir, _sql_odp_paragraphs(),
                 "doc_id, slide, para_idx")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("sf_dir", SCALES)
def test_text_pages_duckdb_parity(ray_session, sf_dir):
    """M49: plain-text documents through the real actor pool — the
    blank-line paragraph split, ws collapse and span assembly all
    recompute from doc_id in SQL."""
    from text_extraction_ray.pipelines.queries_r5b import (
        SQL_TEXT_PAGES, q_text_pages)

    got = (q_text_pages(sf_dir).to_pandas()
           .sort_values(["doc_id", "block_idx"]).reset_index(drop=True))
    want = _want(sf_dir, SQL_TEXT_PAGES, "doc_id, block_idx")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_routed_mode_covers_round5_doc_types(ray_session):
    """M12 routing for every round-5 type: rows covering epub / mhtml /
    gzip / zstd / ods / odp / tar-derived text / plain text run through
    BOTH physical plans and produce identical OUT rows (the tiny golden
    corpus never draws these narrow bands, so the routed-mode golden
    test alone would leave them unrouted)."""
    import pyarrow as pa
    import ray.data

    from text_extraction_ray.core.encoding import sniff_doc_type
    from text_extraction_ray.pipelines.extraction import extract_pages
    from text_extraction_ray.sources.synth import make_row

    want_types = {"epub", "mhtml", "gzip", "zstd", "ods", "odp", "text"}
    rows = []
    seen = set()
    for i in range(12000):
        row = make_row(i)
        t = sniff_doc_type(row["html"])
        if t in want_types and len([r for r in rows
                                    if r[1] == t]) < 2:
            rows.append((row, t))
            seen.add(t)
        if seen == want_types and len(rows) >= 10:
            break
    assert seen == want_types, f"missing types: {want_types - seen}"
    tbl = pa.table({
        "url": pa.array([r["url"] for r, _ in rows]),
        "warc_ts": pa.array([r["warc_ts"] for r, _ in rows],
                            type=pa.timestamp("us")),
        "html": pa.array([r["html"] for r, _ in rows],
                         type=pa.binary()),
        "lang": pa.array([r["lang"] for r, _ in rows]),
    })
    ds = ray.data.from_arrow(tbl)
    a = (extract_pages(ds, mode="single_pass", concurrency=(1, 2))
         .to_pandas().sort_values("url").reset_index(drop=True))
    b = (extract_pages(ray.data.from_arrow(tbl), mode="routed",
                       concurrency=(1, 2))
         .to_pandas().sort_values("url").reset_index(drop=True))
    assert a["url"].tolist() == b["url"].tolist()
    assert a["extracted_text"].tolist() == b["extracted_text"].tolist()
    assert a["doc_type"].tolist() == b["doc_type"].tolist()
    # every row extracted real text through its own route
    assert set(a["doc_type"]) >= (want_types - {"gzip", "zstd"})
    assert (a["extracted_text"].str.len() > 0).all()


@pytest.mark.parametrize("sf_dir", SCALES)
def test_cross_label_align_duckdb_parity(ray_session, sf_dir):
    """E7: max-cosine neighbour with a DIFFERENT label (the bitext
    alignment shape) — argmax on the 4dp-rounded cosine with a
    lowest-id tiebreak, so both engines decide identically."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * "
                f"FROM '{sf_dir}/embeddings.parquet'")
    from text_extraction_ray.pipelines.queries_r5b import (
        SQL_CROSS_LABEL_ALIGN, q_cross_label_align)

    got = (q_cross_label_align(sf_dir).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    want = (con.execute(SQL_CROSS_LABEL_ALIGN + " ORDER BY vec_id")
            .fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # non-vacuous: matches always carry a different label
    lab = con.execute(
        f"SELECT vec_id, label FROM '{sf_dir}/embeddings.parquet'"
    ).fetchdf().set_index("vec_id")["label"]
    assert (lab.loc[got["vec_id"]].values
            != lab.loc[got["match_id"]].values).all()
