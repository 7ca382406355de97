"""Batch-AF: noisy-image table extraction (cell-grid + template OCR)."""

import duckdb
import numpy as np
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.001"


def test_image_tables_match_duckdb(ray_session):
    """The full driver-shaped check at two scales: Ray pipeline ==
    DuckDB oracle on rows, schema and values."""
    from text_extraction_ray.pipelines.queries_r3af import (
        SQL_IMAGE_TABLES, q_image_tables)

    for sf in (SF_DIR, "/root/testdata/sf0.01"):
        got = (q_image_tables(sf).to_pandas()
               .sort_values(["doc_id", "r", "c"]).reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf}/documents.parquet'")
        want = con.execute(
            SQL_IMAGE_TABLES + " ORDER BY doc_id, r, c").fetchdf()
        assert got["cell"].tolist() == want["cell"].tolist()
        assert (got["doc_id"].tolist() == want["doc_id"].tolist()
                and got["r"].tolist() == want["r"].tolist()
                and got["c"].tolist() == want["c"].tolist())
        assert len(got) > 0


def test_image_tables_text_match_duckdb(ray_session):
    """Multi-digit (string-reading) variant: same driver-shaped DuckDB
    parity at two scales — the rows-only registry entry's pytest pin."""
    from text_extraction_ray.pipelines.queries_r3af import (
        SQL_IMAGE_TABLES_TEXT, q_image_tables_text)

    for sf in (SF_DIR, "/root/testdata/sf0.01"):
        got = (q_image_tables_text(sf).to_pandas()
               .sort_values(["doc_id", "r", "c"]).reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf}/documents.parquet'")
        want = con.execute(
            SQL_IMAGE_TABLES_TEXT + " ORDER BY doc_id, r, c").fetchdf()
        assert got["cell"].tolist() == want["cell"].tolist()
        assert len(got) > 0
        # the point of the variant: most cells are multi-glyph
        assert (got["cell"].str.len() > 1).mean() > 0.8


def test_string_reader_handles_all_lengths():
    """1-, 2- and 3-digit cells all read exactly (walk stops at the
    number's true edges in both directions)."""
    import pyarrow as pa

    from text_extraction_ray.functions.table_image import (
        TableStringExtractor, cell_value2, synth_table_image2_batch,
        table_shape)

    # doc ids chosen so the corpus of cells covers 1-3 digit values
    ids = [0, 1, 2, 3, 14, 143, 1430, 7777]
    lens = set()
    ex = TableStringExtractor()
    out = ex(synth_table_image2_batch(
        pa.table({"doc_id": pa.array(ids, pa.int64())})))
    got = {(d, r, c): v for d, r, c, v in zip(
        out.column("doc_id").to_pylist(), out.column("r").to_pylist(),
        out.column("c").to_pylist(), out.column("cell").to_pylist())}
    for d in ids:
        R, C = table_shape(d)
        for r in range(R):
            for c in range(C):
                want = str(cell_value2(d, r, c))
                assert got[(d, r, c)] == want, (d, r, c)
                lens.add(len(want))
    assert lens == {1, 2, 3}


def test_image_tables_skewed_match_duckdb(ray_session):
    """Skewed scans (planted ±4-px row shear) still extract exactly:
    the deskewing extractor's output equals the same DuckDB spec the
    unskewed query matches."""
    from text_extraction_ray.pipelines.queries_r3af import (
        SQL_IMAGE_TABLES, q_image_tables_skewed)

    for sf in (SF_DIR, "/root/testdata/sf0.01"):
        got = (q_image_tables_skewed(sf).to_pandas()
               .sort_values(["doc_id", "r", "c"]).reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf}/documents.parquet'")
        want = con.execute(
            SQL_IMAGE_TABLES + " ORDER BY doc_id, r, c").fetchdf()
        assert got["cell"].tolist() == want["cell"].tolist()
        assert len(got) > 0


def test_deskew_estimates_the_planted_shear():
    """The shear estimator recovers the exact planted value for every
    shear in the ±MAX_SHEAR range (not just 'reads ok by luck')."""
    from text_extraction_ray.functions.table_image import (
        MAX_SHEAR, DeskewingTableExtractor, scan_shear,
        synth_table_image_skewed_batch)

    ex = DeskewingTableExtractor()
    seen = set()
    did = 0
    while len(seen) < 2 * MAX_SHEAR + 1:
        s = scan_shear(did)
        if s not in seen:
            ex(_skewed_batch(did))
            assert ex.last_shear == s, (did, s, ex.last_shear)
            seen.add(s)
        did += 1
    assert seen == set(range(-MAX_SHEAR, MAX_SHEAR + 1))


def _skewed_batch(doc_id: int) -> pa.Table:
    from text_extraction_ray.functions.table_image import \
        synth_table_image_skewed_batch

    return synth_table_image_skewed_batch(
        pa.table({"doc_id": pa.array([doc_id], pa.int64())}))


def test_noise_is_real_and_survived():
    """The planted salt-and-pepper noise actually flips pixels (the
    'noisy' in noisy-image extraction is not vacuous), including some
    inside cell interiors, and extraction is still exact."""
    from text_extraction_ray.functions.table_image import (
        TableImageExtractor, cell_digit, render_table_image,
        table_shape)

    ex = TableImageExtractor()
    total_flips = 0
    for did in range(60):
        w, h, gray = render_table_image(did)
        img = np.frombuffer(gray, dtype=np.uint8).reshape(h, w)
        # a noise-free render for comparison
        clean = _render_clean(did)
        flips = int((img != clean).sum())
        assert flips > 0, f"doc {did}: no noise at all"
        total_flips += flips
        R, C = table_shape(did)
        got = ex(_as_media_batch(did))
        cells = {(r, c): v for r, c, v in zip(
            got.column("r").to_pylist(), got.column("c").to_pylist(),
            got.column("cell").to_pylist())}
        want = {(r, c): str(cell_digit(did, r, c))
                for r in range(R) for c in range(C)}
        assert cells == want, did
    # ~1% of pixels flip on average
    assert total_flips > 60 * 10


def _render_clean(doc_id: int) -> np.ndarray:
    """Re-render without the noise pass (mirrors render_table_image)."""
    from text_extraction_ray.functions import table_image as ti

    R, C = ti.table_shape(doc_id)
    w = 2 * ti.MARGIN + 1 + C * (ti.CELL_W + 1)
    h = 2 * ti.MARGIN + 1 + R * (ti.CELL_H + 1)
    img = np.full((h, w), 255, dtype=np.uint8)
    ys = [ti.MARGIN + k * (ti.CELL_H + 1) for k in range(R + 1)]
    xs = [ti.MARGIN + k * (ti.CELL_W + 1) for k in range(C + 1)]
    for y in ys:
        img[y, xs[0]:xs[-1] + 1] = 0
    for x in xs:
        img[ys[0]:ys[-1] + 1, x] = 0
    font = ti.font_tensor()
    for r in range(R):
        for c in range(C):
            g = font[ti.cell_digit(doc_id, r, c)]
            y0, x0 = ys[r] + 3, xs[c] + 4
            cell = img[y0:y0 + ti.GLYPH_H, x0:x0 + ti.GLYPH_W]
            cell[g] = 0
    return img


def _as_media_batch(doc_id: int) -> pa.Table:
    from text_extraction_ray.functions.table_image import \
        synth_table_image_batch

    return synth_table_image_batch(
        pa.table({"doc_id": pa.array([doc_id], pa.int64())}))


def test_all_three_containers_cycle():
    from text_extraction_ray.functions.table_image import \
        synth_table_image_batch

    b = synth_table_image_batch(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64())}))
    assert b.column("media_type").to_pylist() == [
        "image/bmp", "image/png", "image/gif"]


def test_ruling_lines_profile():
    from text_extraction_ray.functions.table_image import _ruling_lines

    frac = np.array([0.0, 0.9, 0.05, 0.1, 0.95, 1.0, 0.2, 0.0])
    assert _ruling_lines(frac) == [1, 4]          # run centers
    assert _ruling_lines(np.zeros(5)) == []
    assert _ruling_lines(np.ones(3)) == [1]       # run touching the edge
