"""Batch AK: full-page scanned-text OCR — DuckDB parity at two scales
plus geometry/robustness invariants."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    return con.execute(sql).df()


def _mset(df: pd.DataFrame):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in r)
                  for r in df[cols].itertuples(index=False, name=None))


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_page_text_matches_duckdb(ray_session, sf_dir):
    from text_extraction_ray.pipelines.queries_r3ak import (
        parity_sql_r3ak, q_scanned_page_text)

    got = q_scanned_page_text(sf_dir).to_pandas()
    want = _duck(sf_dir, parity_sql_r3ak()["scanned_page_text"])
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    assert _mset(got) == _mset(want)


def test_page_noise_is_real_and_recovery_exact():
    """The scan really is degraded (~1% of pixels inverted) and the
    reader still recovers every planted line bit-exactly on a direct
    (no-Ray) pass."""
    import pyarrow as pa

    from text_extraction_ray.functions.table_image import (
        PageTextExtractor, _noise_mask, page_line_text, page_lines,
        render_page_image, synth_page_image_batch)

    w, h, gray = render_page_image(7)
    flips = int(_noise_mask(7, h, w).sum())
    assert 0.003 * w * h < flips < 0.03 * w * h
    batch = pa.table({"doc_id": pa.array(list(range(60)),
                                         type=pa.int64())})
    out = PageTextExtractor()(synth_page_image_batch(batch))
    got = {}
    for i, l, t in zip(out.column("doc_id").to_pylist(),
                       out.column("line").to_pylist(),
                       out.column("text").to_pylist()):
        got[(i, l)] = t
    for i in range(60):
        for l in range(page_lines(i)):
            assert got[(i, l)] == page_line_text(i, l), (i, l)


def test_page_leading_clears_glyph_height():
    """The no-straddle-window guarantee the reader's consume rule
    depends on: PAGE_LEADING >= GLYPH_H and word gaps wider than the
    pitch walk can bridge."""
    from text_extraction_ray.functions.table_image import (
        _PITCH, GLYPH_H, PAGE_LEADING, PAGE_WORD_GAP)

    assert PAGE_LEADING >= GLYPH_H
    assert PAGE_WORD_GAP > _PITCH + 1


def test_consume_rule_blanks_interword_straddles():
    """After reading, every window the word's glyphs or gaps could
    corrupt is consumed: re-running the reader on a clean single-word
    page yields exactly one line, one word."""
    import pyarrow as pa

    from text_extraction_ray.functions.table_image import (
        PageTextExtractor, synth_page_image_batch)

    batch = pa.table({"doc_id": pa.array([3], type=pa.int64())})
    out = PageTextExtractor()(synth_page_image_batch(batch))
    df = out.to_pandas()
    lines = df[df["doc_id"] == 3].sort_values("line")
    # doc 3: 3 + 3 % 4 = 6 lines, no duplicates, contiguous line ids
    assert list(lines["line"]) == list(range(6))


def test_r3ak_registered_as_parity_oracle(ray_session):
    from text_extraction_ray.pipelines.queries import (oracle_sql,
                                                       parity_oracle_names,
                                                       queries)

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    n = "scanned_page_text"
    assert n in qs and n in osql and n in parity_oracle_names()
    assert 50 <= names.index(n) <= len(osql)


def test_skewed_page_text_matches_duckdb(ray_session):
    from text_extraction_ray.pipelines.queries_r3ak import (
        parity_sql_r3ak, q_scanned_page_text_skewed)

    got = q_scanned_page_text_skewed(SF_DIR).to_pandas()
    want = _duck(SF_DIR, parity_sql_r3ak()["scanned_page_text_skewed"])
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    assert _mset(got) == _mset(want)


def test_page_shear_estimator_recovers_every_shear():
    """Every planted shear in ±MAX_SHEAR must be read exactly; the
    estimator may pick an offset-equivalent shear, so the pin is the
    TEXT, not the shear value."""
    import pyarrow as pa

    from text_extraction_ray.functions.table_image import (
        MAX_SHEAR, DeskewingPageTextExtractor, page_line_text, page_lines,
        scan_shear, synth_page_image_skewed_batch)

    ids, seen = [], set()
    i = 0
    while len(seen) < 2 * MAX_SHEAR + 1:
        s = scan_shear(i)
        if s not in seen:
            seen.add(s)
            ids.append(i)
        i += 1
    out = DeskewingPageTextExtractor()(
        synth_page_image_skewed_batch(
            pa.table({"doc_id": pa.array(ids, type=pa.int64())})))
    got = {}
    for d, l, t in zip(out.column("doc_id").to_pylist(),
                       out.column("line").to_pylist(),
                       out.column("text").to_pylist()):
        got[(d, l)] = t
    for d in ids:
        for l in range(page_lines(d)):
            assert got[(d, l)] == page_line_text(d, l), (d, scan_shear(d))


def test_shear_margin_survives_the_noise_lucky_candidate():
    """Doc 4263 (true shear 0) is the recorded counterexample where a
    damaging shear out-scored the truth by 1; the margin rule must read
    it exactly."""
    import numpy as np

    from text_extraction_ray.functions.table_image import (
        DeskewingPageTextExtractor, page_line_text, page_lines,
        render_page_image_skewed)

    ex = DeskewingPageTextExtractor()
    w, h, gray = render_page_image_skewed(4263)
    dark = np.frombuffer(gray, dtype=np.uint8).reshape(h, w) < 128
    lines = ex._read_page(ex._page_dist(dark))
    assert lines == [page_line_text(4263, l)
                     for l in range(page_lines(4263))]
