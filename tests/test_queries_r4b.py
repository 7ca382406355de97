"""Round-4 batch B: C4 line filter + head-metadata extraction (M26)."""

import duckdb
import pandas as pd
import pytest

from text_extraction_ray.core.html_meta import extract_head_meta

SCALES = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf_dir}/documents.parquet'")
    return con.execute(sql + " ORDER BY doc_id").fetchdf()


@pytest.mark.parametrize("sf_dir", SCALES)
def test_c4_filter_duckdb_parity(ray_session, sf_dir):
    """Ray numpy-reduceat plan == DuckDB lateral-unnest twin, every
    column, and the filter is non-vacuous in both directions (some
    lines kept, some dropped; some docs kept, some dropped)."""
    from text_extraction_ray.pipelines.queries_r4b import (
        SQL_DOCS_C4_FILTER, q_docs_c4_filter)

    got = (q_docs_c4_filter(sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _oracle(sf_dir, SQL_DOCS_C4_FILTER)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert 0 < got.n_kept.sum() < got.n_lines.sum()
    assert 0 < got.doc_keep.sum() < len(got)


@pytest.mark.parametrize("sf_dir", SCALES)
def test_head_meta_duckdb_parity(ray_session, sf_dir):
    """Extracted head fields == the doc_id-derived expected strings
    recomputed in SQL — entity decode, first-wins, quoting/case
    variants and the <body> cutoff all inside the hash."""
    from text_extraction_ray.pipelines.queries_r4b import (
        SQL_PAGES_HEAD_META, q_pages_head_meta)

    got = (q_pages_head_meta(sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _oracle(sf_dir, SQL_PAGES_HEAD_META)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_registry_carries_r4b_queries(ray_session):
    """Registered past the pinned 50-row driver window, with SQL."""
    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    names = list(qs)
    for name in ("docs_c4_filter", "pages_head_meta"):
        assert name in qs and name in osql
        assert names.index(name) >= 50
    assert names[49] == "extract_pages_parity"
    assert names[50] == "extract_pages"


@pytest.mark.parametrize("sf_dir", SCALES)
def test_jsonld_duckdb_parity(ray_session, sf_dir):
    """Extracted JSON-LD fields == doc_id-derived strings in SQL —
    rawtext script scan, @graph unwrap, broken-block skip all inside
    the hash."""
    from text_extraction_ray.pipelines.queries_r4b import (
        SQL_PAGES_JSONLD, q_pages_jsonld)

    got = (q_pages_jsonld(sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _oracle(sf_dir, SQL_PAGES_JSONLD)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_jsonld_units():
    from text_extraction_ray.core.html_meta import extract_jsonld

    # list form, graph form, broken skipped, non-ld ignored, rawtext
    doc = ('<script type="application/ld+json">[{"@type":"A"},'
           '{"@type":"B"}]</script>'
           '<script type="application/ld+json">{"@graph":'
           '[{"@type":"C"}]}</script>'
           '<script type="application/ld+json">nope{</script>'
           '<script>{"@type":"decoy"}</script>')
    assert [n["@type"] for n in extract_jsonld(doc)] == ["A", "B", "C"]
    assert extract_jsonld("") == []
    assert extract_jsonld('<script type="application/ld+json">'
                          '{"a":"unterminated') == []
    # block cap holds on adversarial pages
    many = '<script type="application/ld+json">{"@type":"X"}</script>' * 50
    assert len(extract_jsonld(many)) == 8


# --- head parser units ---------------------------------------------------

def test_head_meta_entities_and_ws():
    h = ("<html lang='EN-us'><head><title> A &amp;\n B &#8212; C </title>"
         "<meta name='description' content='x &lt;y&gt;'></head>")
    m = extract_head_meta(h)
    assert m["title"] == "A & B — C"
    assert m["description"] == "x <y>"
    assert m["lang"] == "en-us"


def test_head_meta_first_wins_and_body_cutoff():
    h = ("<head><title>first</title><title>second</title></head>"
         "<body><title>third</title>"
         "<meta name=description content=late></body>")
    m = extract_head_meta(h)
    assert m["title"] == "first"
    assert m["description"] is None


def test_head_meta_charset_variants():
    assert extract_head_meta('<meta charset="ISO-8859-1">')["charset"] \
        == "iso-8859-1"
    m = extract_head_meta(
        '<meta http-equiv="Content-Type" '
        'content="text/html; charset=Shift_JIS">')
    assert m["charset"] == "shift_jis"


def test_head_meta_canonical_rel_list_and_unquoted():
    m = extract_head_meta(
        '<link rel="alternate canonical" href=https://e.org/a?b=1>')
    assert m["canonical"] == "https://e.org/a?b=1"
    assert extract_head_meta('<link rel="alternate" href="x">')["canonical"] \
        is None


def test_head_meta_total_on_garbage():
    for doc in ("", "<", "<<<>>>", "<head><title>unterminated",
                "\x00\xff<meta name=description content", "a" * 100000):
        m = extract_head_meta(doc)
        assert set(m) == {"title", "description", "og_title",
                          "og_description", "canonical", "lang", "charset"}


def test_head_meta_on_synth_corpus(ray_session, tmp_path):
    """Every utf-8 synth page yields its generated <title> (the writer
    puts one on every HTML page) and the declared charset round-trips."""
    from text_extraction_ray.core.encoding import decode_html, sniff_doc_type
    from text_extraction_ray.sources.synth import make_row

    n_html = n_title = 0
    for i in range(300):
        row = make_row(i)
        if sniff_doc_type(row["html"]) != "html":
            continue
        text, _enc = decode_html(row["html"])
        m = extract_head_meta(text)
        n_html += 1
        if m["title"]:
            n_title += 1
    assert n_html > 100
    # adversarial pages may omit <head>; the regular writer always titles
    assert n_title / n_html > 0.8
