"""Batch-P parity: dup-ngram fraction, temperature resample, packing."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.01"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    return con.execute(sql).df()


def _to_pandas(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    sc = sorted(df.columns)
    return df[sc].sort_values(sc).reset_index(drop=True)


def _assert_same(got, want):
    g, w = _norm(_to_pandas(got)), _norm(want)
    assert g.shape == w.shape
    for c in g.columns:
        if np.issubdtype(g[c].dtype, np.floating):
            assert np.allclose(g[c].to_numpy(),
                               w[c].to_numpy(dtype=float), atol=1e-9), c
        else:
            assert g[c].tolist() == w[c].tolist(), c


def test_dup_ngrams_matches_duckdb(ray_session):
    from text_extraction_ray.pipelines.queries_r3p import (
        SQL_DOCS_DUP_NGRAMS,
        q_docs_dup_ngrams,
    )

    _assert_same(q_docs_dup_ngrams(SF_DIR), _duck(SQL_DOCS_DUP_NGRAMS))


def test_dup_ngrams_planted_duplicates():
    """Gram hashes: two docs sharing an exact 6-token run share exactly
    2 gram hashes; a unique doc shares none; within-doc repetition
    keeps multiplicity."""
    from text_extraction_ray.pipelines.queries_r3p import _doc_gram_hashes

    shared = "alpha beta gamma delta epsilon zeta"
    texts = [shared + " one two three",
             "x y " + shared,
             "totally unique words only here now",
             "a b a b a b a b a b"]
    out = dict(_doc_gram_hashes(texts))
    assert set(out) == {0, 1, 2, 3}
    assert len(set(out[0]) & set(out[1])) == 2   # 6-token run → 2 5-grams
    assert not set(out[2]) & (set(out[0]) | set(out[1]))
    # doc 3: 10 tokens → 6 grams but only 2 distinct ('a b a b a'/'b a b a b')
    assert out[3].size == 6 and np.unique(out[3]).size == 2


def test_dup_ngrams_join_path_matches_broadcast(ray_session, monkeypatch):
    """Force the distributed-join fallback (cap=0) and pin it to the
    broadcast path's result — the adaptive switch must be invisible."""
    from text_extraction_ray.pipelines import queries_r3p as m

    base = _norm(_to_pandas(m.q_docs_dup_ngrams(SF_DIR)))
    monkeypatch.setattr(m, "DUP_BROADCAST_CAP", 0)
    forced = _norm(_to_pandas(m.q_docs_dup_ngrams(SF_DIR)))
    assert base.shape == forced.shape
    assert (base.doc_id.tolist() == forced.doc_id.tolist()
            and base.n_grams.tolist() == forced.n_grams.tolist())
    assert np.allclose(base.dup_frac, forced.dup_frac, atol=1e-9)


def test_lang_resample_matches_duckdb(ray_session):
    from text_extraction_ray.pipelines.queries_r3p import (
        SQL_DOCS_LANG_RESAMPLE,
        q_docs_lang_resample,
    )

    _assert_same(q_docs_lang_resample(SF_DIR),
                 _duck(SQL_DOCS_LANG_RESAMPLE))


def test_lang_resample_flattens_mix(ray_session):
    """Smallest language keeps everything; kept counts approximate
    c_min^(1-a) * c_l^a, so the kept histogram is flatter than the
    input histogram."""
    from text_extraction_ray.pipelines.queries_r3p import (
        q_docs_lang_resample,
    )

    inp = _duck("SELECT lang, COUNT(*) n FROM documents GROUP BY 1"
                ).set_index("lang").n
    kept = (_to_pandas(q_docs_lang_resample(SF_DIR))
            .groupby("lang").size())
    cmin = inp.min()
    assert kept[inp.idxmin()] == cmin
    for lang in inp.index:
        expect = np.sqrt(cmin * inp[lang])
        assert abs(kept[lang] - expect) <= max(6, 0.25 * expect), lang
    # flatter: max/min ratio strictly shrinks
    assert kept.max() / kept.min() < inp.max() / inp.min()


def test_lang_thresholds_bit_exact_vs_duckdb():
    """The hex thresholds themselves are bit-identical to DuckDB's
    float chain (the determinism the keep rule relies on)."""
    from text_extraction_ray.pipelines.queries_r3p import (
        lang_keep_thresholds,
    )

    counts = {"en": 1930, "fr": 820, "es": 807, "zh": 743, "de": 71}
    thr = lang_keep_thresholds(counts)
    con = duckdb.connect()
    for lang, n in counts.items():
        want = con.execute(
            "SELECT lpad(lower(hex(CAST(FLOOR(sqrt(? / CAST(? AS DOUBLE))"
            " * 4294967296.0) AS BIGINT))), 8, '0')",
            [min(counts.values()), n]).fetchone()[0]
        if thr[lang] is None:
            assert n == min(counts.values())
        else:
            assert thr[lang] == want, lang


def test_pack_blocks_matches_duckdb(ray_session):
    from text_extraction_ray.pipelines.queries_r3p import (
        SQL_DOCS_PACK_BLOCKS,
        q_docs_pack_blocks,
    )

    _assert_same(q_docs_pack_blocks(SF_DIR), _duck(SQL_DOCS_PACK_BLOCKS))


def test_pack_blocks_invariants(ray_session):
    """block_id non-decreasing in doc_id order; every block except the
    last spans ≥ cap tokens counted from its first doc's offset; the
    global token prefix is consistent (sum of n_tokens before block b's
    first doc == first prev of that block)."""
    from text_extraction_ray.pipelines.queries_r3p import (
        PACK_CAP,
        q_docs_pack_blocks,
    )

    df = _to_pandas(q_docs_pack_blocks(SF_DIR)).sort_values(
        "doc_id").reset_index(drop=True)
    b = df.block_id.to_numpy()
    assert (np.diff(b) >= 0).all()
    prev = np.concatenate(([0], np.cumsum(df.n_tokens.to_numpy())[:-1]))
    assert (df.block_id.to_numpy() == prev // PACK_CAP).all()


def test_r3p_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3p import (parity_sql_r3p,
                                                           queries_r3p)

    qs, osql = queries(), oracle_sql()
    par = set(parity_sql_r3p())
    for name in queries_r3p():
        assert name in qs
        # oracles since the round-3 parity merge; the pinned 50-row
        # driver window is unchanged (they sit at positions 51-105)
        assert (name in osql) == (name in par), name


def test_dup_ngrams_broadcast_path_has_no_doc_shuffle(ray_session):
    """The scoring pass of the broadcast path must be scan-shaped: the
    only shuffle in the whole plan is the DF aggregate (already
    materialized before scoring), never a doc-keyed exchange."""
    from text_extraction_ray.pipelines.queries_r3p import q_docs_dup_ngrams

    out = q_docs_dup_ngrams("/root/testdata/sf0.001").materialize()
    stats = out.stats()
    for op in ("Sort", "Aggregate", "Shuffle", "Repartition", "Join"):
        assert op not in stats, f"unexpected {op} in:\n{stats[:800]}"
    assert "MapBatches" in stats and "ReadParquet" in stats
