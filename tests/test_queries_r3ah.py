"""Batch AH: Gopher quality rules, top-bigram repetition signal, and
SemDeDup-style embedding-cluster pruning — DuckDB parity + invariants."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).df()


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    return str(v)


def _mset(df: pd.DataFrame):
    cols = sorted(df.columns)
    return sorted(tuple(_norm(v) for v in r)
                  for r in df[cols].itertuples(index=False, name=None))


@pytest.mark.parametrize("name", ["docs_gopher", "docs_top_bigram_frac",
                                  "semdedup_prune"])
def test_r3ah_matches_duckdb(ray_session, name):
    from text_extraction_ray.pipelines.queries_r3ah import (parity_sql_r3ah,
                                                            queries_r3ah)

    got = queries_r3ah()[name](SF_DIR).to_pandas()
    want = _duck(parity_sql_r3ah()[name])
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    assert _mset(got) == _mset(want), name


def test_gopher_rules_are_nontrivial(ray_session):
    """Each rule must discriminate on this corpus — a rule that always
    passes (or always fails) is untested dead weight."""
    from text_extraction_ray.pipelines.queries_r3ah import (
        GOPHER_MAX_MWL, GOPHER_MAX_WORDS, GOPHER_MIN_MWL, GOPHER_MIN_WORDS,
        q_docs_gopher)

    df = q_docs_gopher(SF_DIR).to_pandas()
    in_words = df["n_words"].between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    in_mwl = df["mean_word_len"].between(GOPHER_MIN_MWL, GOPHER_MAX_MWL)
    stops = df["stop_hits"] >= 2
    for rule in (in_words, in_mwl, stops, df["gopher_ok"]):
        assert 0 < rule.sum() < len(df)
    assert (df["gopher_ok"] == (in_words & in_mwl & stops)).all()


def test_top_bigram_frac_bounds_and_recompute(ray_session):
    """frac in (0, 1]; spot-recompute three docs from raw text."""
    import pyarrow.parquet as pq

    from text_extraction_ray.pipelines.queries_r3ah import (
        q_docs_top_bigram_frac)

    df = q_docs_top_bigram_frac(SF_DIR).to_pandas()
    assert (df["top_bigram_count"] >= 1).all()
    assert (df["top_bigram_count"] <= df["n_bigrams"]).all()
    assert (df["top_bigram_frac"] > 0).all()
    assert (df["top_bigram_frac"] <= 1).all()
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    got = df.set_index("doc_id")
    for _, row in docs.head(3).iterrows():
        w = row["text"].split(" ")
        bigrams = [f"{a} {b}" for a, b in zip(w, w[1:])]
        top = max(bigrams.count(x) for x in set(bigrams))
        assert got.loc[row["doc_id"], "top_bigram_count"] == top
        assert got.loc[row["doc_id"], "n_bigrams"] == len(bigrams)


def test_semdedup_keeps_bucket_minimum_and_prunes_dups(ray_session):
    """Every bucket's min vec_id survives; every pruned id has a kept OR
    pruned lower-id neighbor at cosine >= tau in its bucket (the SQL
    'any earlier' rule, not transitive-keeper); survivors shrink the
    corpus."""
    import pyarrow.parquet as pq

    from text_extraction_ray.pipelines.queries_r3ah import (SEM_BITS,
                                                            SEM_TAU,
                                                            q_semdedup_prune)

    kept = q_semdedup_prune(SF_DIR).to_pandas()
    emb_t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    vid = emb_t.column("vec_id").to_numpy(zero_copy_only=False)
    E = np.stack([np.asarray(e, dtype=np.float64)
                  for e in emb_t.column("embedding").to_pylist()])
    bucket = ((E[:, :SEM_BITS] >= 0).astype(np.int64)
              @ (2 ** np.arange(SEM_BITS, dtype=np.int64)))
    norm = E / np.linalg.norm(E, axis=1, keepdims=True)
    kept_ids = set(kept["vec_id"])
    assert len(kept_ids) < len(vid)
    for b in np.unique(bucket):
        idx = np.where(bucket == b)[0]
        ids = vid[idx]
        assert int(ids.min()) in kept_ids
        S = norm[idx] @ norm[idx].T
        order = np.argsort(ids)
        ids_s, S_s = ids[order], S[np.ix_(order, order)]
        dup = (np.triu(S_s, 1) >= SEM_TAU).any(axis=0)
        for i, d in enumerate(dup):
            assert (int(ids_s[i]) in kept_ids) == (not d)


def test_r3ah_registered_as_parity_oracles(ray_session):
    from text_extraction_ray.pipelines.queries import (oracle_sql,
                                                       parity_oracle_names,
                                                       queries)
    from text_extraction_ray.pipelines.queries_r3ah import queries_r3ah

    qs, osql, par = queries(), oracle_sql(), parity_oracle_names()
    names = list(qs)
    for n in queries_r3ah():
        assert n in qs and n in osql and n in par, n
        # inside the batch-parity block (51..len(oracles)+1), never the
        # pinned 50-row driver window
        assert 50 <= names.index(n) <= len(osql), n
