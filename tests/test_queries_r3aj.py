"""Batch AJ: leakage-free train/test split — DuckDB parity plus the
leak-free invariant (no near-dup pair crosses the split boundary)."""

import math

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF_DIR}/embeddings.parquet'")
    return con.execute(sql).df()


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    return str(v)


def _mset(df: pd.DataFrame):
    cols = sorted(df.columns)
    return sorted(tuple(_norm(v) for v in r)
                  for r in df[cols].itertuples(index=False, name=None))


def test_leakfree_split_matches_duckdb(ray_session):
    from text_extraction_ray.pipelines.queries_r3aj import (
        parity_sql_r3aj, q_docs_leakfree_split)

    got = q_docs_leakfree_split(SF_DIR).to_pandas()
    want = _duck(parity_sql_r3aj()["docs_leakfree_split"])
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    assert _mset(got) == _mset(want)


def test_no_neardup_pair_crosses_the_split(ray_session):
    """The point of the operator: every near-dup pair shares a group
    and therefore a side; both sides are non-trivial; singletons keep
    their own id as group."""
    from text_extraction_ray.pipelines.queries import q_embed_neardup
    from text_extraction_ray.pipelines.queries_r3aj import (
        q_docs_leakfree_split)

    split = q_docs_leakfree_split(SF_DIR).to_pandas()
    by_id = split.set_index("vec_id")
    pairs = q_embed_neardup(SF_DIR).to_pandas()
    assert len(pairs) > 0
    for _, p in pairs.iterrows():
        assert (by_id.loc[p["id_a"], "split"]
                == by_id.loc[p["id_b"], "split"]), (p["id_a"], p["id_b"])
        assert (by_id.loc[p["id_a"], "group_id"]
                == by_id.loc[p["id_b"], "group_id"])
    frac = (split["split"] == "test").mean()
    assert 0.05 < frac < 0.40          # 3/16 expected, corpus is finite
    clustered = set(pairs["id_a"]) | set(pairs["id_b"])
    singles = split[~split["vec_id"].isin(clustered)]
    assert (singles["group_id"] == singles["vec_id"]).all()


def test_r3aj_registered_as_parity_oracle(ray_session):
    from text_extraction_ray.pipelines.queries import (oracle_sql,
                                                       parity_oracle_names,
                                                       queries)

    qs, osql = queries(), oracle_sql()
    names = list(qs)
    n = "docs_leakfree_split"
    assert n in qs and n in osql and n in parity_oracle_names()
    assert 50 <= names.index(n) <= len(osql)


def test_leakfree_split_join_path_equals_broadcast(ray_session, monkeypatch):
    """VERDICT r3 #1: forcing LABEL_BROADCAST_CAP to 0 exercises the
    distributed left_outer label-attach join; identical split table."""
    import text_extraction_ray.pipelines.queries_r3aj as AJ

    base = AJ.q_docs_leakfree_split(SF_DIR).to_pandas()
    monkeypatch.setattr(AJ, "LABEL_BROADCAST_CAP", 0)
    joined = AJ.q_docs_leakfree_split(SF_DIR).to_pandas()
    assert sorted(base.columns) == sorted(joined.columns)
    assert _mset(base) == _mset(joined)
