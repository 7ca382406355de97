"""Batch-O: PQ ANN recall/compression + malformed-row source
tolerance."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"


def _to_pandas(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


def test_ann_pq_recall_vs_bruteforce(ray_session):
    """PQ top-10 recovers most of the exact top-10 (8-bit codes, 32x
    compression; recall >= 0.6 here, and the exact top-1 must
    survive)."""
    from text_extraction_ray.pipelines.queries import (
        SQL_ANN_TOP10,
        q_ann_top10,
    )
    from text_extraction_ray.pipelines.queries_r3o import q_ann_pq

    exact = set(_to_pandas(q_ann_top10(SF_DIR)).vec_id)
    got = _to_pandas(q_ann_pq(SF_DIR))
    assert len(got) == 10
    recall = len(exact & set(got.vec_id)) / 10
    assert recall >= 0.6, recall
    top1 = _to_pandas(q_ann_top10(SF_DIR)).vec_id.iloc[0]
    assert top1 in set(got.vec_id)


def test_ann_pq_deterministic(ray_session):
    from text_extraction_ray.pipelines.queries_r3o import q_ann_pq

    a = _to_pandas(q_ann_pq(SF_DIR))
    b = _to_pandas(q_ann_pq(SF_DIR))
    assert a.vec_id.tolist() == b.vec_id.tolist()
    assert a.cos_pq.tolist() == b.cos_pq.tolist()


def test_pq_compression_factor(ray_session):
    """Codes are m uint8 per vector: 8 B vs 64 float64/float32 dims."""
    import ray as _ray

    from text_extraction_ray.functions.similarity import (
        _PQ_M,
        pq_encode_factory,
        pq_train,
    )
    from text_extraction_ray.pipelines.queries import read_table

    ds = read_table(SF_DIR, "embeddings", ["vec_id", "embedding"])
    sample = ds.limit(256).take_batch(256, batch_format="pyarrow")
    mat = np.array(sample.column("embedding").to_pylist())
    books = pq_train(mat)
    enc = _to_pandas(ds.map_batches(pq_encode_factory(books),
                                    batch_format="pyarrow"))
    assert len(enc) == ds.count()
    assert all(len(c) == _PQ_M for c in enc.code)
    assert all(max(c) < 256 for c in enc.code)


def test_r3o_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3o import queries_r3o

    qs, osql = queries(), oracle_sql()
    for n in queries_r3o():
        assert n in qs and n not in osql, n
    assert list(qs)[49:51] == ["extract_pages_parity", "extract_pages"]


def test_jsonl_malformed_lines_skip_and_count(ray_session, tmp_path):
    """Two corrupt lines in a jsonl shard: the job completes and every
    clean row extracts (the skip-count warning fires worker-side, which
    caplog can't observe)."""
    from text_extraction_ray.pipelines.job import (
        read_output,
        run_extraction_job,
    )
    from text_extraction_ray.sources.jsonl import write_jsonl
    from text_extraction_ray.sources.synth import gen_corpus

    pdir = str(tmp_path / "pq_in")
    gen_corpus(pdir, 30, seed=42, n_shards=1)
    shard = [f for f in os.listdir(pdir) if f.endswith(".parquet")][0]
    rows = pq.read_table(os.path.join(pdir, shard)).to_pylist()
    jdir = str(tmp_path / "jl")
    os.makedirs(jdir)
    jpath = os.path.join(jdir, "s0.jsonl")
    write_jsonl(jpath, rows)
    with open(jpath, "a", encoding="utf-8") as fh:
        fh.write("{truncated json\n")
        fh.write('{"url": "x", "warc_ts": "not-a-date", '
                 '"html_b64": ""}\n')
    out = str(tmp_path / "out")
    run_extraction_job(jdir, out, None, concurrency=(1, 2))
    got = read_output(out).to_pandas()
    assert len(got) == 30


def test_csv_malformed_rows_skip(ray_session, tmp_path):
    """Corrupt CSV rows skip; clean rows survive byte-identically."""
    import base64
    import csv

    from text_extraction_ray.pipelines.job import (
        read_output,
        run_extraction_job,
    )
    from text_extraction_ray.sources.synth import gen_corpus

    pdir = str(tmp_path / "pq_in")
    gen_corpus(pdir, 20, seed=42, n_shards=1)
    shard = [f for f in os.listdir(pdir) if f.endswith(".parquet")][0]
    rows = pq.read_table(os.path.join(pdir, shard)).to_pylist()
    cdir = str(tmp_path / "csv")
    os.makedirs(cdir)
    with open(os.path.join(cdir, "s0.csv"), "w", newline="",
              encoding="utf-8") as fh:
        w = csv.DictWriter(
            fh, fieldnames=["url", "warc_ts", "html_b64", "lang"])
        w.writeheader()
        for i, r in enumerate(rows):
            w.writerow({
                "url": r["url"],
                "warc_ts": ("BAD-TS" if i == 3
                            else r["warc_ts"].isoformat()),
                "html_b64": base64.b64encode(r["html"] or b"").decode(),
                "lang": r.get("lang", "") or "",
            })
    out = str(tmp_path / "out")
    run_extraction_job(cdir, out, None, concurrency=(1, 2))
    got = read_output(out).to_pandas()
    assert len(got) == 19
    assert rows[3]["url"] not in set(got.url)
