"""Block-explain debug table + CSV sink parity tests."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory, ray_session):
    from text_extraction_ray.sources.synth import gen_corpus

    d = str(tmp_path_factory.mktemp("explain_corpus"))
    gen_corpus(d, 120, seed=42, n_shards=4)
    return d


def test_explain_good_blocks_reassemble_extraction(corpus_dir, ray_session):
    """The debug table is tied to the byte contract: joining cls=='good'
    block texts with the JOINER must reproduce extracted_text per url."""
    from text_extraction_ray.params import JOINER
    from text_extraction_ray.pipelines.analysis import explain_blocks
    from text_extraction_ray.pipelines.extraction import (
        EXTRACT_COLUMNS,
        extract_pages,
        read_pages,
    )

    out = extract_pages(read_pages(corpus_dir, columns=EXTRACT_COLUMNS),
                        mode="single_pass", concurrency=(1, 4),
                        batch_size=32).to_pandas()
    # urls repeat across re-crawls: key everything by (url, warc_ts)
    html = out[out["doc_type"] == "html"].set_index(["url", "warc_ts"])
    assert len(html) > 20

    blocks = explain_blocks(read_pages(corpus_dir),
                            concurrency=(1, 4)).to_pandas()
    assert set(blocks["cls"]) <= {"good", "bad"}  # phase 2 resolves all
    rebuilt = (
        blocks[blocks["cls"] == "good"]
        .sort_values(["url", "warc_ts", "block_id"])
        .groupby(["url", "warc_ts"])["text"]
        .apply(lambda s: JOINER.join(s))
    )
    for key, row in html.iterrows():
        assert rebuilt.get(key, "") == row["extracted_text"], key
    # every html page appears in the block table (even all-dropped ones)
    keys = set(zip(blocks["url"], blocks["warc_ts"]))
    assert set(html.index) <= keys


def test_job_csv_output_matches_parquet(corpus_dir, tmp_path, ray_session):
    from text_extraction_ray.pipelines.job import run_extraction_job

    pdir, cdir = str(tmp_path / "pq"), str(tmp_path / "csv")
    run_extraction_job(corpus_dir, pdir, concurrency=2)
    summary = run_extraction_job(corpus_dir, cdir, concurrency=2,
                                 output_format="csv")
    assert summary["partitions_run"] == 4

    csv_types = {
        "url": pa.string(), "lang": pa.string(), "doc_type": pa.string(),
        "extracted_text": pa.string(), "spans": pa.string(),
        "error": pa.string(), "n_blocks_kept": pa.int64(),
        "n_blocks_dropped": pa.int64(), "parse_ok": pa.bool_(),
    }

    def read_csv(p):
        return pacsv.read_csv(
            p, convert_options=pacsv.ConvertOptions(
                column_types=csv_types, strings_can_be_null=False))

    def read_all(root, ext, reader):
        parts = []
        for part in sorted(os.listdir(root)):
            p = os.path.join(root, part, f"data.{ext}")
            if part.startswith("part=") and os.path.exists(p):
                parts.append(reader(p))
        return pa.concat_tables(parts)

    t_pq = read_all(pdir, "parquet", pq.read_table)
    t_csv = read_all(cdir, "csv", read_csv)
    assert t_csv.num_rows == t_pq.num_rows
    assert t_csv.column("url").to_pylist() == t_pq.column("url").to_pylist()
    assert (t_csv.column("extracted_text").to_pylist()
            == [t or "" for t in t_pq.column("extracted_text").to_pylist()]) or (
        [t or "" for t in t_csv.column("extracted_text").to_pylist()]
        == [t or "" for t in t_pq.column("extracted_text").to_pylist()])
    # spans survive as JSON
    spans_csv = [json.loads(s) for s in t_csv.column("spans").to_pylist()]
    spans_pq = [[[d["start"], d["end"]] for d in row]
                for row in t_pq.column("spans").to_pylist()]
    assert [[[s["start"], s["end"]] for s in row] for row in spans_csv] == spans_pq


def test_csv_job_resumes(corpus_dir, tmp_path, ray_session):
    from text_extraction_ray.pipelines.job import run_extraction_job

    cdir = str(tmp_path / "csv2")
    run_extraction_job(corpus_dir, cdir, concurrency=2, output_format="csv")
    again = run_extraction_job(corpus_dir, cdir, concurrency=2,
                               output_format="csv")
    assert again["partitions_run"] == 0
    assert again["partitions_skipped"] == 4


def test_dedup_and_report_postpass(corpus_dir, tmp_path, ray_session):
    import glob

    from text_extraction_ray.pipelines.job import (
        dedup_output,
        report_output,
        run_extraction_job,
    )

    out = str(tmp_path / "out")
    run_extraction_job(corpus_dir, out, concurrency=2)
    ddir = dedup_output(out)
    raw_urls = []
    for p in glob.glob(os.path.join(out, "part=*", "data.parquet")):
        raw_urls += pq.read_table(p, columns=["url"]).column("url").to_pylist()
    ded = pa.concat_tables(
        [pq.read_table(p) for p in glob.glob(os.path.join(ddir, "*.parquet"))])
    assert ded.num_rows == len(set(raw_urls))
    assert len(set(ded.column("url").to_pylist())) == ded.num_rows

    rep = report_output(out)
    assert {r["doc_type"] for r in rep["doc_types"]} >= {"html"}
    assert sum(r["n_docs"] for r in rep["doc_types"]) == len(raw_urls)
    assert rep["length_histogram"]


def test_job_jsonl_output_matches_parquet(corpus_dir, tmp_path, ray_session):
    """Round 2 S-coverage: the JSONL sink round-trips the OUT rows (url,
    bytes, spans, timestamps) against the parquet run, and the jsonl job
    resumes."""
    from text_extraction_ray.pipelines.job import run_extraction_job

    pdir, jdir = str(tmp_path / "pq_j"), str(tmp_path / "jsonl")
    run_extraction_job(corpus_dir, pdir, concurrency=2)
    summary = run_extraction_job(corpus_dir, jdir, concurrency=2,
                                 output_format="jsonl")
    assert summary["partitions_run"] == 4

    def read_all_jsonl(root):
        rows = []
        for part in sorted(os.listdir(root)):
            p = os.path.join(root, part, "data.jsonl")
            if part.startswith("part=") and os.path.exists(p):
                with open(p, encoding="utf-8") as fh:
                    rows.extend(json.loads(line) for line in fh)
        return rows

    def read_all_pq(root):
        parts = []
        for part in sorted(os.listdir(root)):
            p = os.path.join(root, part, "data.parquet")
            if part.startswith("part=") and os.path.exists(p):
                parts.append(pq.read_table(p))
        return pa.concat_tables(parts)

    jrows = read_all_jsonl(jdir)
    t_pq = read_all_pq(pdir)
    assert len(jrows) == t_pq.num_rows
    assert [r["url"] for r in jrows] == t_pq.column("url").to_pylist()
    assert ([r["extracted_text"] for r in jrows]
            == t_pq.column("extracted_text").to_pylist())
    # timestamps survive as full isoformat
    import datetime as dtm

    assert ([dtm.datetime.fromisoformat(r["warc_ts"]) for r in jrows]
            == t_pq.column("warc_ts").to_pylist())
    # spans survive as JSON structures
    assert ([[[s["start"], s["end"]] for s in r["spans"]] for r in jrows]
            == [[[d["start"], d["end"]] for d in row]
                for row in t_pq.column("spans").to_pylist()])

    again = run_extraction_job(corpus_dir, jdir, concurrency=2,
                               output_format="jsonl")
    assert again["partitions_run"] == 0 and again["partitions_skipped"] == 4


def test_jsonl_report_matches_parquet_report(corpus_dir, tmp_path,
                                             ray_session):
    """read_output(jsonl) feeds the same QA report as the parquet run."""
    from text_extraction_ray.pipelines.job import (
        report_output,
        run_extraction_job,
    )

    pdir, jdir = str(tmp_path / "rep_pq"), str(tmp_path / "rep_jsonl")
    run_extraction_job(corpus_dir, pdir, concurrency=2)
    run_extraction_job(corpus_dir, jdir, concurrency=2,
                       output_format="jsonl")
    rp = report_output(pdir, "parquet")
    rj = report_output(jdir, "jsonl")
    assert rp["doc_types"] == rj["doc_types"]
    assert rp["per_lang"] == rj["per_lang"]
    assert rp["length_histogram"] == rj["length_histogram"]
