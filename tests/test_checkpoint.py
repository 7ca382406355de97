"""Checkpoint/manifest unit tests (SURVEY SS4.4): atomicity, params-hash
guard, pruning semantics.  No Ray needed."""

from __future__ import annotations

import json
import os

import pyarrow as pa

from text_extraction_ray.state.checkpoint import (
    load_manifest,
    manifest_file,
    partition_is_done,
    partition_out_dir,
    prune_done,
    sha256_of_column,
    sum_counters,
    write_atomic_parquet,
    write_manifest,
)


def _make_done(tmp_path, pid, shard="in.parquet"):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    table = pa.table({"url": ["a", "b"], "extracted_text": ["x", "y"]})
    write_atomic_parquet(
        table, os.path.join(partition_out_dir(out, pid), "data.parquet"))
    write_manifest(ckpt, pid, input_fragments=[shard], row_count=2,
                   sha256=sha256_of_column(table, "extracted_text"),
                   counters={"docs_out": 2})
    return out, ckpt


def test_atomic_write_no_tmp_left(tmp_path):
    out, _ = _make_done(tmp_path, 0)
    d = partition_out_dir(out, 0)
    assert os.listdir(d) == ["data.parquet"]


def test_done_and_prune(tmp_path):
    out, ckpt = _make_done(tmp_path, 0)
    assert partition_is_done(ckpt, 0, out, ["in.parquet"])
    # unknown fragment set → not done
    assert not partition_is_done(ckpt, 0, out, ["other.parquet"])
    # missing output file → not done
    assert not partition_is_done(ckpt, 1, out, ["in.parquet"])
    pending = prune_done(["in.parquet", "in2.parquet"], out, ckpt)
    assert pending == [(1, "in2.parquet")]


def test_params_hash_guard(tmp_path):
    out, ckpt = _make_done(tmp_path, 0)
    m = load_manifest(ckpt, 0)
    m["params_hash"] = "stale"
    with open(manifest_file(ckpt, 0), "w") as fh:
        json.dump(m, fh)
    assert not partition_is_done(ckpt, 0, out, ["in.parquet"])


def test_corrupt_manifest_is_not_done(tmp_path):
    out, ckpt = _make_done(tmp_path, 0)
    with open(manifest_file(ckpt, 0), "w") as fh:
        fh.write("{not json")
    assert not partition_is_done(ckpt, 0, out, ["in.parquet"])


def test_sum_counters(tmp_path):
    _, ckpt = _make_done(tmp_path, 0)
    _make_done(tmp_path, 1)
    totals = sum_counters(ckpt)
    assert totals["partitions"] == 2
    assert totals["docs_out"] == 4


def test_sha_is_order_dependent():
    t1 = pa.table({"t": ["a", "b"]})
    t2 = pa.table({"t": ["b", "a"]})
    assert sha256_of_column(t1, "t") != sha256_of_column(t2, "t")


def test_write_atomic_jsonl_roundtrip(tmp_path):
    """JSONL sink unit: atomic (no .tmp left), nested + timestamp columns
    survive a json roundtrip."""
    import datetime as dt
    import json
    import os

    from text_extraction_ray.state.checkpoint import write_atomic_jsonl

    t = pa.table({
        "url": pa.array(["u1", "u2"]),
        "warc_ts": pa.array([dt.datetime(2024, 1, 1, 12, 0, 0, 123456),
                             dt.datetime(2024, 6, 2)],
                            type=pa.timestamp("us")),
        "spans": pa.array([[{"start": 0, "end": 4}], []],
                          type=pa.list_(pa.struct([("start", pa.int64()),
                                                   ("end", pa.int64())]))),
        "parse_ok": pa.array([True, False]),
    })
    p = str(tmp_path / "d" / "data.jsonl")
    write_atomic_jsonl(t, p)
    assert not os.path.exists(p + ".tmp")
    rows = [json.loads(line) for line in open(p, encoding="utf-8")]
    assert rows[0]["url"] == "u1"
    assert rows[0]["warc_ts"] == "2024-01-01T12:00:00.123456"
    assert rows[0]["spans"] == [{"start": 0, "end": 4}]
    assert rows[1]["spans"] == [] and rows[1]["parse_ok"] is False
