"""Resume / determinism tests (SURVEY SS3.3, SS4.4)."""

from __future__ import annotations

import hashlib
import os
import shutil

import pyarrow.parquet as pq

from text_extraction_ray.pipelines.job import run_extraction_job
from text_extraction_ray.state.checkpoint import manifest_file, partition_out_dir


def _output_digest(output_dir: str) -> str:
    h = hashlib.sha256()
    for part in sorted(os.listdir(output_dir)):
        if not part.startswith("part="):
            continue
        t = pq.read_table(os.path.join(output_dir, part, "data.parquet"))
        for url, text in zip(t.column("url").to_pylist(),
                             t.column("extracted_text").to_pylist()):
            h.update(url.encode() + b"\x00" + text.encode() + b"\x1e")
    return h.hexdigest()


def test_job_runs_and_resumes(ray_session, tiny_corpus_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    s1 = run_extraction_job(tiny_corpus_dir, out, ckpt, concurrency=2)
    assert s1["partitions_run"] == 4
    assert s1["cumulative"]["partitions"] == 4
    assert s1["cumulative"]["docs_out"] == 200
    digest1 = _output_digest(out)

    # a second run is a full no-op
    s2 = run_extraction_job(tiny_corpus_dir, out, ckpt, concurrency=2)
    assert s2["partitions_run"] == 0
    assert s2["partitions_skipped"] == 4
    assert _output_digest(out) == digest1

    # sabotage partitions 2 and 3 → only they recompute, bytes unchanged
    for pid in (2, 3):
        os.remove(manifest_file(ckpt, pid))
        shutil.rmtree(partition_out_dir(out, pid))
    s3 = run_extraction_job(tiny_corpus_dir, out, ckpt, concurrency=2)
    assert s3["partitions_run"] == 2
    assert s3["partitions_skipped"] == 2
    assert _output_digest(out) == digest1


def test_job_matches_streaming_pipeline(ray_session, tiny_corpus_dir, tmp_path, golden_table):
    """The checkpointed job and the frozen goldens agree byte-for-byte."""
    out = str(tmp_path / "out2")
    run_extraction_job(tiny_corpus_dir, out, concurrency=2)
    gold = dict(zip(golden_table.column("url").to_pylist(),
                    golden_table.column("extracted_text").to_pylist()))
    seen = {}
    for part in sorted(os.listdir(out)):
        if not part.startswith("part="):
            continue
        t = pq.read_table(os.path.join(out, part, "data.parquet"))
        for url, text in zip(t.column("url").to_pylist(),
                             t.column("extracted_text").to_pylist()):
            assert gold[url] == text
            seen[url] = text
    assert set(seen) == set(gold)


def test_empty_shard_completes_and_resumes(ray_session, tmp_path):
    """ADVICE r1 (medium): a shard yielding ZERO rows (empty parquet) must
    still produce an OUT-schema output + manifest so resume skips it
    instead of retrying forever."""
    import pyarrow as pa

    from text_extraction_ray.schemas import PAGES

    inp = tmp_path / "empty_in"
    inp.mkdir()
    pq.write_table(PAGES.empty_table(), str(inp / "shard-000.parquet"))
    out = str(tmp_path / "empty_out")

    s1 = run_extraction_job(str(inp), out, concurrency=1)
    assert s1["partitions_run"] == 1
    assert s1["cumulative"]["partitions"] == 1
    assert s1["cumulative"]["docs_out"] == 0
    t = pq.read_table(os.path.join(partition_out_dir(out, 0), "data.parquet"))
    assert t.num_rows == 0
    assert "extracted_text" in t.schema.names

    s2 = run_extraction_job(str(inp), out, concurrency=1)
    assert s2["partitions_run"] == 0 and s2["partitions_skipped"] == 1


def test_format_change_recomputes(ray_session, tiny_corpus_dir, tmp_path):
    """ADVICE r1: rerunning with a different --format must recompute the
    partitions in the new format, not silently skip them."""
    out = str(tmp_path / "fmt_out")
    ckpt = str(tmp_path / "fmt_ckpt")

    s1 = run_extraction_job(tiny_corpus_dir, out, ckpt, concurrency=2,
                            output_format="parquet")
    assert s1["partitions_run"] == 4

    s2 = run_extraction_job(tiny_corpus_dir, out, ckpt, concurrency=2,
                            output_format="csv")
    assert s2["partitions_run"] == 4  # format changed -> full recompute
    assert os.path.exists(os.path.join(partition_out_dir(out, 0), "data.csv"))

    s3 = run_extraction_job(tiny_corpus_dir, out, ckpt, concurrency=2,
                            output_format="csv")
    assert s3["partitions_run"] == 0 and s3["partitions_skipped"] == 4


def test_appending_shards_resumes_incrementally(ray_session, tmp_path):
    """Operational contract for growing crawls: appended shards only
    process the new work (see test_prepended_shards_do_not_shift_partitions
    for the sort-before case — the stable registry keeps prior bindings
    there too)."""
    import shutil

    from text_extraction_ray.sources.synth import gen_corpus

    inp = str(tmp_path / "grow_in")
    gen_corpus(inp, 60, seed=6, n_shards=3)
    out = str(tmp_path / "grow_out")
    s1 = run_extraction_job(inp, out, concurrency=2)
    assert s1["partitions_run"] == 3
    digest1 = _output_digest(out)

    # append a shard that sorts AFTER part-00002 → only it runs
    extra = str(tmp_path / "extra")
    gen_corpus(extra, 20, seed=7, n_shards=1)
    shutil.copy(os.path.join(extra, "part-00000.parquet"),
                os.path.join(inp, "part-00099.parquet"))
    s2 = run_extraction_job(inp, out, concurrency=2)
    assert s2["partitions_run"] == 1
    assert s2["partitions_skipped"] == 3
    # prior partitions byte-identical
    h_old = digest1
    # recompute digest over only the first three partitions
    import hashlib

    h = hashlib.sha256()
    parts = sorted(p for p in os.listdir(out) if p.startswith("part="))
    for part in parts[:3]:
        t = pq.read_table(os.path.join(out, part, "data.parquet"))
        for url, text in zip(t.column("url").to_pylist(),
                             t.column("extracted_text").to_pylist()):
            h.update(url.encode() + b"\x00" + text.encode() + b"\x1e")
    assert h.hexdigest() == h_old


def test_stale_tmp_files_are_harmless(ray_session, tiny_corpus_dir, tmp_path):
    """Crash simulation: a killed writer leaves data.parquet.tmp and
    manifest .tmp debris behind. Resume must ignore the debris, recompute
    only unfinished partitions, and end byte-identical."""
    out = str(tmp_path / "crash_out")
    ckpt = str(tmp_path / "crash_ckpt")
    run_extraction_job(tiny_corpus_dir, out, ckpt, concurrency=2)
    digest = _output_digest(out)

    # simulate a crash mid-partition-2: manifest gone, output half-written
    os.remove(manifest_file(ckpt, 2))
    pdir = partition_out_dir(out, 2)
    os.replace(os.path.join(pdir, "data.parquet"),
               os.path.join(pdir, "data.parquet.tmp"))
    with open(os.path.join(pdir, "data.parquet.tmp"), "ab") as fh:
        fh.write(b"TRUNCATED GARBAGE")
    with open(manifest_file(ckpt, 3) + ".tmp", "w") as fh:
        fh.write('{"half": true')  # unfinished manifest write

    s = run_extraction_job(tiny_corpus_dir, out, ckpt, concurrency=2)
    assert s["partitions_run"] == 1  # only the crashed partition
    assert s["partitions_skipped"] == 3
    assert _output_digest(out) == digest
    assert os.path.exists(os.path.join(pdir, "data.parquet"))


def test_prepended_shards_do_not_shift_partitions(ray_session, tmp_path):
    """Round 2 stable shard→pid registry: a shard that sorts BEFORE the
    existing ones gets a NEW pid — prior partitions are untouched and only
    the new shard runs (previously a full safe-but-wasteful recompute)."""
    import shutil

    from text_extraction_ray.sources.synth import gen_corpus

    inp = str(tmp_path / "pre_in")
    gen_corpus(inp, 60, seed=8, n_shards=3)
    out = str(tmp_path / "pre_out")
    ckpt = str(tmp_path / "pre_ckpt")
    s1 = run_extraction_job(inp, out, ckpt, concurrency=2)
    assert s1["partitions_run"] == 3
    digest1 = _output_digest(out)
    mtimes = {p: os.path.getmtime(os.path.join(out, p, "data.parquet"))
              for p in os.listdir(out) if p.startswith("part=")}

    extra = str(tmp_path / "pre_extra")
    gen_corpus(extra, 20, seed=9, n_shards=1)
    # 'aaa-' sorts before 'part-00000.parquet'
    shutil.copy(os.path.join(extra, "part-00000.parquet"),
                os.path.join(inp, "aaa-new-shard.parquet"))
    s2 = run_extraction_job(inp, out, ckpt, concurrency=2)
    assert s2["partitions_run"] == 1       # ONLY the prepended shard
    assert s2["partitions_skipped"] == 3
    # original partitions were not rewritten
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, p, "data.parquet")) == m
    # the new shard landed in a NEW partition dir (pid 3)
    assert os.path.exists(os.path.join(out, "part=00003", "data.parquet"))
    # prior bytes unchanged
    parts = sorted(p for p in os.listdir(out) if p.startswith("part="))
    import hashlib

    h = hashlib.sha256()
    for part in parts[:3]:
        t = pq.read_table(os.path.join(out, part, "data.parquet"))
        for url, text in zip(t.column("url").to_pylist(),
                             t.column("extracted_text").to_pylist()):
            h.update(url.encode() + b"\x00" + text.encode() + b"\x1e")
    assert h.hexdigest() == digest1
