"""Checkpointed extraction job (SURVEY.md SS3.1 flagship entry point).

The unit of work, checkpoint and lineage is one input partition (= one
parquet shard; SURVEY SS4.2).  Pending partitions are dispatched as a
Dataset of (pid, path) work items through an actor-pool ``map_batches`` —
each worker reads its shard row-group by row-group, extracts with the SAME
per-document code the oracle uses, sorts rows by url (byte-stable output,
K2), writes ``out/part={pid}/data.parquet`` atomically, and writes the
manifest LAST.  Payload bytes never cross the object store on this path:
read, extract and write are data-local inside one task, which at 100 TB
saves shipping the corpus through plasma twice.  METRICS rows are the only
thing returned to the driver (G1).

Resume: the driver prunes partitions whose manifest matches (S4/J2) and
reruns the rest; writes are idempotent (SS4.4), so mid-crawl failure at any
point is safe.
"""

from __future__ import annotations

import logging
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..schemas import OUT
from ..stages.extract import Extractor
from ..state.checkpoint import (
    partition_out_dir,
    prune_done,
    sha256_of_column,
    sum_counters,
    write_atomic_csv,
    write_atomic_jsonl,
    write_atomic_parquet,
    write_manifest,
)

_ROWGROUP_BATCH = 256


class PartitionWorker:
    """Actor: processes whole partitions (read → extract → write → manifest)."""

    def __init__(self, output_dir: str, ckpt_dir: str,
                 output_format: str = "parquet") -> None:
        if output_format not in ("parquet", "csv", "jsonl"):
            raise ValueError(f"unsupported output_format {output_format!r}")
        self.output_dir = output_dir
        self.ckpt_dir = ckpt_dir
        self.output_format = output_format
        self.extractor = Extractor(validate_schema=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        metrics_rows = []
        for pid, shard in zip(
            batch.column("pid").to_pylist(), batch.column("path").to_pylist()
        ):
            t0 = time.monotonic()
            out_tables = []
            bytes_in = 0
            for t in _iter_shard_tables(shard):
                bytes_in += t.column("html").nbytes
                out_tables.append(self.extractor(t))
            # A shard may legitimately yield ZERO tables (empty parquet
            # shard, fully-corrupt .warc.gz salvaged to nothing): fall back
            # to an empty table WITH the OUT schema so sort_by, counters
            # and the manifest write all succeed and resume doesn't retry
            # the shard forever (ADVICE r1, medium).
            out = (pa.concat_tables(out_tables) if out_tables
                   else OUT.empty_table())
            out = out.sort_by("url")  # byte-stable row order within partition
            if self.output_format == "csv":
                data_path = os.path.join(
                    partition_out_dir(self.output_dir, pid), "data.csv")
                write_atomic_csv(out, data_path)
            elif self.output_format == "jsonl":
                data_path = os.path.join(
                    partition_out_dir(self.output_dir, pid), "data.jsonl")
                write_atomic_jsonl(out, data_path)
            else:
                data_path = os.path.join(
                    partition_out_dir(self.output_dir, pid), "data.parquet")
                write_atomic_parquet(out, data_path)
            failed = pc.sum(pc.cast(pc.invert(out.column("parse_ok")),
                                    pa.int64())).as_py() or 0
            counters = {
                "docs_in": out.num_rows,
                "docs_out": out.num_rows,
                "docs_failed": failed,
                "blocks_kept": pc.sum(out.column("n_blocks_kept")).as_py() or 0,
                "blocks_dropped": pc.sum(out.column("n_blocks_dropped")).as_py() or 0,
                "bytes_in": bytes_in,
                "bytes_out": out.column("extracted_text").nbytes,
            }
            write_manifest(
                self.ckpt_dir, pid,
                input_fragments=[shard],
                row_count=out.num_rows,
                sha256=sha256_of_column(out, "extracted_text"),
                counters=counters,
                output_format=self.output_format,
            )
            metrics_rows.append(
                {"partition_id": pid, "stage": "extract",
                 **{k: counters[k] for k in
                    ("docs_in", "docs_out", "docs_failed", "blocks_kept",
                     "blocks_dropped", "bytes_in", "bytes_out")},
                 "wall_s": time.monotonic() - t0})
        return pa.Table.from_pylist(metrics_rows)


_SHARD_EXTS = (".parquet", ".warc", ".warc.gz", ".jsonl", ".csv",
               ".tar", ".tar.gz", ".tgz")


def _iter_shard_tables(shard: str):
    """Row-group/record batches of one input shard; parquet reads prune
    the WET `text` column at the storage layer (it never leaves disk),
    WARC shards (Common Crawl's native format) parse gzip-member-streamed,
    JSONL shards parse line-streamed — every format holds ~one row-group
    in memory at a time."""
    if shard.endswith((".warc", ".warc.gz")):
        from ..sources.warc import iter_warc_stream

        # streaming gzip-member parse: memory stays ~record + 1 MiB chunk,
        # never the whole shard — a 1 GB Common Crawl segment flows through
        # in bounded space (round 2; was a whole-file read in round 1)
        with open(shard, "rb") as fh:
            rows = {"url": [], "warc_ts": [], "html": [], "lang": []}
            for url, ts, body, _enc in iter_warc_stream(fh):
                rows["url"].append(url)
                rows["warc_ts"].append(ts)
                rows["html"].append(body)
                rows["lang"].append("")
                if len(rows["url"]) >= _ROWGROUP_BATCH:
                    yield _pages_chunk(rows)
                    rows = {"url": [], "warc_ts": [], "html": [], "lang": []}
            if rows["url"]:
                yield _pages_chunk(rows)
        return
    if shard.endswith(".jsonl"):
        import base64
        import datetime as _dt
        import json as _json

        # line-streamed: memory ≈ one row-group, like the WARC path.
        # Malformed lines (truncated writes, encoding garbage — routine
        # in crawl-scale JSONL) SKIP with a counted warning instead of
        # killing the whole shard's partition.
        n_bad = 0
        with open(shard, encoding="utf-8", errors="replace") as fh:
            rows = {"url": [], "warc_ts": [], "html": [], "lang": []}
            for line in fh:
                if not line.strip():
                    continue
                try:
                    r = _json.loads(line)
                    url = r["url"]
                    ts = _dt.datetime.fromisoformat(r["warc_ts"])
                    html = base64.b64decode(r.get("html_b64", "") or "")
                except (ValueError, KeyError, TypeError):
                    n_bad += 1
                    continue
                rows["url"].append(url)
                rows["warc_ts"].append(ts)
                rows["html"].append(html)
                rows["lang"].append(r.get("lang", "") or "")
                if len(rows["url"]) >= _ROWGROUP_BATCH:
                    yield _pages_chunk(rows)
                    rows = {"url": [], "warc_ts": [], "html": [], "lang": []}
            if rows["url"]:
                yield _pages_chunk(rows)
        if n_bad:
            logging.getLogger(__name__).warning(
                "%s: skipped %d malformed jsonl line(s)", shard, n_bad)
        return
    if shard.endswith(".csv"):
        import base64
        import csv as _csv
        import datetime as _dt

        # crawl pages routinely exceed csv's 128 KiB default field cap
        _csv.field_size_limit(1 << 30)
        # row-streamed like jsonl; html travels base64 (CSV is text-only);
        # malformed rows skip-and-count like the jsonl path
        n_bad = 0
        with open(shard, newline="", encoding="utf-8",
                  errors="replace") as fh:
            rows = {"url": [], "warc_ts": [], "html": [], "lang": []}
            for r in _csv.DictReader(fh):
                try:
                    url = r["url"]
                    ts = _dt.datetime.fromisoformat(r["warc_ts"])
                    html = base64.b64decode(r.get("html_b64", "") or "")
                    if url is None:
                        raise KeyError("url")
                except (ValueError, KeyError, TypeError):
                    n_bad += 1
                    continue
                rows["url"].append(url)
                rows["warc_ts"].append(ts)
                rows["html"].append(html)
                rows["lang"].append(r.get("lang", "") or "")
                if len(rows["url"]) >= _ROWGROUP_BATCH:
                    yield _pages_chunk(rows)
                    rows = {"url": [], "warc_ts": [], "html": [],
                            "lang": []}
            if rows["url"]:
                yield _pages_chunk(rows)
        if n_bad:
            logging.getLogger(__name__).warning(
                "%s: skipped %d malformed csv row(s)", shard, n_bad)
        return
    if shard.endswith((".tar", ".tar.gz", ".tgz")):
        import datetime as _dt

        from ..sources.tar import open_tar_stream

        # document-dump tarballs (S22): one member per document,
        # STREAMED header-by-header (tar is a sequence of fixed
        # 512-byte blocks; .tar.gz wraps a streaming gunzip) — memory
        # stays ~one member + a chunk, the iter_warc_stream discipline
        stem = shard.rsplit("/", 1)[-1]
        for suf in (".tar.gz", ".tgz", ".tar"):
            if stem.endswith(suf):
                stem = stem[: -len(suf)]
                break
        fh, members = open_tar_stream(shard)
        try:
            rows = {"url": [], "warc_ts": [], "html": [], "lang": []}
            for name, mtime, body in members:
                rows["url"].append(f"tar://{stem}/{name}")
                rows["warc_ts"].append(
                    _dt.datetime(1970, 1, 1) + _dt.timedelta(
                        seconds=min(max(mtime, 0), 7_258_118_400)))
                rows["html"].append(body)
                rows["lang"].append("")
                if len(rows["url"]) >= _ROWGROUP_BATCH:
                    yield _pages_chunk(rows)
                    rows = {"url": [], "warc_ts": [], "html": [],
                            "lang": []}
            if rows["url"]:
                yield _pages_chunk(rows)
        finally:
            fh.close()
        return
    pf = pq.ParquetFile(shard)
    for rb in pf.iter_batches(batch_size=_ROWGROUP_BATCH,
                              columns=["url", "warc_ts", "html", "lang"]):
        yield pa.Table.from_batches([rb])


def _pages_chunk(rows: dict) -> pa.Table:
    return pa.table({
        "url": pa.array(rows["url"], type=pa.string()),
        "warc_ts": pa.array(rows["warc_ts"], type=pa.timestamp("us")),
        "html": pa.array(rows["html"], type=pa.binary()),
        "lang": pa.array(rows["lang"], type=pa.string()),
    })


def list_shards(input_path: str) -> list[str]:
    if os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, f) for f in os.listdir(input_path)
            if f.endswith(_SHARD_EXTS)
        )
    return [input_path]


def read_output(output_dir: str,
                output_format: str = "parquet") -> ray.data.Dataset:
    """OUT Dataset over the job's partitioned output (parquet or jsonl;
    CSV read-back is unsupported — spans are JSON-encoded strings there,
    so its schema can't round-trip)."""
    fname = {"jsonl": "data.jsonl"}.get(output_format, "data.parquet")
    if output_format == "csv":
        raise ValueError("CSV partitions cannot be read back as OUT "
                         "(spans are JSON-encoded); use parquet or jsonl")
    parts = sorted(
        os.path.join(output_dir, d, fname)
        for d in os.listdir(output_dir)
        if d.startswith("part=")
        and os.path.exists(os.path.join(output_dir, d, fname))
    )
    if output_format == "parquet":
        return ray.data.read_parquet(parts)
    raw = ray.data.read_json(parts, file_extensions=["jsonl"])

    def norm(b: pa.Table) -> pa.Table:
        ts = b.column("warc_ts")
        if not pa.types.is_timestamp(ts.type):
            import datetime as _dt

            ts = pa.array([_dt.datetime.fromisoformat(s)
                           for s in ts.to_pylist()], pa.timestamp("us"))
        else:
            ts = ts.cast(pa.timestamp("us"))
        i = b.schema.get_field_index("warc_ts")
        return b.set_column(i, "warc_ts", ts)

    return raw.map_batches(norm, batch_format="pyarrow")


def dedup_output(output_dir: str, dedup_dir: str | None = None) -> str:
    """Opt-in post-pass (G3): keep-latest-per-url over the job output —
    the only shuffle in the pages path, which is why it is a separate
    pass and not part of the partition-local flagship job."""
    from .analysis import dedup_keep_latest

    dedup_dir = dedup_dir or os.path.join(output_dir, "dedup")
    deduped = dedup_keep_latest(read_output(output_dir))
    deduped.write_parquet(dedup_dir)
    return dedup_dir


def report_output(output_dir: str, output_format: str = "parquet") -> dict:
    """QA report over the job output: doc types, per-lang stats, length
    histogram (G2/G6) — all pre-reduced map-side, tiny groupbys."""
    from .analysis import doc_type_counts, length_histogram, per_lang_stats

    out = read_output(output_dir, output_format)
    return {
        "doc_types": doc_type_counts(out).to_pandas()
        .to_dict("records"),
        "per_lang": per_lang_stats(out).to_pandas().to_dict("records"),
        "length_histogram": length_histogram(out).to_pandas()
        .sort_values("bucket").to_dict("records"),
    }


def run_extraction_job(
    input_path: str,
    output_dir: str,
    ckpt_dir: str | None = None,
    concurrency: int | tuple[int, int] | None = None,
    actor_cpus: int = 2,
    output_format: str = "parquet",
) -> dict:
    """ray job submit entry: resumable read→extract→write over all shards.

    ``actor_cpus=2`` schedules one parser actor per physical-core pair:
    extraction is allocation/memory-bandwidth heavy, and measured per-actor
    throughput COLLAPSES when parser processes share SMT siblings (this
    box: 390 docs/s/actor at 8 actors vs 268 at 16 — see BASELINE.md).

    Returns a summary dict with per-run and cumulative counters.
    """
    ckpt_dir = ckpt_dir or os.path.join(output_dir, "_ckpt")
    shards = list_shards(input_path)
    pending = prune_done(shards, output_dir, ckpt_dir,
                         output_format=output_format)
    summary = {
        "partitions_total": len(shards),
        "partitions_skipped": len(shards) - len(pending),
        "partitions_run": len(pending),
    }
    if pending:
        if concurrency is None:
            try:
                cpus = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                cpus = 8
            concurrency = max(1, min(len(pending), cpus // actor_cpus))
        items = [{"pid": pid, "path": path} for pid, path in pending]
        work = ray.data.from_items(items, override_num_blocks=len(items))
        metrics = work.map_batches(
            PartitionWorker,
            fn_constructor_args=(output_dir, ckpt_dir, output_format),
            batch_size=1,
            concurrency=concurrency,
            num_cpus=actor_cpus,
            batch_format="pyarrow",
        ).take_all()
        summary["run_wall_s_per_partition"] = sorted(
            round(m["wall_s"], 3) for m in metrics)[-3:]
    summary["cumulative"] = sum_counters(ckpt_dir)
    return summary
