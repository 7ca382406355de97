"""JSON-lines pages source — the third input format (S10) next to parquet
and WARC: one JSON object per line with base64 payloads (JSON cannot carry
binary), the shape crawl post-processors commonly emit.

    {"url": ..., "warc_ts": "2024-01-01T00:00:00", "html_b64": ...,
     "text": ..., "lang": ...}

``read_pages_jsonl`` uses ``ray.data.read_json`` (file-parallel) and one
``map_batches`` to decode into the canonical PAGES shape, so every
downstream pipeline (extraction, job, analysis) is format-agnostic.
"""

from __future__ import annotations

import base64
import datetime as _dt
import json

import pyarrow as pa

import ray.data

def write_jsonl(path: str, rows: list[dict]) -> str:
    """Fixture writer: rows with url/warc_ts(datetime)/html(bytes)/text/lang."""
    with open(path, "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(json.dumps({
                "url": r["url"],
                # full isoformat: sub-second precision survives the trip
                "warc_ts": r["warc_ts"].isoformat(),
                "html_b64": base64.b64encode(r["html"] or b"").decode("ascii"),
                "text": r.get("text", ""),
                "lang": r.get("lang", ""),
            }, ensure_ascii=False) + "\n")
    return path


def jsonl_batch_to_pages(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    # optional columns default rather than fail (real exports drop them)
    for name in ("text", "lang"):
        if name not in batch.schema.names:
            batch = batch.append_column(
                name, pa.array([""] * n, type=pa.string()))
    if "html_b64" not in batch.schema.names:
        batch = batch.append_column(
            "html_b64", pa.array([""] * n, type=pa.string()))
    ts_col = batch.column("warc_ts")
    if pa.types.is_timestamp(ts_col.type):
        # read_json already inferred the ISO strings as timestamps
        ts = ts_col.cast(pa.timestamp("us")).to_pylist()
    else:
        ts = [_dt.datetime.fromisoformat(s) for s in ts_col.to_pylist()]
    html = [base64.b64decode(s or "")
            for s in batch.column("html_b64").to_pylist()]
    return pa.table({
        "url": batch.column("url").cast(pa.string()),
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        "html": pa.array(html, type=pa.binary()),
        "text": batch.column("text").cast(pa.string()),
        "lang": batch.column("lang").cast(pa.string()),
    })


def read_pages_jsonl(paths: str | list[str]) -> ray.data.Dataset:
    """PAGES Dataset from .jsonl shards."""
    raw = ray.data.read_json(paths, file_extensions=["jsonl"])
    return raw.map_batches(jsonl_batch_to_pages, batch_format="pyarrow")
