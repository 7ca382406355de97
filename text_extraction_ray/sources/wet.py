"""WET-style conversion-record sink + source (Common-Crawl convention).

A WET file is a WARC whose records are ``WARC-Type: conversion`` with a
``text/plain`` body — the extracted text of a page, no HTTP envelope.
This module closes the engine's crawl loop: extraction output written
as WET shards is re-readable by the engine itself (and by any WARC
tooling), with the same byte-identity contract as the parquet sink —
``parse_wet(write_wet(records))`` is the identity on (url, ts, text).

Shares the WARC plumbing (header splitting, %-injective URI encoding,
gzip-member framing and salvage) with sources/warc.py rather than
re-implementing it.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import hashlib
import io
import os

import pyarrow as pa

from .warc import (
    _CRLF,
    _decode_uri,
    _safe_uri,
    _split_headers,
    _WARC_DATE_FMT,
)


def _wet_record(url: str, ts: _dt.datetime, text: str) -> bytes:
    body = text.encode("utf-8")
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: " + _safe_uri(url).encode("utf-8") + _CRLF +
        b"WARC-Date: " + ts.strftime(_WARC_DATE_FMT).encode() + _CRLF +
        b"Content-Type: text/plain\r\n"
        b"Content-Length: " + str(len(body)).encode() + _CRLF + _CRLF
    )
    return headers + body + _CRLF + _CRLF


def write_wet(path: str, records, gzip_members: bool = True) -> str:
    """Write (url, ts, text) records as one WET shard; one gzip member
    per record (CC convention) so a reader can salvage prefixes."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        for url, ts, text in records:
            rec = _wet_record(url, ts, text)
            if gzip_members:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                rec = buf.getvalue()
            fh.write(rec)
    os.replace(tmp, path)  # atomic, resume-compatible like the parquet sink
    return path


def parse_wet(data: bytes):
    """Yield (url, warc_ts, text) for every conversion record; same
    gzip-member salvage semantics as parse_warc (total function)."""
    from .warc import inflate_members

    data = inflate_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = data.find(_CRLF + _CRLF, start)
        if head_end < 0:
            break
        headers = _split_headers(data[start:head_end])
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            length = 0
        content = data[head_end + 4: head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get(b"warc-type") != b"conversion":
            continue
        url = _decode_uri(headers.get(b"warc-target-uri", b""))
        ts_raw = headers.get(b"warc-date", b"").decode("ascii", "replace")
        try:
            ts = _dt.datetime.strptime(ts_raw, _WARC_DATE_FMT)
        except ValueError:
            ts = _dt.datetime(1970, 1, 1)
        yield url, ts, content.decode("utf-8", "replace")


def wet_writer_factory(out_dir: str):
    """Batch fn: write each batch of extraction OUT rows as ONE WET
    shard named by content (md5 of the sorted url list) — deterministic
    and idempotent under retries, like the parquet partition sink.
    Emits (path, n_records) manifest rows."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        tss = b.column("warc_ts").to_pylist()
        texts = b.column("extracted_text").to_pylist()
        order = sorted(range(len(urls)), key=lambda i: urls[i])
        name = hashlib.md5(
            "\x00".join(urls[i] for i in order).encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"wet-{name}.warc.gz")
        write_wet(path, ((urls[i], tss[i], texts[i] or "")
                         for i in order))
        return pa.table({"path": pa.array([path]),
                         "n_records": pa.array([len(urls)], pa.int64())})

    return write_batch


def read_wet_dir(dir_path: str):
    """Ray Dataset of (url, warc_ts, text) over every WET shard in a
    directory — read_binary_files + a flat-map parse (each shard's
    records are independent; parallelism = #shards, the same unit the
    writer produced)."""
    import ray.data

    def expand(b: pa.Table) -> pa.Table:
        urls, tss, texts = [], [], []
        for payload in b.column("bytes").to_pylist():
            for url, ts, text in parse_wet(payload):
                urls.append(url)
                tss.append(ts)
                texts.append(text)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "text": pa.array(texts, pa.string()),
        })

    files = ray.data.read_binary_files(dir_path, file_extensions=["gz"])
    return files.map_batches(expand, batch_format="pyarrow")
