"""CDX index over gzip-member WARC shards: the random-access path that
lets a 100 TB re-extraction read ONLY the records it needs.

Common Crawl publishes a CDX index next to its WARC segments — one line
per capture carrying the (filename, offset, length) of that record's
gzip member, keyed by SURT-canonicalized URL — exactly so consumers can
pull single records with ranged reads instead of streaming whole ~1 GB
files.  This module recreates that contract for the repo's own WARC
writer:

- ``write_warc_with_cdx`` — write_warc (gzip member per record, the CC
  convention) while recording each member's byte extent, then emit the
  sidecar ``<shard>.cdx`` text index.
- ``read_cdx``            — the tiny index as a Dataset (url, surt,
  warc_ts, offset, length, filename): filter HERE, at kilobytes per
  million records, before any WARC byte moves.
- ``fetch_cdx_members``   — map_batches stage: seek+read exactly the
  [offset, offset+length) slices, per-file and offset-ordered within the
  batch (sequential-friendly), then concatenate the fetched gzip members
  — a byte-valid .warc.gz stream by construction — through the SAME
  ``warc_batch_to_pages`` parse the full reader uses, so selective and
  full extraction are byte-identical on the selected urls.

Scale note: the index is ~60 B/record (0.00x of the corpus); the fetch
stage's I/O is Σ selected member lengths, not corpus size.  Each fetch
task touches whole batches of index rows, so block-level parallelism
comes from the index read; `bytes_read` is carried per output row to
make the prune-at-the-read claim testable.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
import os
from urllib.parse import urlsplit

import pyarrow as pa

import ray.data

from .warc import _safe_uri, _warc_record, warc_batch_to_pages

_CDX_COLS = ("surt", "url", "warc_ts", "offset", "length", "filename")


def surt_key(url: str) -> str:
    """SURT-lite canonical key (public Sort-friendly URI Reordering
    Transform convention): reversed host + path, scheme dropped."""
    parts = urlsplit(url)
    host = ",".join(reversed(parts.netloc.lower().split(".")))
    return f"{host}){parts.path or '/'}"


def write_warc_with_cdx(path: str,
                        records: list[tuple[str, _dt.datetime, bytes]],
                        ) -> tuple[str, str]:
    """Write gzip-member WARC + its ``<path>.cdx`` sidecar; returns
    (warc_path, cdx_path).  CDX line: surt ts url offset length filename
    (space-separated — ``_safe_uri`` %-escapes whitespace so fields
    never collide)."""
    base = os.path.basename(path)
    lines = []
    with open(path, "wb") as fh:
        for url, ts, body in records:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(_warc_record(url, ts, body))
            member = buf.getvalue()
            offset = fh.tell()
            fh.write(member)
            lines.append(" ".join((
                surt_key(url), ts.strftime("%Y%m%d%H%M%S"),
                _safe_uri(url), str(offset), str(len(member)), base)))
    cdx_path = path + ".cdx"
    with open(cdx_path, "w", encoding="ascii") as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
    return path, cdx_path


def _parse_cdx_block(data: bytes, dirname: str) -> dict[str, list]:
    from .warc import _decode_uri

    out: dict[str, list] = {c: [] for c in _CDX_COLS}
    for line in data.decode("ascii").splitlines():
        if not line.strip():
            continue
        surt, ts, url, offset, length, fname = line.split(" ")
        out["surt"].append(surt)
        out["url"].append(_decode_uri(url.encode("utf-8")))
        out["warc_ts"].append(
            _dt.datetime.strptime(ts, "%Y%m%d%H%M%S"))
        out["offset"].append(int(offset))
        out["length"].append(int(length))
        out["filename"].append(os.path.join(dirname, fname))
    return out


def read_cdx(paths: str | list[str]) -> ray.data.Dataset:
    """The CDX index as a Dataset — the place to filter before any WARC
    byte is read."""
    raw = ray.data.read_binary_files(paths, file_extensions=["cdx"],
                                     include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {c: [] for c in _CDX_COLS}
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            part = _parse_cdx_block(data or b"", os.path.dirname(path))
            for c in _CDX_COLS:
                cols[c].extend(part[c])
        return pa.table({
            "surt": pa.array(cols["surt"], type=pa.string()),
            "url": pa.array(cols["url"], type=pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], type=pa.timestamp("us")),
            "offset": pa.array(cols["offset"], type=pa.int64()),
            "length": pa.array(cols["length"], type=pa.int64()),
            "filename": pa.array(cols["filename"], type=pa.string()),
        })

    return raw.map_batches(parse, batch_format="pyarrow")


def fetch_cdx_members(batch: pa.Table) -> pa.Table:
    """Ranged reads for the selected index rows → PAGES-shaped rows via
    the standard WARC parse; adds ``bytes_read`` (the member length that
    was actually fetched) per output row."""
    fname = batch.column("filename").to_pylist()
    offset = batch.column("offset").to_pylist()
    length = batch.column("length").to_pylist()
    rows = sorted(range(len(fname)), key=lambda i: (fname[i], offset[i]))
    members, sizes = [], []
    open_path, fh = None, None
    try:
        for i in rows:
            if fname[i] != open_path:
                if fh is not None:
                    fh.close()
                open_path, fh = fname[i], open(fname[i], "rb")
            fh.seek(offset[i])
            members.append(fh.read(length[i]))
            sizes.append(length[i])
    finally:
        if fh is not None:
            fh.close()
    stream = b"".join(members)
    pages = warc_batch_to_pages(pa.table({
        "path": pa.array([open_path or ""], type=pa.string()),
        "bytes": pa.array([stream], type=pa.binary()),
    }))
    if len(pages) != len(rows):
        raise ValueError(
            f"CDX fetch parsed {len(pages)} records from {len(rows)} "
            f"members — index out of step with the WARC")
    # same default as read_warc_pages: exactly PAGES-shaped downstream
    pages = pages.drop_columns(["content_encoding"])
    return pages.append_column("bytes_read",
                               pa.array(sizes, type=pa.int64()))
