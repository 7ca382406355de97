"""Round-3 continuation batch AI: CDX-indexed selective WARC
re-extraction — the random-access crawl pattern (sources/cdx.py).

Three registered queries (rows-only: the surface is WARC bytes + a text
index, not SQL tables; byte-parity vs the full reader is pytest-pinned
in tests/test_queries_r3ai.py):

- ``cdx_hosts`` — index-only analytics: per-host capture counts and
  member byte totals straight from the CDX sidecars.  Zero WARC bytes
  read — how a 100 TB consumer scopes a job before paying for payload
  I/O (Common Crawl ships cluster.idx/CDX for exactly this).
- ``cdx_selective_extract`` — "re-extract these domains": filter the
  tiny index on host, ranged-read ONLY the selected gzip members
  (fetch_cdx_members), and run the standard extraction actor pool over
  them.  I/O is Σ selected member lengths (~12% of the corpus at the
  12-of-97-hosts predicate), not corpus size; output rows are
  byte-identical to the full-reader extraction on the same urls.
- ``cdx_point_lookup`` — the two-level cluster.idx pattern
  (sources/cdx_cluster.py): single-URL captures via one in-memory
  binary search + one master-block ranged read + one member fetch,
  reads independent of corpus size.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

_PYA = {"batch_format": "pyarrow"}

CDX_ROWS = 600
CDX_SHARDS = 6
# hosts are site0..site96 (synth.py:282); re-extract the first 12
CDX_HOST_MAX = 12
_HOST_RE = r"^https://site(?P<h>\d+)\.example/"


def _warc_cdx_corpus(sf_dir: str) -> str:
    """The synth pages corpus repacked as gzip-member WARC shards with
    CDX sidecars, cached in /tmp (rebuilt when the parquet stamp moves,
    mirroring gen_corpus's own idempotence)."""
    from ..sources.cdx import write_warc_with_cdx
    from ..sources.synth import gen_corpus

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    pdir = os.path.join(tempfile.gettempdir(), f"tx_cdx_pages_{tag}")
    shards = gen_corpus(pdir, CDX_ROWS, seed=42, n_shards=CDX_SHARDS)
    with open(os.path.join(pdir, "_STAMP")) as fh:
        stamp = "warc+cdx of " + fh.read()
    wdir = os.path.join(tempfile.gettempdir(), f"tx_cdx_warc_{tag}")
    os.makedirs(wdir, exist_ok=True)
    stamp_path = os.path.join(wdir, "_STAMP")
    if os.path.exists(stamp_path):
        with open(stamp_path) as fh:
            if fh.read() == stamp:
                return wdir
    for shard in shards:
        t = pq.read_table(shard, columns=["url", "warc_ts", "html"])
        recs = list(zip(
            t.column("url").to_pylist(),
            t.column("warc_ts").to_pylist(),
            [b or b"" for b in t.column("html").to_pylist()]))
        name = os.path.splitext(os.path.basename(shard))[0] + ".warc.gz"
        write_warc_with_cdx(os.path.join(wdir, name), recs)
    with open(stamp_path, "w") as fh:
        fh.write(stamp)
    return wdir


def _host_num(batch: pa.Table) -> pa.Table:
    m = pc.extract_regex(batch.column("url"), _HOST_RE)
    host = pc.struct_field(m, "h")
    return batch.append_column(
        "host_num", pc.cast(host, pa.int64()))


def q_cdx_hosts(sf_dir: str) -> ray.data.Dataset:
    """Per-host captures + bytes from the index alone (no WARC reads)."""
    from ray.data.aggregate import Count, Sum

    from ..sources.cdx import read_cdx

    idx = read_cdx(_warc_cdx_corpus(sf_dir))
    return (idx.map_batches(_host_num, **_PYA)
            .groupby("host_num")
            .aggregate(Count(alias_name="n_captures"),
                       Sum("length", alias_name="total_bytes")))


def _digest_out(batch: pa.Table) -> pa.Table:
    texts = batch.column("extracted_text").to_pylist()
    return pa.table({
        "url": batch.column("url"),
        "doc_type": batch.column("doc_type"),
        "n_chars": pa.array([len(t or "") for t in texts],
                            type=pa.int64()),
        "text_sha16": pa.array(
            [hashlib.md5((t or "").encode("utf-8")).hexdigest()[:16]
             for t in texts], type=pa.string()),
    })


def q_cdx_selective_extract(sf_dir: str) -> ray.data.Dataset:
    from ..sources.cdx import fetch_cdx_members, read_cdx
    from .extraction import extract_pages

    idx = read_cdx(_warc_cdx_corpus(sf_dir))
    sel = (idx.map_batches(_host_num, **_PYA)
           .filter(expr=f"host_num < {CDX_HOST_MAX}")
           .drop_columns(["host_num", "surt"]))
    pages = (sel.map_batches(fetch_cdx_members, **_PYA)
             .drop_columns(["bytes_read"]))
    out = extract_pages(pages, mode="single_pass",
                        batch_size=32)
    return out.map_batches(_digest_out, **_PYA)


def _cdx_cluster_dir(sf_dir: str) -> str:
    """The two-level index over the WARC corpus, cached like the corpus
    itself (rebuilt when the underlying WARC stamp moves)."""
    from ..sources.cdx_cluster import build_cdx_cluster

    wdir = _warc_cdx_corpus(sf_dir)
    with open(os.path.join(wdir, "_STAMP")) as fh:
        stamp = "cluster of " + fh.read()
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    cdir = os.path.join(tempfile.gettempdir(), f"tx_cdx_cluster_{tag}")
    os.makedirs(cdir, exist_ok=True)
    stamp_path = os.path.join(cdir, "_STAMP")
    if os.path.exists(stamp_path):
        with open(stamp_path) as fh:
            if fh.read() == stamp:
                return cdir
    build_cdx_cluster(wdir, cdir)
    with open(stamp_path, "w") as fh:
        fh.write(stamp)
    return cdir


def lookup_urls(sf_dir: str, n: int = 20) -> list[str]:
    """Deterministic lookup set: every 5th url of the first corpus
    shard (known-present captures; misses are tested in pytest)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    pdir = os.path.join(tempfile.gettempdir(), f"tx_cdx_pages_{tag}")
    t = pq.read_table(os.path.join(pdir, "part-00000.parquet"),
                      columns=["url"])
    urls = t.column("url").to_pylist()
    return urls[::5][:n]


def q_cdx_point_lookup(sf_dir: str) -> ray.data.Dataset:
    """Single-URL captures resolved through the two-level index: one
    cluster.idx binary search + ONE master-block ranged read per url +
    one gzip member fetch — reads independent of corpus size."""
    from ..sources.cdx import fetch_cdx_members
    from ..sources.cdx_cluster import CdxCluster
    from .extraction import extract_pages

    cdir = _cdx_cluster_dir(sf_dir)
    cluster = CdxCluster(cdir)
    rows = cluster.lookup_index_rows(lookup_urls(sf_dir))
    pages = (ray.data.from_arrow(rows.drop_columns(["surt"]))
             .map_batches(fetch_cdx_members, **_PYA)
             .drop_columns(["bytes_read"]))
    out = extract_pages(pages, mode="single_pass",
                        batch_size=32)
    return out.map_batches(_digest_out, **_PYA)


def queries_r3ai() -> dict:
    return {
        "cdx_hosts": q_cdx_hosts,
        "cdx_selective_extract": q_cdx_selective_extract,
        "cdx_point_lookup": q_cdx_point_lookup,
    }
