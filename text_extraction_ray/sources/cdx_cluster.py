"""Two-level CDX index (Common Crawl's cluster.idx pattern): point
lookups over a crawl-scale index without scanning it.

At 100 TB the flat CDX itself is hundreds of GB — too big to scan per
lookup, too big to hold anywhere.  CC's public answer is a two-level
structure: the CDX is SORTED by SURT key and chunked into fixed-line
blocks; a secondary ``cluster.idx`` records one line per block (first
SURT key + the block's byte extent in the master file).  A lookup then
binary-searches the tiny secondary index in memory, ranged-reads ONE
master block, and scans ~block_lines lines — two bounded reads total,
independent of corpus size.

- ``build_cdx_cluster`` — Ray pipeline: read the shard sidecars, ONE
  distributed sort by (surt, ts) — the only exchange, and exactly the
  sort CC runs to publish its index — then stream the ordered blocks
  through the driver appending to ``master.cdx`` while sampling every
  ``block_lines``-th boundary into ``cluster.idx``.  The driver never
  holds more than one batch; cluster.idx is 1/block_lines of the master
  by construction (bounded at any scale).
- ``lookup_index_rows`` — binary-search cluster.idx (loaded once, tiny),
  ranged-read the single covering master block per URL, return the
  matching index rows; feed them to ``fetch_cdx_members`` for the
  payload.  Reads per lookup: one ≤block-sized index slice + one gzip
  member.
"""

from __future__ import annotations

import bisect
import os

import pyarrow as pa

import ray.data

from .cdx import _parse_cdx_block, read_cdx, surt_key
from .warc import _safe_uri

BLOCK_LINES = 32


def write_master_and_cluster(rows, out_dir: str,
                             block_lines: int = BLOCK_LINES,
                             ) -> tuple[str, str]:
    """Stream ALREADY-SORTED (surt, ts, url, offset, length, filename)
    tuples into ``out_dir/master.cdx`` + ``out_dir/cluster.idx``.

    cluster.idx line: ``first_surt offset length`` — the byte extent of
    each block of ``block_lines`` master lines.  Pure function (no Ray)
    so the geometry is property-testable; build_cdx_cluster supplies the
    distributed sort."""
    os.makedirs(out_dir, exist_ok=True)
    master_path = os.path.join(out_dir, "master.cdx")
    cluster_path = os.path.join(out_dir, "cluster.idx")
    n_in_block, block_first, block_start = 0, None, 0
    cluster_lines: list[str] = []
    with open(master_path, "w", encoding="ascii") as fh:
        for s, t, u, o, ln, fn in rows:
            if n_in_block == 0:
                block_first, block_start = s, fh.tell()
            # master lines carry the sidecar's full WARC path (a
            # deliberate divergence from CC's basename convention: it
            # keeps _parse_cdx_block's dirname join a no-op and the
            # master relocatable w.r.t. the cluster dir)
            fh.write(" ".join((
                s, t.strftime("%Y%m%d%H%M%S"), _safe_uri(u),
                str(o), str(ln), fn)) + "\n")
            n_in_block += 1
            if n_in_block == block_lines:
                cluster_lines.append(
                    f"{block_first} {block_start} "
                    f"{fh.tell() - block_start}")
                n_in_block = 0
        if n_in_block:
            cluster_lines.append(
                f"{block_first} {block_start} {fh.tell() - block_start}")
    with open(cluster_path, "w", encoding="ascii") as fh:
        fh.write("\n".join(cluster_lines) + ("\n" if cluster_lines else ""))
    return master_path, cluster_path


def build_cdx_cluster(warc_dir: str, out_dir: str,
                      block_lines: int = BLOCK_LINES) -> tuple[str, str]:
    """Sort every ``<shard>.cdx`` under ``warc_dir`` (one distributed
    sort — the only exchange) into the two-level index."""
    idx = read_cdx(warc_dir).sort(["surt", "warc_ts"])

    def ordered_rows():
        for batch in idx.iter_batches(batch_size=1024,
                                      batch_format="pyarrow"):
            yield from zip(batch.column("surt").to_pylist(),
                           batch.column("warc_ts").to_pylist(),
                           batch.column("url").to_pylist(),
                           batch.column("offset").to_pylist(),
                           batch.column("length").to_pylist(),
                           batch.column("filename").to_pylist())

    return write_master_and_cluster(ordered_rows(), out_dir, block_lines)


class CdxCluster:
    """In-memory secondary index + ranged master reads.  Loads ONLY
    cluster.idx (1/block_lines of the master); every lookup reads one
    master block.  ``bytes_read`` accumulates the master slices fetched
    — the auditable cost of the lookups."""

    def __init__(self, out_dir: str) -> None:
        self.master_path = os.path.join(out_dir, "master.cdx")
        self.keys: list[str] = []
        self.extents: list[tuple[int, int]] = []
        self.bytes_read = 0
        with open(os.path.join(out_dir, "cluster.idx"),
                  encoding="ascii") as fh:
            for line in fh:
                if not line.strip():
                    continue
                key, off, ln = line.rsplit(" ", 2)
                self.keys.append(key)
                self.extents.append((int(off), int(ln)))

    def _blocks_for(self, surt: str) -> list[tuple[int, int]]:
        # A key's run can span MANY blocks (block_lines+ captures of one
        # URL): rows live in every block whose first key == surt, plus
        # the block just before (the run may start mid-block there).
        if not self.keys:
            return []
        lo = bisect.bisect_left(self.keys, surt)
        hi = bisect.bisect_right(self.keys, surt)
        start = max(0, lo - 1)
        return self.extents[start:max(hi, start + 1)]

    def lookup_index_rows(self, urls: list[str],
                          master_dir: str | None = None) -> pa.Table:
        """Index rows for exact-URL matches, via one block read each
        (deduplicated across urls hitting the same block)."""
        dirname = master_dir or os.path.dirname(self.master_path)
        want = {surt_key(u): u for u in urls}
        blocks: dict[tuple[int, int], None] = {}
        for s in want:
            for ext in self._blocks_for(s):
                blocks[ext] = None
        cols: dict[str, list] = {}
        with open(self.master_path, "rb") as fh:
            for off, ln in blocks:
                fh.seek(off)
                data = fh.read(ln)
                self.bytes_read += ln
                part = _parse_cdx_block(data, dirname)
                for c, vals in part.items():
                    cols.setdefault(c, []).extend(vals)
        if not cols:
            return pa.table({})
        keep = [i for i, s in enumerate(cols["surt"])
                if s in want and cols["url"][i] == want[s]]
        return pa.table({
            "surt": pa.array([cols["surt"][i] for i in keep]),
            "url": pa.array([cols["url"][i] for i in keep]),
            "warc_ts": pa.array([cols["warc_ts"][i] for i in keep],
                                type=pa.timestamp("us")),
            "offset": pa.array([cols["offset"][i] for i in keep],
                               type=pa.int64()),
            "length": pa.array([cols["length"][i] for i in keep],
                               type=pa.int64()),
            "filename": pa.array([cols["filename"][i] for i in keep]),
        })
