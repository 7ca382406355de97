"""Content-defined chunking + host-level template detection.

Boilerplate templates (nav bars, sidebars, footers) are the
dominant *byte-level* redundancy inside a host: the same markup
repeats on every page with small shifts, so fixed-offset blocking
misses it while CONTENT-DEFINED boundaries (cut where a local window
hash says so) re-synchronize after every insertion.  This is the
rsync/LBFS trick, vectorized: every 16-byte window of the page is
FNV-hashed at once (one strided (n−15, 16) uint8 matrix through the
repo's ``_fnv1a64_rows``), a position is a cut candidate when
``hash % 64 == 0`` (≈64-byte average chunks), and a greedy min-gap
pass enforces a minimum chunk size.  Boundaries are a pure function
of local bytes — two pages sharing a sidebar share its chunk hashes
no matter where the sidebar sits.

``host_template_rows`` emits per (page, distinct chunk) rows plus a
per-page marker row; one (host, chunk) aggregate and a per-host fold
yield the template ratio: the fraction of a host's bytes living in
chunks that appear on ≥ half of its pages.  High ratio ⇒
template-heavy host (extraction must strip aggressively); the
classic curation signal computed without any pairwise page
comparison.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _fnv1a64_many, _fnv1a64_rows

CDC_WINDOW = 16
CDC_DIVISOR = 64          # ~64-byte average chunks
CDC_MIN_CHUNK = 32
TEMPLATE_FRACTION = 0.5   # chunk is template if on >= this share of pages


def cdc_chunks(data: bytes, window: int = CDC_WINDOW,
               divisor: int = CDC_DIVISOR,
               min_chunk: int = CDC_MIN_CHUNK) -> list[bytes]:
    """Split ``data`` at content-defined boundaries (total: short
    payloads come back whole)."""
    n = len(data)
    if n <= max(window, min_chunk):
        return [data] if data else []
    arr = np.frombuffer(data, dtype=np.uint8)
    wins = np.lib.stride_tricks.sliding_window_view(arr, window)
    h = _fnv1a64_rows(np.ascontiguousarray(wins))
    # cut AFTER the window ending at position i (i = window-1 .. n-1)
    cand = np.flatnonzero(h % np.uint64(divisor) == 0) + window
    cuts = []
    last = 0
    for c in cand.tolist():
        if c - last >= min_chunk and n - c >= 1:
            cuts.append(c)
            last = c
    out = []
    prev = 0
    for c in cuts + [n]:
        out.append(data[prev:c])
        prev = c
    return out


def host_template_rows(b: pa.Table, html_col: str = "html",
                       url_col: str = "url") -> pa.Table:
    """(host, ch, nb, n, marker) rows: one row per (page, distinct
    chunk) with the chunk hash + byte length, plus one marker row per
    page carrying its total bytes — a single shuffle feeds both the
    chunk document-frequency and the per-host page/byte totals."""
    hosts, chs, nbs, ns, markers = [], [], [], [], []
    for url, payload in zip(b.column(url_col).to_pylist(),
                            b.column(html_col).to_pylist()):
        if payload is None:
            continue
        raw = payload if isinstance(payload, bytes) \
            else str(payload).encode("utf-8")
        host = url.split("/", 3)[2] if url.count("/") >= 2 else url
        chunks = cdc_chunks(raw)
        if not chunks:
            continue
        hv = _fnv1a64_many(chunks).view(np.int64)
        lens = np.array([len(c) for c in chunks], dtype=np.int64)
        # distinct chunk per page (a chunk repeated WITHIN a page still
        # counts one page toward its document frequency)
        uniq, idx = np.unique(hv, return_index=True)
        hosts.extend([host] * (uniq.size + 1))
        chs.append(uniq)
        chs.append(np.array([0], dtype=np.int64))
        nbs.append(lens[idx])
        nbs.append(np.array([int(lens.sum())], dtype=np.int64))
        ns.append(np.ones(uniq.size, dtype=np.int64))
        ns.append(np.array([1], dtype=np.int64))
        markers.extend([False] * uniq.size + [True])
    if not hosts:
        return pa.table({
            "host": pa.array([], pa.string()),
            "ch": pa.array([], pa.int64()),
            "nb": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "marker": pa.array([], pa.bool_()),
        })
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "ch": pa.array(np.concatenate(chs)),
        "nb": pa.array(np.concatenate(nbs)),
        "n": pa.array(np.concatenate(ns)),
        "marker": pa.array(markers, pa.bool_()),
    })


def fold_host_template(g: pa.Table,
                       frac: float = TEMPLATE_FRACTION) -> pa.Table:
    """Per-host fold over the groupby(host, ch, marker)-SUMMED rows:
    for a chunk row ``n`` is its page count and ``nb`` is
    chunk_len × n (bytes the chunk occupies host-wide); the single
    marker row carries (n_pages, total_bytes)."""
    marker = g.column("marker").to_numpy(zero_copy_only=False)
    n = g.column("n").to_numpy(zero_copy_only=False)
    nb = g.column("nb").to_numpy(zero_copy_only=False)
    n_pages = int(n[marker].sum())
    total_bytes = int(nb[marker].sum())
    chunk_rows = ~marker
    need = max(2, int(np.ceil(frac * n_pages)))
    is_tpl = chunk_rows & (n >= need)
    tpl_bytes = int(nb[is_tpl].sum())
    ratio = tpl_bytes / total_bytes if total_bytes else 0.0
    q = 10.0 ** 6
    return pa.table({
        "host": pa.array([g.column("host")[0].as_py()], pa.string()),
        "n_pages": pa.array([n_pages], pa.int64()),
        "n_chunks": pa.array([int(chunk_rows.sum())], pa.int64()),
        "template_ratio": pa.array(
            [float(np.floor(ratio * q + 0.5) / q)]),
    })
