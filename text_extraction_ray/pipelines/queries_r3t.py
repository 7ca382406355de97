"""Round-3 continuation batch T: span-level dedup, anchor-text index,
robots-meta flags.

- ``docs_span_dedup`` — C4-style duplicated-span removal over the
  ``documents`` table: the text splits into consecutive 10-word
  chunks; every chunk occurrence except the globally-first (min
  ``doc_id * 2^20 + pos``) of its chunk string is dropped; the doc is
  reassembled from the survivors.  Registered rows-only; the DuckDB
  twin (UNNEST + list-slice chunking + window min, identical to the
  Ray result including the md5 of the reassembled text) is pinned in
  ``tests/test_queries_r3t.py``.  Scale shape mirrors
  ``docs_dup_ngrams`` (queries_r3p.py): chunks shuffle as int64
  hashes in ONE map-side-combined aggregate; the duplicated-chunk
  keeper table (the duplicated MINORITY) broadcasts below a cap and
  the keep/rebuild pass is a second scan with NO doc-keyed exchange;
  above the cap it degrades to a distributed hash join + doc-keyed
  regroup, both paths pinned equal in pytest.
- ``anchor_text_index`` — inbound anchor-text profile per target
  host: (host, n_refs, n_unique_texts, top_anchor, top_n) where
  top_anchor is the modal anchor string (ties → lexicographically
  first).  Anchor text extraction shares the DOM tokenizer's tag
  regex + rawtext discipline (core/links.py:extract_anchors).  Edge
  rows pre-count map-side; the (host, text) aggregate is the only
  shuffle — at crawl scale that's the Zipf-truncated anchor
  vocabulary per host, not the edge set.
- ``robots_meta`` — per-page robots-exclusion flags
  (url, noindex, nofollow, n_meta) parsed from ``<meta name=robots>``
  start tags (core/links.py:meta_robots_flags); scan-shaped, no
  shuffle.  The synthetic crawl carries no robots directives (all
  flags false, n_meta counts the charset tags); the directive
  semantics (noindex / nofollow / none, casing, entity-decoded
  attrs, script-echoed fakes) are pinned on planted pages driven
  through the SAME Ray stage in pytest.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min, Sum

from ..functions.dedup import _fnv1a64_many
from .queries_r3s import _corpus_pages

_PYA = {"batch_format": "pyarrow"}

SPAN_W = 10                       # words per dedup span
_POS_BITS = 20                    # key = doc_id << 20 | pos
DUP_BROADCAST_CAP = 2_000_000     # duplicated-chunk hashes broadcast below


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def _doc_chunks(text: str) -> list[str]:
    """Consecutive SPAN_W-word chunks; split(' ') keeps empty tokens so
    the reassembled survivor text is byte-identical to the original
    when nothing is dropped (and so the DuckDB string_split twin sees
    the identical chunk strings)."""
    words = text.split(" ")
    return [" ".join(words[i: i + SPAN_W])
            for i in range(0, len(words), SPAN_W)]


def _chunk_tables(b: pa.Table):
    """Per-batch (doc_id, pos, key, h int64, chunk) arrays."""
    ids = b.column("doc_id").to_numpy(zero_copy_only=False)
    out_id, out_pos, out_h, out_chunk = [], [], [], []
    for i, text in enumerate(b.column("text").to_pylist()):
        chunks = _doc_chunks(text)
        out_id.append(np.full(len(chunks), ids[i], dtype=np.int64))
        out_pos.append(np.arange(len(chunks), dtype=np.int64))
        out_h.append(_fnv1a64_many(
            [c.encode("utf-8") for c in chunks]).view(np.int64))
        out_chunk.extend(chunks)
    if not out_id:
        z = np.array([], dtype=np.int64)
        return z, z, z, []
    return (np.concatenate(out_id), np.concatenate(out_pos),
            np.concatenate(out_h), out_chunk)


def _span_partials(b: pa.Table) -> pa.Table:
    """Map-side combined keeper partials: per unique chunk hash in the
    batch, (h, min key, occurrence count) — groupby-sum/min of these
    equals the corpus-wide values because the combine is associative."""
    ids, pos, h, _ = _chunk_tables(b)
    if ids.size == 0:
        return pa.table({"h": pa.array([], pa.int64()),
                         "k": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    key = (ids << _POS_BITS) | pos
    order = np.lexsort((key, h))
    hs, ks = h[order], key[order]
    first = np.ones(hs.size, dtype=bool)
    first[1:] = hs[1:] != hs[:-1]
    idx = np.flatnonzero(first)
    cnt = np.diff(np.append(idx, hs.size))
    return pa.table({"h": pa.array(hs[idx]), "k": pa.array(ks[idx]),
                     "c": pa.array(cnt.astype(np.int64))})


def _finish_rows(doc_ids, n_chunks, n_kept, texts) -> pa.Table:
    md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None
            else "" for t in texts]
    return pa.table({
        "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64)),
        "n_chunks": pa.array(np.asarray(n_chunks, dtype=np.int64)),
        "n_kept": pa.array(np.asarray(n_kept, dtype=np.int64)),
        "clean_md5": pa.array(md5s, pa.string()),
    })


def q_docs_span_dedup(sf_dir: str) -> ray.data.Dataset:
    """Remove every non-first occurrence of each 10-word span and
    report per doc (n_chunks, n_kept, md5 of the reassembled text;
    '' when every span of the doc was a non-first duplicate)."""
    import logging

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    # duplicated minority only: spans seen once keep themselves trivially
    dup = (docs.map_batches(_span_partials, **_PYA)
           .groupby("h")
           .aggregate(Min("k", alias_name="min_key"),
                      Sum("c", alias_name="n_occ"))
           .filter(expr="n_occ >= 2")
           .materialize())
    n_dup = dup.count()
    if n_dup <= DUP_BROADCAST_CAP:
        dt = dup.to_pandas()
        dh = np.asarray(dt["h"].to_numpy(), dtype=np.int64)
        dk = np.asarray(dt["min_key"].to_numpy(), dtype=np.int64)
        order = np.argsort(dh)
        dup_ref = ray.put((dh[order], dk[order]))

        def rebuild(b: pa.Table) -> pa.Table:
            dh, dk = ray.get(dup_ref)
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            out_id, out_n, out_kept, out_text = [], [], [], []
            for i, text in enumerate(b.column("text").to_pylist()):
                chunks = _doc_chunks(text)
                h = _fnv1a64_many(
                    [c.encode("utf-8") for c in chunks]).view(np.int64)
                key = (np.int64(ids[i]) << _POS_BITS) | np.arange(
                    len(chunks), dtype=np.int64)
                if dh.size:
                    idx = np.searchsorted(dh, h)
                    idx[idx == dh.size] = 0
                    in_dup = dh[idx] == h
                    keep = ~in_dup | (dk[idx] == key)
                else:
                    keep = np.ones(len(chunks), dtype=bool)
                kept = [c for c, f in zip(chunks, keep) if f]
                out_id.append(ids[i])
                out_n.append(len(chunks))
                out_kept.append(len(kept))
                out_text.append(" ".join(kept) if kept else None)
            return _finish_rows(out_id, out_n, out_kept, out_text)

        return docs.map_batches(rebuild, **_PYA)

    logging.getLogger(__name__).warning(
        "dup-span set %d > %d: distributed-join path", n_dup,
        DUP_BROADCAST_CAP)

    def chunk_rows(b: pa.Table) -> pa.Table:
        ids, pos, h, chunks = _chunk_tables(b)
        return pa.table({
            "doc_id": pa.array(ids), "pos": pa.array(pos),
            "h": pa.array(h), "chunk": pa.array(chunks, pa.string())})

    flagged = (docs.map_batches(chunk_rows, **_PYA)
               .join(dup.drop_columns(["n_occ"]), join_type="left_outer",
                     num_partitions=8, on=("h",)))

    def regroup(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = g.take(pc.sort_indices(g.column("pos")))
        key = ((g.column("doc_id").to_numpy(zero_copy_only=False)
                << _POS_BITS)
               | g.column("pos").to_numpy(zero_copy_only=False))
        # min_key is null for non-duplicated spans (left_outer miss)
        mk = g.column("min_key").to_pylist()
        keep = [m is None or m == k for m, k in zip(mk, key)]
        kept = [c for c, f in zip(g.column("chunk").to_pylist(), keep)
                if f]
        return _finish_rows(
            [g.column("doc_id")[0].as_py()], [g.num_rows],
            [len(kept)], [" ".join(kept) if kept else None])

    return flagged.groupby("doc_id").map_groups(regroup, **_PYA)


# --- anchor-text index -------------------------------------------------------

def _anchor_pair_rows(b: pa.Table) -> pa.Table:
    """Map-side pre-counted (host, txt, c) rows for every resolvable
    anchor on every page in the batch."""
    from ..core.encoding import decode_html
    from ..core.links import extract_anchors, host_of, resolve_url

    counts: dict[tuple[str, str], int] = {}
    for url, payload in zip(b.column("url").to_pylist(),
                            b.column("html").to_pylist()):
        if payload is None:
            continue
        text = decode_html(payload)[0] if isinstance(payload, bytes) \
            else str(payload)
        for href, txt in extract_anchors(text):
            absu = resolve_url(url, href)
            if absu is None:
                continue
            k = (host_of(absu), txt)
            counts[k] = counts.get(k, 0) + 1
    hosts = [k[0] for k in counts]
    txts = [k[1] for k in counts]
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "txt": pa.array(txts, pa.string()),
        "c": pa.array(list(counts.values()), pa.int64()),
    })


def q_anchor_text_index(sf_dir: str) -> ray.data.Dataset:
    """Per target host: total inbound anchors, distinct anchor strings,
    and the modal anchor string (count desc, text asc tie-break)."""
    pairs = (_corpus_pages(sf_dir)
             .map_batches(_anchor_pair_rows, **_PYA)
             .groupby(["host", "txt"])
             .aggregate(Sum("c", alias_name="c")))

    def fold(g: pa.Table) -> pa.Table:
        c = g.column("c").to_numpy(zero_copy_only=False)
        txts = g.column("txt").to_pylist()
        best = min(range(len(txts)), key=lambda i: (-c[i], txts[i]))
        return pa.table({
            "host": pa.array([g.column("host")[0].as_py()], pa.string()),
            "n_refs": pa.array([int(c.sum())], pa.int64()),
            "n_unique_texts": pa.array([g.num_rows], pa.int64()),
            "top_anchor": pa.array([txts[best]], pa.string()),
            "top_n": pa.array([int(c[best])], pa.int64()),
        })

    return pairs.groupby("host").map_groups(fold, **_PYA)


# --- robots meta -------------------------------------------------------------

def robots_flag_rows(b: pa.Table) -> pa.Table:
    """map_batches stage: (url, noindex, nofollow, n_meta) per page."""
    from ..core.encoding import decode_html
    from ..core.links import meta_robots_flags

    ni, nf, nm = [], [], []
    for payload in b.column("html").to_pylist():
        if payload is None:
            ni.append(False); nf.append(False); nm.append(0)
            continue
        text = decode_html(payload)[0] if isinstance(payload, bytes) \
            else str(payload)
        a, b2, c = meta_robots_flags(text)
        ni.append(a); nf.append(b2); nm.append(c)
    return pa.table({
        "url": b.column("url"),
        "noindex": pa.array(ni, pa.bool_()),
        "nofollow": pa.array(nf, pa.bool_()),
        "n_meta": pa.array(nm, pa.int64()),
    })


def q_robots_meta(sf_dir: str) -> ray.data.Dataset:
    return _corpus_pages(sf_dir).map_batches(robots_flag_rows, **_PYA)


def queries_r3t() -> dict:
    return {
        "docs_span_dedup": q_docs_span_dedup,
        "anchor_text_index": q_anchor_text_index,
        "robots_meta": q_robots_meta,
    }
