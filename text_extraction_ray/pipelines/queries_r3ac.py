"""Round-3 continuation batch AC: link reciprocity + KWIC concordance.

- ``host_reciprocal_links`` — link-farm fingerprinting on the web
  graph: host-pair edges collapse to UNORDERED pairs
  ((min, max) host key) in one aggregate that counts each direction
  separately, so a pair is reciprocal iff both directional counts
  are positive — the A↔B mutual-linking signal spam classifiers key
  on, computed with a single shuffle of short host-pair rows and no
  self-join (the classic formulation joins the edge set against its
  own transpose; encoding direction INTO the aggregate removes that
  second pass over the edges).  Runs on the cross-linked fixture
  corpus (queries_r3aa), whose injected related-page refs cross
  hosts.
- ``kwic_search`` — keyword-in-context concordance (the search-index
  primitive): every occurrence of a query term in the documents
  table with ±3 words of context, capped per doc (cap logged
  implicitly in n_hits vs rows), scan-shaped with zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

_PYA = {"batch_format": "pyarrow"}

KWIC_TERM = "window"
KWIC_CTX = 3
KWIC_PER_DOC = 3


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def _edge_rows(b: pa.Table) -> pa.Table:
    """Unordered host-pair rows with the direction encoded:
    (lo, hi, fwd, rev) where fwd counts lo→hi edges and rev hi→lo."""
    from ..core.links import page_links_batch

    e = page_links_batch(b)
    src = e.column("src_host").to_pylist()
    dst = e.column("dst_host").to_pylist()
    lo, hi, fwd, rev = [], [], [], []
    for s, d in zip(src, dst):
        if s == d:
            continue                      # self-loops carry no signal
        if s < d:
            lo.append(s); hi.append(d); fwd.append(1); rev.append(0)
        else:
            lo.append(d); hi.append(s); fwd.append(0); rev.append(1)
    return pa.table({
        "lo": pa.array(lo, pa.string()),
        "hi": pa.array(hi, pa.string()),
        "fwd": pa.array(np.array(fwd, dtype=np.int64)),
        "rev": pa.array(np.array(rev, dtype=np.int64)),
    })


def q_host_reciprocal_links(sf_dir: str) -> ray.data.Dataset:
    from .extraction import read_pages
    from .queries_r3aa import _linked_corpus

    pages = read_pages(_linked_corpus(sf_dir), columns=["url", "html"])
    pairs = (pages.map_batches(_edge_rows, **_PYA)
             .groupby(["lo", "hi"])
             .aggregate(Sum("fwd", alias_name="n_fwd"),
                        Sum("rev", alias_name="n_rev")))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fwd = b.column("n_fwd").to_numpy(zero_copy_only=False)
        rev = b.column("n_rev").to_numpy(zero_copy_only=False)
        return b.append_column(
            "reciprocal", pa.array((fwd > 0) & (rev > 0)))

    return pairs.map_batches(finish, **_PYA)


def kwic_rows(b: pa.Table, term: str = KWIC_TERM, ctx: int = KWIC_CTX,
              per_doc: int = KWIC_PER_DOC) -> pa.Table:
    ids = b.column("doc_id").to_numpy(zero_copy_only=False)
    out_id, out_pos, out_left, out_right, out_hits = [], [], [], [], []
    for i, text in enumerate(b.column("text").to_pylist()):
        words = text.split(" ")
        hits = [j for j, w in enumerate(words) if w == term]
        for j in hits[:per_doc]:
            out_id.append(ids[i])
            out_pos.append(j)
            out_left.append(" ".join(words[max(0, j - ctx):j]))
            out_right.append(" ".join(words[j + 1:j + 1 + ctx]))
            out_hits.append(len(hits))
    return pa.table({
        "doc_id": pa.array(np.array(out_id, dtype=np.int64)),
        "pos": pa.array(np.array(out_pos, dtype=np.int64)),
        "left_ctx": pa.array(out_left, pa.string()),
        "right_ctx": pa.array(out_right, pa.string()),
        "n_hits": pa.array(np.array(out_hits, dtype=np.int64)),
    })


def q_kwic_search(sf_dir: str) -> ray.data.Dataset:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(kwic_rows, **_PYA)


def queries_r3ac() -> dict:
    return {
        "host_reciprocal_links": q_host_reciprocal_links,
        "kwic_search": q_kwic_search,
    }
