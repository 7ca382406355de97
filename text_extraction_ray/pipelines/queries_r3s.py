"""Round-3 continuation batch S: web link graph + host PageRank.

- ``link_graph`` — per-host outlink profile of the synthetic crawl:
  anchors extracted from raw HTML with the DOM tokenizer's tag regex
  and rawtext discipline, resolved to absolute URLs (RFC 3986
  urljoin, fragments dropped, non-http schemes skipped), aggregated
  to (src_host, n_links, n_internal, n_unique_targets).  Registered
  rows-only; pinned in pytest against an independent per-page
  recomputation and href-extraction unit fixtures.
- ``host_pagerank`` — PageRank over that edge set (damping 0.85,
  20 iterations).  The synthetic crawl's links are all
  site-relative, so the host graph is pure self-loops and the ranks
  collapse to the host crawl-share — asserted exactly in pytest,
  with the STRUCTURAL behaviour (chain/star graphs, dangling mass)
  pinned against a dense numpy power iteration on planted fixtures.
  Scale shape: the rank vector is per-HOST (bounded ~10⁸) and
  broadcast per iteration; edges never shuffle at all (map-side
  dense partial contribution vectors, driver tree-sum).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

_PYA = {"batch_format": "pyarrow"}


def _corpus_pages(sf_dir: str):
    from ..sources.synth import gen_corpus
    from .extraction import read_pages

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    corpus = os.path.join(tempfile.gettempdir(), f"tx_pages_{tag}")
    gen_corpus(corpus, 500, seed=42, n_shards=8)
    return read_pages(corpus, columns=["url", "html"])


def _edges(sf_dir: str):
    from ..core.links import page_links_batch

    return _corpus_pages(sf_dir).map_batches(page_links_batch, **_PYA)


def q_link_graph(sf_dir: str) -> ray.data.Dataset:
    """Per-host outlink profile of the crawl."""
    def mark(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "src_host": b.column("src_host"),
            "dst_url": b.column("dst_url"),
            "internal": pc.cast(b.column("internal"), pa.int64()),
        })

    per_edge = _edges(sf_dir).map_batches(mark, **_PYA)
    # unique targets needs a distinct; count + internal are plain sums —
    # one groupby over (src_host, dst_url) gives all three without a
    # second pass over raw edges
    pair = (per_edge.groupby(["src_host", "dst_url"])
            .aggregate(Count(alias_name="n"),
                       Sum("internal", alias_name="n_int")))

    def fold(b: pa.Table) -> pa.Table:
        return pa.table({
            "src_host": b.column("src_host"),
            "n_links": b.column("n"),
            "n_internal": b.column("n_int"),
            "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
        })

    return (pair.map_batches(fold, **_PYA)
            .groupby("src_host")
            .aggregate(Sum("n_links", alias_name="n_links"),
                       Sum("n_internal", alias_name="n_internal"),
                       Sum("one", alias_name="n_unique_targets")))


def q_host_pagerank(sf_dir: str) -> pa.Table:
    from ..core.links import pagerank

    t = pagerank(_edges(sf_dir), damping=0.85, iters=20)
    rank = np.asarray(t.column("rank").to_numpy(zero_copy_only=False))
    q = 10.0 ** 9
    return pa.table({
        "host": t.column("host"),
        "rank": pa.array(np.floor(rank * q + 0.5) / q),
    })


def queries_r3s() -> dict:
    return {
        "link_graph": q_link_graph,
        "host_pagerank": q_host_pagerank,
    }
