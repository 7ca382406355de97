"""Round-3 continuation batch Y: host template detection + random-
projection ANN with exact rescoring.

- ``host_template_ratio`` — per-host fraction of bytes living in
  content-defined chunks shared by ≥ half of the host's pages
  (functions/cdc.py: vectorized FNV window hashing, rsync/LBFS-style
  boundaries).  One (host, chunk) aggregate over short hash rows —
  no pairwise page comparison anywhere.  The synthetic sites share
  nav/sidebar markup per host so real ratios are materially > 0;
  pytest additionally plants one template-heavy and one all-unique
  host and pins the ordering plus a full single-process recompute.
- ``ann_rp_rescore`` — the two-stage ANN pattern: score candidates
  under a 32-dim deterministic Gaussian random projection
  (Johnson-Lindenstrauss, fixed seed; half the multiply-adds per row
  at crawl scale and the candidate pool is a fixed 150 rows however
  large the corpus), then EXACTLY rescore only the candidates and
  return the true-cosine top-10.  Candidate recall vs the exact
  brute force (``ann_top10``) is pinned ≥ 0.8 in pytest, and every
  returned score equals the exact score by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..functions.cdc import fold_host_template, host_template_rows

_PYA = {"batch_format": "pyarrow"}

RP_DIM = 32
RP_CANDIDATES = 150


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def q_host_template_ratio(sf_dir: str) -> ray.data.Dataset:
    from .queries_r3s import _corpus_pages

    rows = _corpus_pages(sf_dir).map_batches(host_template_rows, **_PYA)
    reduced = (rows.groupby(["host", "ch", "marker"])
               .aggregate(Sum("n", alias_name="n"),
                          Sum("nb", alias_name="nb")))
    return reduced.groupby("host").map_groups(fold_host_template, **_PYA)


_RP_SEED = 0x52503331


def _rp_matrix(dim_in: int, dim_out: int = RP_DIM) -> np.ndarray:
    """Deterministic Gaussian JL projection (fixed seed — identical on
    every worker, the LSH-plane discipline of similarity.py; a
    splitmix-bit sign matrix was tried first and rejected: sequential-
    index bit-0 signs leave columns ~0.8-correlated, killing recall)."""
    rs = np.random.RandomState(_RP_SEED)
    return rs.randn(dim_in, dim_out) / np.sqrt(dim_out)


def q_ann_rp_rescore(sf_dir: str) -> ray.data.Dataset:
    import os

    import pyarrow.parquet as pq

    from ..functions.similarity import (_matrix_from_batch, _normalize,
                                        score_batch_factory)
    from ..functions.topk import topk
    from .queries import _query_vec

    q = _query_vec(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    rp = _rp_matrix(q.shape[0])
    qn = q / np.linalg.norm(q) if np.linalg.norm(q) else q
    q_rp = qn @ rp

    def rp_score(b: pa.Table) -> pa.Table:
        mat = _normalize(_matrix_from_batch(b, "embedding"))
        s = (mat @ rp) @ q_rp
        return pa.table({"vec_id": b.column("vec_id"),
                         "embedding": b.column("embedding"),
                         "rp_score": pa.array(s)})

    cands = topk(ds.map_batches(rp_score, **_PYA),
                 ["rp_score", "vec_id"], RP_CANDIDATES,
                 descending=[True, False])
    exact = cands.map_batches(score_batch_factory(q), **_PYA)
    return topk(exact.select_columns(["vec_id", "cos"]),
                ["cos", "vec_id"], 10, descending=[True, False])


def queries_r3y() -> dict:
    return {
        "host_template_ratio": q_host_template_ratio,
        "ann_rp_rescore": q_ann_rp_rescore,
    }
