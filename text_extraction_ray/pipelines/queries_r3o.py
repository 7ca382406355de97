"""Round-3 continuation batch O: product-quantized ANN (plus, tested
alongside: malformed-row tolerance in the jsonl/csv job sources).

One registered query: PQ top-10 over the embedding column — the
compression half of similarity search at 100 TB (64 float dims → 8
single-byte codes, 32×; asymmetric-distance search touches only codes
and an m×ksub lookup table).  Brute force is the accuracy ceiling,
IVF/LSH prune candidates, PQ shrinks what they scan — together the
standard large-scale ANN stack.

Registered rows-only; accuracy is pinned against the oracled
brute-force top-10 (recall) in tests/test_queries_r3o.
"""

from __future__ import annotations

import ray.data


def q_ann_pq(sf_dir: str) -> ray.data.Dataset:
    """PQ ADC top-10 for the standard query vector (vec_id 0, like
    ann_top10/ann_lsh/ann_ivf)."""
    from ..functions.similarity import ann_pq_topk
    from .queries import _query_vec, read_table

    vec = _query_vec(sf_dir)
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann_pq_topk(ds, vec, k=10)


def queries_r3o() -> dict:
    return {
        "ann_pq": q_ann_pq,
    }
