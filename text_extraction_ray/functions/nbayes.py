"""Distributed multinomial Naive Bayes over hashed token features.

The fasttext-shaped quality/language classifier of a crawl pipeline,
Ray-Data-first:

- **Train** is ONE aggregate pass: each batch emits pre-combined
  ``(label, h, c)`` partial token-hash counts (h = fnv1a64 & (dim-1),
  so the per-class state is BOUNDED at ``dim`` buckets regardless of
  vocabulary — the whole point of the hashing trick at crawl scale),
  a ``groupby([label, h]).Sum`` reduces them, and the resulting
  ≤ classes × dim table (≈1 MB dense at dim 2¹⁶) is collected and
  folded into dense log-probability arrays.  The collect is bounded
  BY CONSTRUCTION, unlike a vocabulary collect.
- **Score** broadcasts the model once (``ray.put``) and classifies
  inside ``map_batches``: per-doc hashed counts, ``score_c =
  log P(c) + Σ_h n_h · log P(h|c)``, argmax with the class order
  fixed (sorted labels) so ties are deterministic.

Both passes are scan-shaped; the only shuffle is the bounded
(label, h) aggregate.  Laplace-1 smoothing; all model math in float64
so a single-process recomputation is bit-identical (pinned in
tests/test_queries_r3u.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _fnv1a64_many

NB_DIM = 1 << 16


def _hash_tokens(text: str, dim: int = NB_DIM) -> np.ndarray:
    """Feature-hash bucket per whitespace token (uint64 fnv & mask)."""
    toks = text.split(" ")
    if not toks:
        return np.array([], dtype=np.int64)
    return (_fnv1a64_many([t.encode("utf-8") for t in toks])
            & np.uint64(dim - 1)).astype(np.int64)


def nb_partials(b: pa.Table, text_col: str = "text",
                label_col: str = "lang", dim: int = NB_DIM) -> pa.Table:
    """Map-side combined (label, h, c) token-bucket counts + per-label
    doc counts carried as h = -1 rows (one shuffle carries both)."""
    per_label: dict[str, np.ndarray] = {}
    docs: dict[str, int] = {}
    for text, label in zip(b.column(text_col).to_pylist(),
                           b.column(label_col).to_pylist()):
        h = _hash_tokens(text, dim)
        acc = per_label.get(label)
        if acc is None:
            acc = per_label[label] = np.zeros(dim, dtype=np.int64)
        np.add.at(acc, h, 1)
        docs[label] = docs.get(label, 0) + 1
    labels, hs, cs = [], [], []
    for label, acc in per_label.items():
        nz = np.flatnonzero(acc)
        labels.extend([label] * (nz.size + 1))
        hs.append(nz.astype(np.int64))
        hs.append(np.array([-1], dtype=np.int64))
        cs.append(acc[nz])
        cs.append(np.array([docs[label]], dtype=np.int64))
    if not labels:
        return pa.table({"label": pa.array([], pa.string()),
                         "h": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    return pa.table({"label": pa.array(labels, pa.string()),
                     "h": pa.array(np.concatenate(hs)),
                     "c": pa.array(np.concatenate(cs))})


class NBModel:
    """Dense smoothed log-prob model; built from the reduced
    (label, h, c) table, broadcast once for scoring."""

    def __init__(self, classes: list[str], log_prior: np.ndarray,
                 log_cond: np.ndarray):
        self.classes = classes
        self.log_prior = log_prior      # (C,)
        self.log_cond = log_cond        # (C, dim)

    @staticmethod
    def from_counts(rows: pa.Table, dim: int = NB_DIM) -> "NBModel":
        import pandas as pd

        labels = rows.column("label").to_pylist()
        hs = np.asarray(rows.column("h").to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        cs = np.asarray(rows.column("c").to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        codes, classes = pd.factorize(
            np.array(labels, dtype=object), sort=True)
        counts = np.zeros((len(classes), dim), dtype=np.float64)
        docs = np.zeros(len(classes), dtype=np.float64)
        tok = hs >= 0
        counts[codes[tok], hs[tok]] = cs[tok]
        np.add.at(docs, codes[~tok], cs[~tok])
        tot = counts.sum(axis=1)
        log_cond = np.log(counts + 1.0) - np.log(
            tot + float(dim))[:, None]
        log_prior = np.log(docs) - np.log(docs.sum())
        return NBModel(list(classes), log_prior, log_cond)

    def predict(self, text: str, dim: int = NB_DIM) -> str:
        h = _hash_tokens(text, dim)
        u, n = np.unique(h, return_counts=True)
        score = self.log_prior + self.log_cond[:, u] @ n.astype(
            np.float64)
        return self.classes[int(np.argmax(score))]


def train_nb(ds, text_col: str = "text", label_col: str = "lang",
             dim: int = NB_DIM) -> NBModel:
    """One distributed aggregate pass → NBModel.  The collect is
    bounded at classes × dim rows by the hashing trick."""
    from ray.data.aggregate import Sum

    rows = (ds.map_batches(
                lambda b: nb_partials(b, text_col, label_col, dim),
                batch_format="pyarrow")
            .groupby(["label", "h"])
            .aggregate(Sum("c", alias_name="c")))
    return NBModel.from_counts(
        pa.Table.from_pandas(rows.to_pandas()), dim)


class NBScorer:
    """Actor-pool scoring stage: model fetched once per actor."""

    def __init__(self, model_ref, text_col: str = "text",
                 label_col: str = "lang", dim: int = NB_DIM):
        import ray

        self.model: NBModel = ray.get(model_ref)
        self.text_col, self.label_col, self.dim = text_col, label_col, dim

    def __call__(self, b: pa.Table) -> pa.Table:
        preds = [self.model.predict(t, self.dim)
                 for t in b.column(self.text_col).to_pylist()]
        return pa.table({
            "label": b.column(self.label_col),
            "pred": pa.array(preds, pa.string()),
        })
