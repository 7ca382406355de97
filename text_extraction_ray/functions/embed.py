"""Deterministic text embeddings: hashed n-gram (feature-hashing)
vectorizer.

No model weights exist in this sandbox, so the embedding stage that a real
pipeline would run with a transformer is implemented as the classic
feature-hashing trick (Weinberger et al., ICML 2009): word unigrams +
bigrams hashed into ``dim`` buckets with a sign hash, then L2-normalized.
Deterministic, vocabulary-free, and linear-time — and it preserves cosine
similarity well enough that near-duplicate texts embed near each other,
which is what the downstream ANN / near-dup / centroid operators need.

Ray-side: a stateless ``map_batches`` stage (the hasher is a pure
function; a transformer swap would make this an actor-pool stage with the
model loaded in ``__init__``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import zlib

DIM = 64


def embed_text(text: str, dim: int = DIM) -> np.ndarray:
    """crc32 feature hashing: C-speed, deterministic across processes
    (unlike builtin ``hash``), index from the low bits, sign from bit 31."""
    words = (text or "").lower().split()
    vec = np.zeros(dim, dtype=np.float64)
    crc = zlib.crc32
    for g in words:
        h = crc(g.encode("utf-8"))
        vec[h % dim] += 1.0 if h & 0x80000000 else -1.0
    for a, b in zip(words, words[1:]):
        h = crc((a + " " + b).encode("utf-8"))
        vec[h % dim] += 1.0 if h & 0x80000000 else -1.0
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def embed_batch(batch: pa.Table, text_col: str = "text",
                dim: int = DIM) -> pa.Table:
    """Adds ``embedding: list<double>[dim]`` per row."""
    vecs = [embed_text(t, dim).tolist()
            for t in batch.column(text_col).to_pylist()]
    return batch.append_column(
        "embedding", pa.array(vecs, type=pa.list_(pa.float64())))
