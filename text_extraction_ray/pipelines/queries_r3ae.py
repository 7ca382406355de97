"""Round-3 continuation batch AE: banded theta-join + incremental
near-dup against a persisted LSH index.

- ``events_value_band_join`` — the inequality (theta) join
  same-user |click.value − purchase.value| ≤ ε as a BANDED equi-join
  on (user, band): value space splits into ε-wide bands, every row
  replicates down one band (×2 blow-up, the standard reduction), the
  join runs per (user, band) key, the ε predicate filters inside the
  band, and the floor(min/ε) owner rule kills cross-band duplicates
  without a distinct pass.  No all-pairs stage anywhere; the
  exchange is 2× the row count keyed by (user, band).  DuckDB
  inequality-join twin pinned in pytest at two scales.
- ``incremental_neardup`` — the recrawl dedup loop at index
  granularity: crawl A's MinHash band rows persist ONCE as the
  parquet LSH index (lean: (band, bucket, doc_id) + a separate
  (doc_id, sig) table); crawl B (a planted mutation of A: exact
  copies, one-word edits, fresh docs) computes its own band rows and
  equi-joins the index on (band, bucket) — only matching buckets
  move, the index is never broadcast — then the bounded candidate
  set verifies against true signature similarity ≥ 0.7, with BOTH
  sig lookups pruned to candidate ids (row-filtered parquet read on
  the A side, candidate-only recompute on the B side) so driver
  memory is O(candidates), never O(corpus).  New docs never pay a
  pairwise pass against the old corpus.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Min

from ..functions.dedup import (NUM_PERM, minhash_band_rows,
                               minhash_sig_batch)

_PYA = {"batch_format": "pyarrow"}

BAND_EPS = 10.0          # theta-join tolerance on events.value
NEARDUP_SIM = 0.7


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


# --- banded theta join --------------------------------------------------------

def q_events_value_band_join(sf_dir: str) -> ray.data.Dataset:
    ev = _read(sf_dir, "events",
               ["event_id", "event_type", "value", "user_id"])

    def band_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("event_type"),
                              value_set=pa.array(["click", "purchase"])))
        v = b.column("value").to_numpy(zero_copy_only=False)
        band = np.floor(v / BAND_EPS).astype(np.int64)
        out = pa.concat_tables([b, b])
        # replicate DOWN: the pair is claimed by floor(min(va,vb)/eps),
        # where the lower row sits natively; the higher row can be at
        # most one band above, so its band-1 replica lands there
        return out.append_column(
            "band", pa.array(np.concatenate([band, band - 1])))

    banded = ev.map_batches(band_rows, **_PYA)

    def join_band(g: pa.Table) -> pa.Table:
        # only click/purchase rows survive band_rows' filter, so
        # not-click == purchase (one vectorized compare, no pylist)
        is_click = pc.equal(g.column("event_type"),
                            "click").to_numpy(zero_copy_only=False)
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        v = g.column("value").to_numpy(zero_copy_only=False)
        band = int(g.column("band")[0].as_py())
        a = np.flatnonzero(is_click)
        b = np.flatnonzero(~is_click)
        if not a.size or not b.size:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "diff": pa.array([], pa.float64())})
        diff = np.abs(v[a][:, None] - v[b][None, :])
        # claim a pair only in the band of min(va, vb): kills the
        # duplicate from the ×2 replication without a distinct pass
        vmin = np.minimum(v[a][:, None], v[b][None, :])
        owner = np.floor(vmin / BAND_EPS).astype(np.int64) == band
        ai, bi = np.nonzero((diff <= BAND_EPS) & owner)
        return pa.table({
            "id_a": pa.array(ids[a][ai]),
            "id_b": pa.array(ids[b][bi]),
            "diff": pa.array(np.round(diff[ai, bi], 6)),
        })

    return (banded.groupby(["user_id", "band"])
            .map_groups(join_band, **_PYA))


SQL_EVENTS_VALUE_BAND_JOIN = f"""
SELECT a.event_id AS id_a, b.event_id AS id_b,
       ROUND(ABS(a.value - b.value), 6) AS diff
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND ABS(a.value - b.value) <= {BAND_EPS}
"""


# --- incremental near-dup -----------------------------------------------------

def recrawl_docs(sf_dir: str) -> pa.Table:
    """Planted crawl B derived from the documents table: doc_id+10⁶,
    i%5==0 exact copies of A, i%5==1 one-word edits (near-dups),
    otherwise fresh shuffled-vocab docs."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    out_id, out_text = [], []
    for i, (did, text) in enumerate(zip(ids, texts)):
        nid = did + 1_000_000
        if i % 5 == 0:
            nt = text
        elif i % 5 == 1:
            words = text.split(" ")
            words[len(words) // 2] = "EDITED"
            nt = " ".join(words)
        else:
            words = text.split(" ")
            nt = " ".join(f"fresh{(did * 31 + j) % 997}"
                          for j in range(len(words)))
        out_id.append(nid)
        out_text.append(nt)
    return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                     "text": pa.array(out_text, pa.string())})


def _lsh_index_dir(sf_dir: str) -> str:
    """Persist crawl A's LSH index once: band rows (no sig) + sigs."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = os.path.join(tempfile.gettempdir(), f"tx_lshidx_{tag}")
    stamp = os.path.join(root, "_STAMP")
    want = "v=1"
    if os.path.exists(stamp) and open(stamp).read() == want:
        return root
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def bands_only(b: pa.Table) -> pa.Table:
        r = minhash_band_rows(b)
        return r.drop_columns(["sig"])

    def sig_rows(b: pa.Table) -> pa.Table:
        sigs = minhash_sig_batch(b.column("text").to_pylist())
        return pa.table({
            "doc_id": b.column("doc_id"),
            "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
        })

    (docs.map_batches(bands_only, **_PYA)
     .write_parquet(os.path.join(root, "bands")))
    (docs.map_batches(sig_rows, **_PYA)
     .write_parquet(os.path.join(root, "sigs")))
    with open(stamp, "w") as f:
        f.write(want)
    return root


def q_incremental_neardup(sf_dir: str) -> pa.Table:
    import logging

    root = _lsh_index_dir(sf_dir)
    nd = recrawl_docs(sf_dir)
    new_docs = ray.data.from_arrow(nd)
    idx = ray.data.read_parquet(os.path.join(root, "bands"))

    def bands_only(b: pa.Table) -> pa.Table:
        r = minhash_band_rows(b)
        return r.drop_columns(["sig"])

    probe = (new_docs.map_batches(bands_only, **_PYA)
             .map_batches(lambda b: b.rename_columns(
                 ["new_id", "band", "bucket"]), **_PYA))
    cand = (probe.join(idx, join_type="inner", num_partitions=4,
                       on=("band", "bucket"))
            .groupby(["new_id", "doc_id"])
            .aggregate(Min("band", alias_name="first_band")))
    pairs = cand.to_pandas()          # bounded: LSH candidates only
    if len(pairs) > 100_000:
        logging.getLogger(__name__).warning(
            "incremental neardup candidates %d: verify stays "
            "distributed above this in production", len(pairs))
    # verify: true signature similarity.  Both sig lookups are pruned
    # to the CANDIDATE ids before anything reaches the driver — the
    # old-corpus sig table is row-filtered at the parquet read and the
    # new-crawl sigs are computed only for candidate docs, so driver
    # memory is O(candidates), never O(corpus).
    cand_old = pa.array(sorted(set(pairs["doc_id"].astype(int))),
                        pa.int64())
    cand_new = pa.array(sorted(set(pairs["new_id"].astype(int))),
                        pa.int64())
    sigs_a = pq.read_table(
        os.path.join(root, "sigs"),
        filters=[("doc_id", "in", cand_old)])
    sa = {d: np.frombuffer(s, dtype=np.uint64)
          for d, s in zip(sigs_a.column("doc_id").to_pylist(),
                          sigs_a.column("sig").to_pylist())}
    sub = nd.filter(pc.is_in(nd.column("doc_id"), value_set=cand_new))
    new_sigs = minhash_sig_batch(sub.column("text").to_pylist())
    sb = {d: s for d, s in zip(sub.column("doc_id").to_pylist(),
                               new_sigs)}
    out_new, out_old, out_sim = [], [], []
    for nid, oid in zip(pairs["new_id"], pairs["doc_id"]):
        sim = float((sb[int(nid)] == sa[int(oid)]).sum()) / NUM_PERM
        if sim >= NEARDUP_SIM:
            out_new.append(int(nid))
            out_old.append(int(oid))
            out_sim.append(np.floor(sim * 1e6 + 0.5) / 1e6)
    return pa.table({
        "new_id": pa.array(out_new, pa.int64()),
        "old_id": pa.array(out_old, pa.int64()),
        "sim": pa.array(out_sim, pa.float64()),
    })


def queries_r3ae() -> dict:
    return {
        "events_value_band_join": q_events_value_band_join,
        "incremental_neardup": q_incremental_neardup,
    }
