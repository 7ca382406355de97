"""Round-3 continuation batch X: snapshot diffing + KMV distinct
sketch.

- ``snapshot_diff`` — the crawl-ops diff between two extraction
  generations: both snapshots reduce to (url, sha16(extracted_text))
  inside the scan, a full-outer join on url classifies every url as
  added / removed / changed / unchanged, and one tiny aggregate
  returns (status, n_urls).  The fixture plants each class
  deterministically (re-crawled pages with new payloads, identical
  re-crawls, fresh urls, dropped urls) and pytest pins the exact
  counts AND the per-url classification against a single-process
  recompute.  Scale shape: the join ships 16-byte digests + urls,
  never text; both snapshot reads prune to (url, extracted_text).
- ``events_kmv_distinct`` — K-Minimum-Values distinct-count sketch
  per event_type: map-side each batch keeps its k smallest
  splitmix64(user_id) values (deduped), one (type, hv) shuffle of
  ≤ k · n_batches short rows, and the per-type fold estimates
  distinct = (k-1) / u_(k) (u normalized to (0,1)), exact when the
  group holds < k values.  Deterministic by construction (hashes,
  not RNG) and partitioning-invariant — both pinned in pytest, with
  accuracy vs the exact distinct (k=256 → σ≈6%).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from .extraction import default_concurrency as _conc

_PYA = {"batch_format": "pyarrow"}

KMV_K = 256


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


# --- snapshot diff ----------------------------------------------------------

def _snapshot_pages(sf_dir: str):
    """Two deterministic page generations (old, new) planted so every
    diff class is non-empty."""
    from ..schemas import PAGES
    from ..sources.synth import make_row

    import datetime as dt

    old_rows = [make_row(i) for i in range(100)]
    changed = []
    for i in range(15):               # same url, newer crawl, new payload
        r = dict(old_rows[i])
        r["warc_ts"] = r["warc_ts"] + dt.timedelta(hours=3)
        r["html"] = make_row(2000 + i)["html"]
        changed.append(r)
    unchanged = [dict(r) for r in old_rows[15:80]]
    fresh = [make_row(500 + i) for i in range(10)]   # added
    # urls 80..99 are dropped from the new crawl → removed
    new_rows = changed + unchanged + fresh

    def tbl(rows):
        cols = {n: [r[n] for r in rows] for n in PAGES.names}
        return pa.Table.from_pydict(cols, schema=PAGES)

    return tbl(old_rows), tbl(new_rows)


def _url_sha(out_ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    def fold(b: pa.Table) -> pa.Table:
        shas = [hashlib.sha256((t or "").encode("utf-8")).hexdigest()[:16]
                for t in b.column("extracted_text").to_pylist()]
        return pa.table({"url": b.column("url"),
                         col: pa.array(shas, pa.string())})

    return out_ds.map_batches(fold, **_PYA)


def q_snapshot_diff(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Count

    from .extraction import extract_pages

    from .analysis import dedup_keep_latest

    old_pages, new_pages = _snapshot_pages(sf_dir)
    # a snapshot is url-keyed: keep-latest resolves same-url recrawls
    # WITHIN a generation before the generations are compared
    old_out = dedup_keep_latest(extract_pages(
        ray.data.from_arrow(old_pages), mode="single_pass",
        concurrency=_conc(), batch_size=32))
    new_out = dedup_keep_latest(extract_pages(
        ray.data.from_arrow(new_pages), mode="single_pass",
        concurrency=_conc(), batch_size=32))
    joined = (_url_sha(old_out, "sha_old")
              .join(_url_sha(new_out, "sha_new"),
                    join_type="full_outer", num_partitions=4,
                    on=("url",)))

    def classify(b: pa.Table) -> pa.Table:
        so = b.column("sha_old").to_pylist()
        sn = b.column("sha_new").to_pylist()
        status = ["added" if o is None else
                  "removed" if n is None else
                  "unchanged" if o == n else "changed"
                  for o, n in zip(so, sn)]
        return pa.table({"status": pa.array(status, pa.string())})

    counts = (joined.map_batches(classify, **_PYA)
              .groupby("status").aggregate(Count(alias_name="n_urls")))
    return counts.to_pandas().sort_values("status").reset_index(drop=True)


# --- KMV distinct sketch ------------------------------------------------------

def _mix64(v: np.ndarray) -> np.ndarray:
    x = v.astype(np.int64).view(np.uint64).copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def kmv_partials(b: pa.Table, key_col: str = "user_id",
                 group_col: str = "event_type",
                 k: int = KMV_K) -> pa.Table:
    """Per (group, batch): the k smallest distinct hash values —
    a mergeable bottom-k sketch (bottom-k of a union == bottom-k of
    the concatenated bottom-k's)."""
    groups = b.column(group_col).to_pylist()
    keys = b.column(key_col).to_numpy(zero_copy_only=False)
    # int64 view for Ray-native columns; every sort/unique re-views
    # as uint64 so the bottom-k order is the unsigned one
    hv = _mix64(keys).view(np.int64)
    out_g, out_h = [], []
    import pandas as pd

    codes, uniq = pd.factorize(np.array(groups, dtype=object), sort=False)
    for gi, g in enumerate(uniq):
        vals = np.unique(hv[codes == gi].view(np.uint64))
        vals = vals[:k] if vals.size > k else vals
        out_g.extend([g] * vals.size)
        out_h.append(vals.view(np.int64))
    if not out_g:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "hv": pa.array([], pa.int64())})
    return pa.table({"event_type": pa.array(out_g, pa.string()),
                     "hv": pa.array(np.concatenate(out_h))})


def q_events_kmv_distinct(sf_dir: str) -> ray.data.Dataset:
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    parts = ev.map_batches(kmv_partials, **_PYA)

    def fold(g: pa.Table) -> pa.Table:
        vals = np.unique(
            g.column("hv").to_numpy(zero_copy_only=False)
            .view(np.uint64))
        k = KMV_K
        if vals.size < k:
            est = float(vals.size)
        else:
            u_k = (float(vals[k - 1]) + 1.0) / 2.0 ** 64
            est = (k - 1) / u_k
        return pa.table({
            "event_type": pa.array([g.column("event_type")[0].as_py()],
                                   pa.string()),
            "n_distinct_est": pa.array([int(round(est))], pa.int64()),
        })

    return parts.groupby("event_type").map_groups(fold, **_PYA)


def queries_r3x() -> dict:
    return {
        "snapshot_diff": q_snapshot_diff,
        "events_kmv_distinct": q_events_kmv_distinct,
    }
