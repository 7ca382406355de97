"""Mergeable sketch operators — the 100 TB scale path for frequency and
quantile questions (SURVEY SS2 custom-operator rule; round 2).

- ``heavy_tokens``: exact heavy hitters by a two-pass sketch.  Pass 1 is a
  per-batch frequent-items summary (exact within the batch, thresholded at
  half the global ratio — the Misra-Gries guarantee by pigeonhole: any
  token with global share >= 1/R must exceed n_batch/(2R) in at least one
  batch, so the union of per-batch candidates is a SUPERSET of the true
  heavy hitters).  Pass 2 re-counts ONLY the candidate tokens exactly and
  applies the true threshold — so the final counts are EXACT and the
  operator is SQL-oracle-able, while the shuffle never carries the full
  token vocabulary (bounded by candidates x batches, not distinct tokens).
- ``grouped_quantile_sketch``: per-group quantiles from a fixed log-spaced
  histogram.  Each batch folds its values into (group, bin, n) partial
  rows (np.searchsorted, vectorized); the groupby sums bins — the shuffle
  carries at most groups x n_bins rows regardless of input size.  Error is
  bounded by the bin ratio (~3% at 512 bins over 7 decades); the exact
  per-group-sort quantile operator remains for when exactness matters.

Both are deterministic (no RNG) and mergeable (partials sum), the two
properties a sketch needs to ride Ray Data's map/combine machinery.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Max, Sum

_TOKEN_RE = r"\S+"


def _batch_token_counts(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(unique tokens, counts) of a batch — exact, vectorized unique."""
    toks: list[str] = []
    for t in texts:
        toks.extend((t or "").split())
    if not toks:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    uniq, counts = np.unique(np.asarray(toks, dtype=object),
                             return_counts=True)
    return uniq, counts


def heavy_tokens(ds: ray.data.Dataset, total_tokens: int | None = None,
                 ratio: int = 200, text_col: str = "text"
                 ) -> ray.data.Dataset:
    """Tokens appearing >= ceil(total_tokens / ratio) times, with EXACT
    counts.  When ``total_tokens`` is None (the default) the candidate
    pass also carries per-batch token totals, so the WHOLE operator costs
    exactly two text scans: candidates+totals, then exact re-count."""

    def candidates(b: pa.Table) -> pa.Table:
        uniq, counts = _batch_token_counts(b.column(text_col).to_pylist())
        n_batch = int(counts.sum())
        # half-threshold per batch guarantees a candidate superset
        keep = counts > n_batch / (2.0 * ratio)
        toks = uniq[keep].tolist()
        return pa.table({
            # one extra null-token row per batch carries the batch total;
            # the summary stays tiny (candidates are bounded per batch)
            "token": pa.array(toks + [None], type=pa.string()),
            "n_batch": pa.array([0] * len(toks) + [n_batch],
                                type=pa.int64()),
        })

    summary = ds.map_batches(
        candidates, batch_format="pyarrow").materialize()  # SMALL table
    cand = set(t for t in summary.unique("token") if t is not None)
    if total_tokens is None:
        total_tokens = int(summary.sum("n_batch") or 0)
    threshold = math.ceil(total_tokens / ratio)
    cand_ref = ray.put(cand)

    def exact_counts(b: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)
        uniq, counts = _batch_token_counts(b.column(text_col).to_pylist())
        keep = np.array([t in cset for t in uniq], dtype=bool)
        return pa.table({
            "token": pa.array(uniq[keep], type=pa.string()),
            "n": pa.array(counts[keep], type=pa.int64()),
        })

    totals = (
        ds.map_batches(exact_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n_occurrences"))
    )
    return totals.filter(expr=f"n_occurrences >= {threshold}")


def count_tokens(ds: ray.data.Dataset, text_col: str = "text") -> int:
    """Global \\S+ token count with one vectorized aggregate."""
    def n_tok(b: pa.Table) -> pa.Table:
        n = pc.sum(pc.count_substring_regex(
            b.column(text_col), _TOKEN_RE)).as_py() or 0
        return pa.table({"n": pa.array([n], type=pa.int64())})

    part = ds.map_batches(n_tok, batch_format="pyarrow")
    return int(part.sum("n") or 0)


# --- HyperLogLog approximate distinct count --------------------------------

_HLL_P = 12                      # 2^12 registers → ~1.6% standard error
_HLL_M = 1 << _HLL_P


def _hll_registers(values: np.ndarray) -> np.ndarray:
    """Register maxima for one batch of int64 hashes — fully vectorized
    (np.maximum.at scatter)."""
    h = values.view(np.uint64) if values.dtype == np.int64 else values
    # avalanche: splitmix64 finalizer so sequential ids spread uniformly
    h = h.astype(np.uint64).copy()
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = (h << np.uint64(_HLL_P)) | np.uint64((1 << _HLL_P) - 1)
    # rank = leading zeros of the remaining 64-P bits, +1
    lz = np.zeros(len(h), dtype=np.int64)
    cur = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        cur[mask] = cur[mask] << np.uint64(shift)
    rank = np.minimum(lz + 1, 64 - _HLL_P + 1)
    regs = np.zeros(_HLL_M, dtype=np.int64)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction — deterministic, no bias-table magic."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


def approx_distinct(ds: ray.data.Dataset, col: str) -> int:
    """HLL distinct count: each batch folds its values into 2^{p} register
    maxima and ships ONE (register, rank) table (<= 4096 rows); registers
    merge by max — the shuffle is constant-size at any input scale."""
    def fold(b: pa.Table) -> pa.Table:
        column = b.column(col)
        if pa.types.is_integer(column.type):
            vals = column.to_numpy(zero_copy_only=False).astype(np.int64)
        else:  # strings/binary: vectorized FNV over length-grouped bytes
            from .dedup import _fnv1a64_many

            vals = _fnv1a64_many([
                (v if isinstance(v, bytes) else str(v).encode("utf-8"))
                for v in column.to_pylist()]).view(np.int64)
        regs = _hll_registers(vals)
        nz = np.nonzero(regs)[0]
        return pa.table({
            "reg": pa.array(nz.astype(np.int32)),
            "rank": pa.array(regs[nz]),
        })

    merged = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(Max("rank", alias_name="rank"))
    ).to_pandas()  # <= 4096 rows
    regs = np.zeros(_HLL_M, dtype=np.int64)
    regs[merged["reg"].to_numpy()] = merged["rank"].to_numpy()
    return int(round(_hll_estimate(regs)))


def grouped_approx_distinct(ds: ray.data.Dataset, group_col: str,
                            col: str) -> pa.Table:
    """Per-GROUP HLL distinct count (round 3): each batch folds each
    group's values into register maxima and ships (group, reg, rank)
    rows — ≤ groups × 4096 per batch, usually far fewer (only nonzero
    registers travel); registers merge by max in one groupby.  Returns a
    driver-side Arrow table (groups × 1 row, tiny by construction) —
    same contract as grouped_quantile_sketch."""

    def fold(b: pa.Table) -> pa.Table:
        groups = np.asarray(b.column(group_col).to_pylist(), dtype=object)
        column = b.column(col)
        if pa.types.is_integer(column.type):
            vals = column.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            from .dedup import _fnv1a64_many

            vals = _fnv1a64_many([
                (v if isinstance(v, bytes) else str(v).encode("utf-8"))
                for v in column.to_pylist()]).view(np.int64)
        out_g, out_reg, out_rank = [], [], []
        for g in np.unique(groups):
            regs = _hll_registers(vals[groups == g])
            nz = np.nonzero(regs)[0]
            out_g.extend([g] * len(nz))
            out_reg.extend(nz.astype(np.int32).tolist())
            out_rank.extend(regs[nz].tolist())
        return pa.table({
            group_col: pa.array(out_g, type=pa.string()),
            "reg": pa.array(out_reg, type=pa.int32()),
            "rank": pa.array(out_rank, type=pa.int64()),
        })

    merged = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby([group_col, "reg"])
        .aggregate(Max("rank", alias_name="rank"))
    ).to_pandas()  # ≤ groups × 4096 rows
    rows_g, rows_n = [], []
    for g, sub in merged.groupby(group_col):
        regs = np.zeros(_HLL_M, dtype=np.int64)
        regs[sub["reg"].to_numpy()] = sub["rank"].to_numpy()
        rows_g.append(g)
        rows_n.append(int(round(_hll_estimate(regs))))
    return pa.table({
        group_col: pa.array(rows_g, type=pa.string()),
        "n_distinct_approx": pa.array(rows_n, type=pa.int64()),
    })


# --- log-histogram quantile sketch -----------------------------------------

_N_BINS = 512
_LO, _HI = 1.0, 1e7  # covers doc lengths; values clamp into the edge bins
_EDGES = np.geomspace(_LO, _HI, _N_BINS + 1)


def grouped_quantile_sketch(ds: ray.data.Dataset, group_col: str,
                            value_col: str,
                            quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
                            ) -> pa.Table:
    """Approximate per-group quantiles; shuffle carries at most
    groups x n_bins (group, bin, n) rows.  Returns a driver-side Arrow
    table (groups x quantiles is tiny by construction)."""

    def fold(b: pa.Table) -> pa.Table:
        groups = np.asarray(b.column(group_col).to_pylist(), dtype=object)
        vals = b.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        bins = np.clip(np.searchsorted(_EDGES, vals, side="right") - 1,
                       0, _N_BINS - 1)
        uniq_g, g_idx = np.unique(groups, return_inverse=True)
        key = g_idx * _N_BINS + bins
        uniq_k, counts = np.unique(key, return_counts=True)
        return pa.table({
            group_col: pa.array(uniq_g[uniq_k // _N_BINS], type=pa.string()),
            "bin": pa.array((uniq_k % _N_BINS).astype(np.int32)),
            "n": pa.array(counts.astype(np.int64)),
        })

    hist = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby([group_col, "bin"])
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()  # <= groups x _N_BINS rows — safe to collect

    out_g, out_q, out_v = [], [], []
    for g, sub in hist.groupby(group_col):
        counts = np.zeros(_N_BINS, dtype=np.int64)
        counts[sub["bin"].to_numpy()] = sub["n"].to_numpy()
        cum = np.cumsum(counts)
        total = cum[-1]
        for q in quantiles:
            target = q * total
            b = int(np.searchsorted(cum, target, side="left"))
            b = min(b, _N_BINS - 1)
            # linear interpolation inside the bin
            prev = cum[b - 1] if b > 0 else 0
            frac = ((target - prev) / counts[b]) if counts[b] else 0.0
            lo, hi = _EDGES[b], _EDGES[b + 1]
            out_g.append(g)
            out_q.append(q)
            out_v.append(round(float(lo + frac * (hi - lo)), 4))
    return pa.table({
        group_col: pa.array(out_g, type=pa.string()),
        "quantile": pa.array(out_q, type=pa.float64()),
        "estimate": pa.array(out_v, type=pa.float64()),
    })


# --- X9: count-min sketch ------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 8192
_CMS_SALTS = [b"cms0:", b"cms1:", b"cms2:", b"cms3:"]


def _cms_cells(tokens: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) column indices for each token, via the repo's stable
    vectorized FNV-1a with a per-row salt.  NEVER Python hash(): its seed
    differs between driver and workers (round-3 decontaminate lesson)."""
    from .dedup import _fnv1a64_many

    enc = [t.encode("utf-8") for t in tokens]
    return np.stack([
        (_fnv1a64_many([_CMS_SALTS[r] + e for e in enc])
         % np.uint64(width)).astype(np.int64)
        for r in range(depth)])


def count_min_table(ds: ray.data.Dataset, text_col: str = "text",
                    depth: int = _CMS_DEPTH, width: int = _CMS_WIDTH
                    ) -> np.ndarray:
    """Build a (depth, width) count-min sketch of \\S+ token counts.
    Each batch folds its token counts into sparse (cell, val) partials —
    at most depth × unique-tokens rows — which one tiny groupby merges
    (CMS is a linear sketch: sum of sketches == sketch of union).  The
    dense matrix (depth × width × 8 B = 256 KiB) materializes only at
    the driver; the text never shuffles."""
    def fold(b: pa.Table) -> pa.Table:
        uniq, counts = _batch_token_counts(b.column(text_col).to_pylist())
        if not len(uniq):
            return pa.table({"cell": pa.array([], type=pa.int64()),
                             "val": pa.array([], type=pa.int64())})
        cols = _cms_cells(uniq, depth, width)
        cells = (np.arange(depth)[:, None] * width + cols).ravel()
        vals = np.broadcast_to(counts, (depth, len(counts))).ravel()
        uc, inv = np.unique(cells, return_inverse=True)
        return pa.table({
            "cell": pa.array(uc, type=pa.int64()),
            "val": pa.array(np.bincount(inv, weights=vals).astype(
                np.int64)),
        })

    merged = (ds.map_batches(fold, batch_format="pyarrow")
              .groupby("cell")
              .aggregate(Sum("val", alias_name="v"))
              .take_all())  # bounded: ≤ depth × width rows
    M = np.zeros(depth * width, dtype=np.int64)
    for r in merged:
        M[r["cell"]] = r["v"]
    return M.reshape(depth, width)


def cms_estimate(M: np.ndarray, tokens: list[str]) -> np.ndarray:
    """Point queries: min over rows — never underestimates."""
    depth, width = M.shape
    cols = _cms_cells(np.asarray(tokens, dtype=object), depth, width)
    return M[np.arange(depth)[:, None], cols].min(axis=0)
