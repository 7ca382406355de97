"""Property tests for round-3-continuation numeric kernels: closed-form
NTILE, weighted interpolated quantiles, block-mean resize, and the
distributed-prefix-scan lateness flags — each against a naive
recomputation on random inputs (no Ray needed)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(0, 200), st.integers(1, 12))
@settings(max_examples=200, deadline=None)
def test_ntile_closed_form_matches_naive(n, k):
    from text_extraction_ray.pipelines.queries_r3f import _ntile

    if n == 0:
        return
    base, rem = divmod(n, k)
    naive = []
    for t in range(1, k + 1):
        size = base + 1 if t <= rem else base
        naive.extend([t] * size)
    naive = np.array(naive[:n])
    got = _ntile(np.arange(n), n, k)
    assert (got == naive).all()


@given(st.lists(st.tuples(st.integers(-10_000, 10_000),
                          st.integers(1, 20)),
                min_size=1, max_size=60),
       st.floats(0.0, 1.0))
@settings(max_examples=200, deadline=None)
def test_interp_quantile_matches_numpy_linear(pairs, q):
    from text_extraction_ray.pipelines.queries_r3g import _interp_quantile

    vals = np.array(sorted({v for v, _ in pairs}), dtype=np.float64)
    by = dict.fromkeys(vals.tolist(), 0)
    for v, c in pairs:
        by[float(v)] += c
    cnts = np.array([by[float(v)] for v in vals], dtype=np.int64)
    got = _interp_quantile(vals, cnts, q)
    expanded = np.repeat(vals, cnts)
    want = float(np.quantile(expanded, q, method="linear"))
    assert abs(got - want) < 1e-9 * max(1.0, abs(want))


@given(st.integers(1, 40), st.integers(1, 40),
       st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**31))
@settings(max_examples=100, deadline=None)
def test_block_mean_resize_matches_naive(w, h, ow, oh, seed):
    from text_extraction_ray.functions.multimodal import \
        _block_mean_resize

    ow, oh = min(ow, w), min(oh, h)
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, h * w, dtype=np.int64).astype(np.uint8)
    got = _block_mean_resize(img, w, h, ow, oh)
    grid = img.reshape(h, w).astype(np.float64)
    ys = (np.arange(oh + 1) * h) // oh
    xs = (np.arange(ow + 1) * w) // ow
    ys[-1], xs[-1] = h, w
    want = np.empty((oh, ow))
    for i in range(oh):
        for j in range(ow):
            want[i, j] = grid[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    assert np.allclose(got, want)


@given(st.lists(st.tuples(st.integers(0, 10_000),
                          st.integers(0, 10_000)),
                min_size=1, max_size=300),
       st.integers(1, 64), st.integers(0, 500))
@settings(max_examples=100, deadline=None)
def test_bucketed_prefix_scan_lateness_matches_serial(rows, nb, late):
    """The late-windows carry-in construction: bucket by arrival range,
    exclusive per-bucket prefix max + driver carry ≡ one serial scan in
    (arr, idx) order."""
    arr = np.array([a for a, _ in rows], dtype=np.int64)
    ts = np.array([t for _, t in rows], dtype=np.int64)
    idx = np.arange(len(rows), dtype=np.int64)
    # serial truth
    order = np.lexsort((idx, arr))
    hwm_true = np.full(len(rows), np.iinfo(np.int64).min, dtype=np.int64)
    run = np.iinfo(np.int64).min
    for pos in order:
        hwm_true[pos] = run
        run = max(run, ts[pos])
    late_true = hwm_true > ts + late

    # bucketed reconstruction (mirrors q_events_late_windows)
    lo, hi = int(arr.min()), int(arr.max())
    span = max(hi - lo + 1, 1)
    bk = (arr - lo) * nb // span
    carry = np.full(nb, np.iinfo(np.int64).min, dtype=np.int64)
    running = np.iinfo(np.int64).min
    for b in range(nb):
        carry[b] = running
        m = bk == b
        if m.any():
            running = max(running, int(ts[m].max()))
    late_got = np.zeros(len(rows), dtype=bool)
    for b in range(nb):
        m = np.flatnonzero(bk == b)
        if not len(m):
            continue
        o = m[np.lexsort((idx[m], arr[m]))]
        t_o = ts[o]
        hwm = np.empty(len(o), dtype=np.int64)
        hwm[0] = carry[b]
        r = np.maximum.accumulate(t_o)
        if len(o) > 1:
            hwm[1:] = np.maximum(r[:-1], carry[b])
        late_got[o] = hwm > t_o + late
    assert (late_got == late_true).all()
