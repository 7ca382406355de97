"""Property tests for the image-table geometry kernels: ruling-run
centers, uniform-grid healing, and exact shear inversion."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.functions.table_image import (MAX_SHEAR,
                                                       _regular_grid,
                                                       _ruling_lines,
                                                       _unshear)


@given(st.lists(st.floats(min_value=0.0, max_value=1.0),
                min_size=1, max_size=80))
@settings(max_examples=200, deadline=None)
def test_ruling_lines_are_run_centers(frac):
    frac = np.array(frac)
    lines = _ruling_lines(frac, 0.5)
    # every line sits inside a >0.5 run, lines strictly increase
    assert lines == sorted(set(lines))
    for p in lines:
        assert frac[p] > 0.5
    # count equals the number of maximal >0.5 runs
    on = frac > 0.5
    n_runs = int(np.sum(on[1:] & ~on[:-1]) + (1 if on[0] else 0))
    assert len(lines) == n_runs


@given(st.integers(min_value=2, max_value=6),
       st.integers(min_value=9, max_value=30),
       st.integers(min_value=0, max_value=40),
       st.data())
@settings(max_examples=200, deadline=None)
def test_regular_grid_heals_one_dropped_interior_line(k, pitch, first,
                                                      data):
    full = [first + j * pitch for j in range(k + 1)]
    if k >= 3:
        # Healing is only well-posed when a true-pitch gap survives the
        # drop: with k == 2 the lone interior line's loss leaves a single
        # 2*pitch gap, indistinguishable from a legitimate 2-line grid.
        drop = data.draw(st.integers(min_value=1, max_value=k - 1))
        seen = [p for j, p in enumerate(full) if j != drop]
    else:
        seen = full
    assert _regular_grid(seen) == full


@given(st.integers(min_value=5, max_value=60),
       st.integers(min_value=10, max_value=80),
       st.integers(min_value=-MAX_SHEAR, max_value=MAX_SHEAR),
       st.integers(min_value=0, max_value=2 ** 31))
@settings(max_examples=200, deadline=None)
def test_unshear_inverts_the_render_shear(h, w, s, seed):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w)) < 0.3
    # replicate render_table_image_skewed's forward shear on a bool grid
    sk = np.zeros((h, w + abs(s)), dtype=bool)
    base = abs(s) if s < 0 else 0
    for y in range(h):
        off = base + round(s * y / (h - 1)) if h > 1 else 0
        sk[y, off:off + w] = img[y]
    un = _unshear(sk, s)
    assert (un[:, :w] == img).all()
    assert not un[:, w:].any()          # vacated margin stays light
