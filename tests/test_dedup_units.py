"""Statistical/unit guarantees for the sketch-based dedup operators
(rows-only in the driver check, so their accuracy is pinned here)."""

from __future__ import annotations

import numpy as np

from text_extraction_ray.functions.dedup import (
    SHINGLE,
    minhash_signature,
    simhash64,
)


def _exact_jaccard(a: str, b: str) -> float:
    def sh(t):
        w = t.lower().split()
        return set(" ".join(w[i:i + SHINGLE])
                   for i in range(max(len(w) - SHINGLE + 1, 1)))
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / max(len(sa | sb), 1)


def _est(a: str, b: str) -> float:
    return float((minhash_signature(a) == minhash_signature(b)).mean())


BASE = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest before the night falls down")


def test_minhash_identical_and_disjoint():
    assert _est(BASE, BASE) == 1.0
    other = "completely different words appear here nothing shared at all"
    assert _est(BASE, other) == 0.0


def test_minhash_tracks_exact_jaccard():
    rng = np.random.RandomState(7)
    words = BASE.split()
    for _ in range(8):
        mutated = [w if rng.rand() > 0.2 else "tok%d" % rng.randint(1000)
                   for w in words]
        b = " ".join(mutated)
        exact, est = _exact_jaccard(BASE, b), _est(BASE, b)
        # 64 permutations -> s.e. ~ sqrt(j(1-j)/64) <= 0.0625; allow 4 s.e.
        assert abs(exact - est) <= 0.25, (exact, est)


def test_simhash_hamming_small_for_near_dup():
    a = simhash64(BASE)
    near = BASE.replace("fox", "cat")
    far = "totally unrelated content about databases and airplanes"
    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert ham(a, simhash64(near)) <= 12
    assert ham(a, simhash64(far)) >= 20
    assert simhash64("") == 0
    assert simhash64(BASE) == a  # deterministic


def test_minhash_lean_identical(ray_session):
    """The lean (ids-only shuffle + candidate re-sign) variant produces
    EXACTLY the sig-carrying variant's pair set and estimates."""
    import ray.data

    from text_extraction_ray.functions.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_lean,
    )

    ds = ray.data.read_parquet("/root/testdata/sf0.01/documents.parquet",
                               columns=["doc_id", "text"])
    old = minhash_lsh_pairs(ds).to_pandas()
    ds2 = ray.data.read_parquet("/root/testdata/sf0.01/documents.parquet",
                                columns=["doc_id", "text"])
    new = minhash_lsh_pairs_lean(ds2).to_pandas()
    o = set(zip(old["doc_a"], old["doc_b"], old["est_jaccard"]))
    n = set(zip(new["doc_a"], new["doc_b"], new["est_jaccard"]))
    assert o == n and len(n) > 0


def test_minhash_joined_variant_identical(ray_session):
    """The fully-distributed (hash-join) lean variant equals the
    driver-budget lean variant — the documented at-scale fallback is real
    code, not a comment."""
    import ray.data

    from text_extraction_ray.functions.dedup import (
        minhash_lsh_pairs_joined,
        minhash_lsh_pairs_lean,
    )

    ds1 = ray.data.read_parquet("/root/testdata/sf0.01/documents.parquet",
                                columns=["doc_id", "text"])
    lean = minhash_lsh_pairs_lean(ds1).to_pandas()
    ds2 = ray.data.read_parquet("/root/testdata/sf0.01/documents.parquet",
                                columns=["doc_id", "text"])
    joined = minhash_lsh_pairs_joined(ds2).to_pandas()
    a = set(zip(lean["doc_a"], lean["doc_b"], lean["est_jaccard"]))
    b = set(zip(joined["doc_a"], joined["doc_b"], joined["est_jaccard"]))
    assert a == b and len(a) > 0
