"""From-scratch JPEG codec (core/jpeg.py, VERDICT r3 Next #3; SOF2
progressive added in round 4): near-lossless roundtrip across
subsamplings / restart intervals / edge dimensions, lossy-path sanity,
spec-detail units (zigzag, DCT basis, magnitude coding), progressive
scan-script decode parity with the sequential path plus truncation
salvage, precise refusal of unsupported coding processes, and decoder
totality on corrupt/fuzzed bytes."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.jpeg import (
    ZIGZAG,
    _C,
    _extend,
    _magnitude,
    decode_jpeg,
    encode_jpeg,
)


def _maxerr(w, h, img, data):
    dw, dh, gray = decode_jpeg(data)
    assert (dw, dh) == (w, h)
    got = np.frombuffer(gray, dtype=np.uint8).reshape(h, w)
    return int(np.abs(got.astype(int) - img.astype(int)).max())


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**31),
       st.sampled_from(["gray", "444", "420"]))
@settings(max_examples=60, deadline=None)
def test_roundtrip_random_near_lossless(w, h, seed, sub):
    """Flat quant tables: the only loss is FDCT/IDCT float rounding,
    bounded at ±2 per pixel for ANY 8-bit raster."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.int64).astype(np.uint8)
    data = encode_jpeg(w, h, img.tobytes(), subsampling=sub)
    assert _maxerr(w, h, img, data) <= 2


def test_restart_markers_roundtrip():
    """DRI/RSTn: byte-aligned restarts with DC-predictor resets decode
    identically to the unrestarted stream."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 41), dtype=np.int64).astype(np.uint8)
    for sub in ("gray", "444", "420"):
        plain = decode_jpeg(encode_jpeg(41, 33, img.tobytes(),
                                        subsampling=sub))
        for rst in (1, 2, 5):
            withr = decode_jpeg(encode_jpeg(41, 33, img.tobytes(),
                                            subsampling=sub,
                                            restart=rst))
            assert withr == plain, (sub, rst)


def test_lossy_quality_path():
    """Integer quality scales the ramp table: output degrades smoothly
    and stays a valid stream at every setting."""
    img = ((np.arange(48)[:, None] * 3 + np.arange(56)[None, :] * 5)
           % 256).astype(np.uint8)
    prev_size = None
    for q in (1, 4, 16):
        data = encode_jpeg(56, 48, img.tobytes(), subsampling="420",
                           quality=q)
        err = _maxerr(56, 48, img, data)
        assert err <= 16 + 8 * q          # loose but monotone-ish bound
        if prev_size is not None:
            assert len(data) <= prev_size  # coarser quant, smaller file
        prev_size = len(data)


def test_edge_dimensions_pad_and_crop():
    """Non-multiple-of-MCU dims (incl. 1x1) pad with edge replication
    at encode and crop at decode — exact dims back, bounded error."""
    rng = np.random.default_rng(3)
    for (w, h) in [(1, 1), (8, 8), (9, 9), (15, 17), (16, 16), (7, 31)]:
        img = rng.integers(0, 256, (h, w), dtype=np.int64).astype(np.uint8)
        for sub in ("gray", "420"):
            data = encode_jpeg(w, h, img.tobytes(), subsampling=sub)
            assert _maxerr(w, h, img, data) <= 2, (w, h, sub)


def test_zigzag_and_dct_basis():
    """Spec invariants: zigzag is a permutation starting 0,1,8,16,9,2;
    the DCT basis is orthonormal (C @ C.T == I), so FDCT∘IDCT == id."""
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(0)
    b = rng.standard_normal((8, 8))
    assert np.allclose(_C.T @ (_C @ b @ _C.T) @ _C, b, atol=1e-9)


def test_magnitude_coding_roundtrips():
    for v in list(range(-300, 301)) + [-2047, 2047]:
        s, bits = _magnitude(v)
        assert _extend(bits, s) == v


def test_arithmetic_and_hierarchical_refused_precisely():
    base = encode_jpeg(8, 8, bytes(64))
    sof0 = base.find(b"\xff\xc0")
    assert sof0 > 0
    for marker in (0xC9, 0xCA, 0xC3):
        mutated = bytearray(base)
        mutated[sof0 + 1] = marker
        with pytest.raises(NotImplementedError) as ei:
            decode_jpeg(bytes(mutated))
        assert str(ei.value).startswith("jpeg:")
        assert "SOF" in str(ei.value)


def test_sof2_mutated_baseline_is_a_precise_error():
    """A baseline stream whose SOF marker is flipped to SOF2 carries a
    sequential SOS (Ss=0, Se=63) — invalid as a progressive DC scan;
    the decoder must say so, not crash (round 3 refused ALL SOF2)."""
    base = encode_jpeg(8, 8, bytes(64))
    sof0 = base.find(b"\xff\xc0")
    mutated = bytearray(base)
    mutated[sof0 + 1] = 0xC2
    with pytest.raises(ValueError) as ei:
        decode_jpeg(bytes(mutated))
    assert str(ei.value).startswith("jpeg:")


# --- progressive (SOF2, round 4) ---------------------------------------------

@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**31),
       st.sampled_from(["gray", "444", "420"]))
@settings(max_examples=40, deadline=None)
def test_progressive_roundtrip_near_lossless(w, h, seed, sub):
    """The progressive scan script (spectral selection + successive
    approximation) reconstructs the same coefficients as sequential
    coding: flat-quant roundtrip stays within DCT rounding."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.int64).astype(np.uint8)
    data = encode_jpeg(w, h, img.tobytes(), subsampling=sub,
                       progressive=True)
    assert _maxerr(w, h, img, data) <= 2


def test_progressive_decodes_identically_to_baseline():
    """Same raster, same quant table → the progressive and sequential
    files must decode to the SAME pixels (coefficient stores converge),
    across structure that exercises EOB runs, ZRL, and corrections."""
    rng = np.random.default_rng(5)
    gy, gx = np.mgrid[0:40, 0:56]
    cases = [
        ("flat", np.full((32, 48), 77, np.uint8), "420", None),
        ("impulses", np.where((gy % 13 == 0) & (gx % 11 == 0), 255, 0)
         .astype(np.uint8), "444", None),
        ("gradient", ((gy * 2 + gx * 3) % 256).astype(np.uint8),
         "420", None),
        ("noise-q3", rng.integers(0, 256, (40, 56), dtype=np.int64)
         .astype(np.uint8), "gray", 3),
        ("noise-q7", rng.integers(0, 256, (40, 56), dtype=np.int64)
         .astype(np.uint8), "420", 7),
    ]
    for label, img, sub, q in cases:
        h, w = img.shape
        prog = decode_jpeg(encode_jpeg(w, h, img.tobytes(),
                                       subsampling=sub, quality=q,
                                       progressive=True))
        base = decode_jpeg(encode_jpeg(w, h, img.tobytes(),
                                       subsampling=sub, quality=q))
        assert prog == base, label


def test_progressive_truncation_salvages_coarse_image():
    """Cutting a progressive file mid-scan still yields the frame-sized
    raster its delivered scans describe, and fidelity improves
    monotonically with the delivered fraction — the format's own
    salvage property (a truncated BASELINE file loses the tail rows;
    a truncated progressive file loses only refinement)."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (48, 64), dtype=np.int64).astype(np.uint8)
    full = encode_jpeg(64, 48, img.tobytes(), subsampling="420",
                       progressive=True)
    prev = None
    for frac in (0.3, 0.5, 0.7, 0.9, 1.0):
        w, h, gray = decode_jpeg(full[: int(len(full) * frac)])
        assert (w, h) == (64, 48)
        err = float(np.abs(np.frombuffer(gray, np.uint8).astype(int)
                           - img.ravel().astype(int)).mean())
        if prev is not None:
            assert err <= prev + 1e-9, (frac, err, prev)
        prev = err
    assert prev <= 2.0                      # full file ~ lossless


def test_progressive_totality_on_corrupt_bytes():
    base = encode_jpeg(24, 16, bytes(range(256)) + bytes(128),
                       subsampling="444", progressive=True)
    rng = np.random.default_rng(12)
    for trial in range(150):
        data = bytearray(base)
        if trial % 2 == 0:
            data = data[: int(rng.integers(2, len(data)))]
        else:
            for _ in range(int(rng.integers(1, 6))):
                data[int(rng.integers(0, len(data)))] = int(
                    rng.integers(0, 256))
        try:
            w, h, gray = decode_jpeg(bytes(data))
            assert len(gray) == w * h
        except (ValueError, NotImplementedError) as exc:
            assert str(exc).startswith("jpeg:"), str(exc)
        except (IndexError, struct.error):
            pytest.fail("non-jpeg exception escaped the decoder")


def test_decoder_totality_on_corrupt_bytes():
    """Any mutation/truncation raises a precise jpeg:-prefixed error or
    decodes to SOME raster — never hangs, never non-jpeg exceptions."""
    base = encode_jpeg(24, 16, bytes(range(256)) + bytes(128),
                       subsampling="444", restart=2)
    rng = np.random.default_rng(11)
    for trial in range(200):
        data = bytearray(base)
        mode = trial % 3
        if mode == 0:
            data = data[: int(rng.integers(0, len(data)))]
        elif mode == 1:
            for _ in range(int(rng.integers(1, 6))):
                data[int(rng.integers(0, len(data)))] = int(
                    rng.integers(0, 256))
        else:
            pos = int(rng.integers(0, len(data)))
            data = data[:pos] + bytes(rng.integers(
                0, 256, int(rng.integers(1, 32)), dtype=np.int64)
                .astype(np.uint8)) + data[pos:]
        try:
            w, h, gray = decode_jpeg(bytes(data))
            assert len(gray) == w * h
        except (ValueError, NotImplementedError) as exc:
            assert str(exc).startswith("jpeg:"), str(exc)
        except (IndexError, struct.error):
            pytest.fail("non-jpeg exception escaped the decoder")


def test_decode_rejects_non_jpeg():
    for junk in (b"", b"BMnotjpeg", b"\xff\xd8", b"\xff\xd8\x00"):
        with pytest.raises(ValueError):
            decode_jpeg(junk)
