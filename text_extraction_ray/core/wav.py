"""From-scratch WAV (RIFF PCM) codec — the audio leg of the multimodal
column story (SURVEY §2.0 M21, round 3).

Like core/raster.py for BMP/PNG, this parses the container against the
public spec with stdlib struct + numpy only: RIFF/WAVE framing, fmt chunk
(PCM format 1, 8/16-bit, mono or stereo), data chunk, unknown chunks
skipped by their declared size.  Compressed formats (IEEE float, ADPCM,
MP3-in-RIFF) are recognized and rejected with precise reasons so the
decode stage stays total and the error column is informative.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_TAGS = {0x0003: "ieee-float", 0x0006: "a-law", 0x0007: "mu-law",
             0x0011: "adpcm", 0x0055: "mp3"}


def encode_wav(samples: np.ndarray, sample_rate: int,
               n_channels: int = 1) -> bytes:
    """PCM16 RIFF/WAVE bytes from an int16 array (frames × channels
    interleaved when stereo)."""
    if samples.dtype != np.int16:
        raise ValueError("wav: samples must be int16")
    data = samples.tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, int16 samples) from PCM 8/16-bit WAV.
    8-bit unsigned PCM is widened to int16 (offset-binary → signed)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF/WAVE signature")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size and cid != b"data":
            raise ValueError(f"wav: truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("wav: fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("wav: missing fmt chunk")
    if pcm is None:
        raise ValueError("wav: missing data chunk")
    tag, n_channels, sample_rate, _br, _ba, bits = fmt
    if tag != 1:
        kind = _FMT_TAGS.get(tag, f"tag 0x{tag:04x}")
        raise ValueError(
            f"wav: {kind} encoding recognized but only PCM is supported")
    if n_channels not in (1, 2):
        raise ValueError(f"wav: {n_channels} channels unsupported")
    if bits == 16:
        n = len(pcm) // 2
        samples = np.frombuffer(pcm, dtype="<i2", count=n)
    elif bits == 8:
        u = np.frombuffer(pcm, dtype=np.uint8)
        samples = ((u.astype(np.int16) - 128) << 8)
    else:
        raise ValueError(f"wav: {bits}-bit PCM unsupported")
    frames = len(samples) // n_channels
    return sample_rate, n_channels, samples[: frames * n_channels]


def sniff_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def audio_features(sample_rate: int, n_channels: int,
                   samples: np.ndarray) -> dict:
    """Vectorized per-clip features: duration, RMS, peak, zero-crossing
    rate — the decode→featurize step a training-data audio pipeline runs
    per clip (all numpy; rounding fixed for reproducibility)."""
    frames = len(samples) // max(n_channels, 1)
    mono = (samples.reshape(-1, n_channels).mean(axis=1)
            if n_channels > 1 else samples.astype(np.float64))
    x = mono.astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    peak = float(np.max(np.abs(x))) if len(x) else 0.0
    zc = (float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
          if len(x) > 1 else 0.0)
    return {
        "duration_s": round(frames / max(sample_rate, 1), 6),
        "rms": round(rms, 6),
        "peak": round(peak, 6),
        "zcr": round(zc, 6),
    }
