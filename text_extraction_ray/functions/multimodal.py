"""Multimodal column plumbing: opaque binary media + typed metadata.

The DECODE step is REAL for BMP, PNG (round 2, ``core.raster``), GIF
(round 3, ``core.gif`` LZW) and JPEG (round 4, ``core.jpeg`` baseline
Huffman+IDCT) — all implemented from scratch against the public specs
(no image library exists in this sandbox, SURVEY SS0.3), so
``MediaDecoder`` actually parses containers, CRC-checks chunks,
inflates, unfilters, and entropy-decodes.  The deterministic
``application/x-fake-image`` header format remains (and is the video
frame payload); genuinely unsupported payloads still raise
``NotImplementedError``/``ValueError`` and route to the error column.

Everything Ray-side is unchanged: the schema (binary column + metadata),
the actor-pool stage shape (decoder state built once per actor in
``__init__``), the small batch size appropriate for large binary
payloads, and the feature-table output layout.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..core.raster import (
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
    resize_gray,
    sniff_raster,
)

FAKE_MEDIA_TYPE = "application/x-fake-image"
BMP_MEDIA_TYPE = "image/bmp"
PNG_MEDIA_TYPE = "image/png"
GIF_MEDIA_TYPE = "image/gif"
JPEG_MEDIA_TYPE = "image/jpeg"
_HEADER = struct.Struct("<HH")  # width, height


def _synth_raster(i: int, w: int, h: int, cap: int | None = None) -> bytes:
    """Deterministic pixel function of (row id, pixel index) — vectorized."""
    n = w * h if cap is None else min(w * h, cap)
    k = np.arange(n, dtype=np.uint64)
    return (((np.uint64(i % (1 << 32)) * np.uint64(2654435761)
              + k * np.uint64(40503)) >> np.uint64(7))
            & np.uint64(0xFF)).astype(np.uint8).tobytes()


def synth_media_batch(batch: pa.Table, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    """Derive a deterministic 'image' per row, cycling through the FIVE
    container formats by id: fake-header, real BMP, real PNG, real GIF,
    real JPEG — the same pixel function either way, so the decode stage
    is tested end-to-end against real containers (GIF joined in round 3
    via the from-scratch LZW codec in core/gif.py; JPEG in round 4 via
    the from-scratch codec in core/jpeg.py, cycling gray / 4:4:4 /
    4:2:0 subsampling AND baseline-sequential / progressive (SOF2)
    coding).  JPEG is DCT-lossy: its pixels round-trip within ±2 of
    the raster function, never exactly."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    media, mtype, width, height = [], [], [], []
    for i, t in zip(ids, texts):
        w = 16 + (i * 7) % 48
        h = 16 + (i * 13) % 32
        variant = i % 5
        if variant == 0:
            media.append(_HEADER.pack(w, h) + _synth_raster(i, w, h, 4096))
            mtype.append(FAKE_MEDIA_TYPE)
        elif variant == 1:
            media.append(encode_bmp(w, h, _synth_raster(i, w, h)))
            mtype.append(BMP_MEDIA_TYPE)
        elif variant == 2:
            # round 5: cycle the decoder's container variants too —
            # Adam7 interlace, 16-bit depth, palettized (all exact
            # roundtrips for the grey rasters this module writes)
            media.append(encode_png(w, h, _synth_raster(i, w, h),
                                    filter_type=i % 5,
                                    interlace=(i // 5) % 2 == 1,
                                    depth=16 if (i // 10) % 3 == 1 else 8,
                                    palettized=(i // 10) % 3 == 2))
            mtype.append(PNG_MEDIA_TYPE)
        elif variant == 3:
            from ..core.gif import encode_gif

            media.append(encode_gif(w, h, _synth_raster(i, w, h)))
            mtype.append(GIF_MEDIA_TYPE)
        else:
            from ..core.jpeg import encode_jpeg

            sub = ("gray", "444", "420")[(i // 5) % 3]
            media.append(encode_jpeg(w, h, _synth_raster(i, w, h),
                                     subsampling=sub,
                                     progressive=(i // 15) % 2 == 1))
            mtype.append(JPEG_MEDIA_TYPE)
        width.append(w)
        height.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "media": pa.array(media, type=pa.binary()),
            "media_type": pa.array(mtype, type=pa.string()),
            "width": pa.array(width, type=pa.int32()),
            "height": pa.array(height, type=pa.int32()),
            "caption": pa.array([(t or "")[:64] for t in texts],
                                type=pa.string()),
        }
    )


FAKE_VIDEO_TYPE = "video/x-fake"
_VHEADER = struct.Struct("<HHH")  # n_frames, width, height


def synth_video_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Derive a deterministic fake 'video' per row: an (n_frames, w, h)
    header plus n_frames concatenated w*h rasters (bytes are a pure
    function of (row id, frame, pixel))."""
    ids = batch.column(id_col).to_pylist()
    media, mtype, nf_col = [], [], []
    for i in ids:
        w = 8 + (i * 5) % 16
        h = 8 + (i * 3) % 8
        nf = 4 + i % 9
        f = np.repeat(np.arange(nf, dtype=np.uint64), w * h)
        k = np.tile(np.arange(w * h, dtype=np.uint64), nf)
        frames = (((np.uint64(i % (1 << 32)) * np.uint64(2654435761)
                    + f * np.uint64(97) + k * np.uint64(40503))
                   >> np.uint64(7)) & np.uint64(0xFF)).astype(np.uint8)
        media.append(_VHEADER.pack(nf, w, h) + frames.tobytes())
        mtype.append(FAKE_VIDEO_TYPE)
        nf_col.append(nf)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "media": pa.array(media, type=pa.binary()),
            "media_type": pa.array(mtype, type=pa.string()),
            "n_frames": pa.array(nf_col, type=pa.int32()),
        }
    )


def _decode_any(media_type: str, payload: bytes) -> tuple[int, int, bytes]:
    """(w, h, greyscale raster) for every supported container.  The fake
    header format may carry a TRUNCATED raster (capped payload) — callers
    that need the full w*h raster must pad."""
    if media_type == FAKE_MEDIA_TYPE:
        if len(payload) < _HEADER.size:
            raise ValueError("fake-image: truncated header")
        w, h = _HEADER.unpack_from(payload, 0)
        return w, h, payload[_HEADER.size:]
    if media_type == BMP_MEDIA_TYPE:
        return decode_bmp(payload)
    if media_type == PNG_MEDIA_TYPE:
        return decode_png(payload)
    if media_type == GIF_MEDIA_TYPE:
        from ..core.gif import decode_gif

        return decode_gif(payload)
    if media_type == JPEG_MEDIA_TYPE:
        from ..core.jpeg import decode_jpeg

        return decode_jpeg(payload)
    # Unknown/missing declared type: sniff the payload and route to the
    # real codec — a mislabelled crawl JPEG/GIF decodes (round-4: from-
    # scratch baseline JPEG decoder in core/jpeg.py replaced the
    # sniff-and-refuse route of round 3).
    sniffed = sniff_raster(payload)
    if sniffed == "image/jpeg":
        from ..core.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if sniffed == "image/gif":
        # mislabelled but decodable since round 3's from-scratch codec
        from ..core.gif import decode_gif

        return decode_gif(payload)
    if sniffed is not None and sniffed != media_type:
        raise NotImplementedError(
            f"payload sniffs as {sniffed!r} but is declared "
            f"{media_type!r} — no codec route")
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment — "
        "plug a real decoder here (PIL/ffmpeg)")


def _encode_any(media_type: str, w: int, h: int, gray: bytes) -> bytes:
    if media_type == FAKE_MEDIA_TYPE:
        return _HEADER.pack(w, h) + gray
    if media_type == BMP_MEDIA_TYPE:
        return encode_bmp(w, h, gray)
    if media_type == PNG_MEDIA_TYPE:
        return encode_png(w, h, gray)
    if media_type == GIF_MEDIA_TYPE:
        from ..core.gif import encode_gif

        return encode_gif(w, h, gray)
    if media_type == JPEG_MEDIA_TYPE:
        from ..core.jpeg import encode_jpeg

        return encode_jpeg(w, h, gray)   # grayscale, near-lossless
    raise NotImplementedError(f"no encoder for {media_type!r}")


class FakeImageResizer:
    """Actor-pool RESIZE stage: nearest-neighbor downsample to fit
    ``max_dim`` preserving aspect ratio — REAL decode→resample→re-encode
    for BMP/PNG (same container out as in), header rewrite for the fake
    format.  Output rows keep the media schema, so the stage composes with
    ``MediaDecoder`` downstream — the thumbnailing pipeline shape."""

    def __init__(self, max_dim: int = 16) -> None:
        self.max_dim = max_dim

    def _resize(self, media_type: str, payload: bytes) -> tuple[int, int, bytes]:
        w, h, body = _decode_any(media_type, payload)
        if len(body) < w * h:  # capped fake raster: pad to full size
            body = body + bytes(w * h - len(body))
        scale = max(w, h, 1) / self.max_dim
        tw = max(int(w / scale), 1) if scale > 1 else w
        th = max(int(h / scale), 1) if scale > 1 else h
        return tw, th, _encode_any(
            media_type, tw, th, resize_gray(w, h, body, tw, th))

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = batch.column("media").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        ids = batch.column("media_id").to_pylist()
        out_media, out_w, out_h = [], [], []
        for payload, mt in zip(media, mtypes):
            w, h, resized = self._resize(mt, payload or b"")
            out_media.append(resized)
            out_w.append(w)
            out_h.append(h)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "media": pa.array(out_media, type=pa.binary()),
                "media_type": pa.array(mtypes, type=pa.string()),
                "width": pa.array(out_w, type=pa.int32()),
                "height": pa.array(out_h, type=pa.int32()),
            }
        )


class FrameSampler:
    """Actor-pool FRAME-SAMPLE stage: one output row per kept frame
    (every ``stride``-th), each emitted as a standalone fake-image payload
    so sampled frames feed the same decode/resize stages as images.
    A one→many map_batches — batch_size must stay small because output
    bytes are ~n_frames/stride × the input row."""

    def __init__(self, stride: int = 4) -> None:
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = batch.column("media").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        ids = batch.column("media_id").to_pylist()
        out_id, out_frame, out_media, out_type = [], [], [], []
        for i, payload, mt in zip(ids, media, mtypes):
            if mt != FAKE_VIDEO_TYPE:
                raise NotImplementedError(
                    f"no demuxer for {mt!r} — plug ffmpeg here")
            nf, w, h = _VHEADER.unpack_from(payload, 0)
            body = payload[_VHEADER.size:]
            fsize = w * h
            for f in range(0, nf, self.stride):
                frame = body[f * fsize : (f + 1) * fsize]
                out_id.append(i)
                out_frame.append(f)
                out_media.append(_HEADER.pack(w, h) + frame)
                out_type.append(FAKE_MEDIA_TYPE)
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_frame, type=pa.int32()),
                "media": pa.array(out_media, type=pa.binary()),
                "media_type": pa.array(out_type, type=pa.string()),
            }
        )


class FakeMediaDecoder:
    """Actor-pool decode/feature stage for binary media columns — REAL
    BMP/PNG parsing via ``core.raster`` (name kept from round 1 for API
    stability; ``MediaDecoder`` is the preferred alias).

    TOTAL per row: corrupt containers and unsupported types land in the
    error column (decode_ok=False), never crash the batch.  Use with small
    batches — binary payloads dominate batch memory::

        ds.map_batches(MediaDecoder, concurrency=(1, N), batch_size=16,
                       batch_format="pyarrow", zero_copy_batch=True)
    """

    def __init__(self) -> None:
        # real decoder state, once per actor: force-load the codec module
        # (and its numpy kernels) so a broken env fails at actor start
        from ..core import raster as _raster

        self._raster = _raster

    def _decode(self, media_type: str, payload: bytes) -> tuple[int, int, bytes]:
        return _decode_any(media_type, payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = batch.column("media").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        ids = batch.column("media_id").to_pylist()
        ok, err, mean_px, n_px, thumb = [], [], [], [], []
        for payload, mt in zip(media, mtypes):
            try:
                w, h, body = self._decode(mt, payload or b"")
                ok.append(True)
                err.append("")
                n_px.append(w * h)
                arr = np.frombuffer(body, dtype=np.uint8)
                mean_px.append(
                    round(int(arr.sum()) / max(len(body), 1), 4))
                thumb.append(body[:16])
            except (NotImplementedError, ValueError) as exc:
                ok.append(False)
                err.append(str(exc))
                n_px.append(0)
                mean_px.append(0.0)
                thumb.append(b"")
        out = pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "decode_ok": pa.array(ok, type=pa.bool_()),
                "error": pa.array(err, type=pa.string()),
                "n_pixels": pa.array(n_px, type=pa.int64()),
                "mean_pixel": pa.array(mean_px, type=pa.float64()),
                "thumb16": pa.array(thumb, type=pa.binary()),
            }
        )
        # pass through annotation columns (frame_idx, captions, ...) so the
        # decode stage composes after samplers/resizers without re-joining
        for name in batch.schema.names:
            if name not in ("media_id", "media", "media_type",
                            "width", "height") and name not in out.schema.names:
                out = out.append_column(name, batch.column(name))
        return out

# Preferred round-2 names: the decode/resize stages are no longer fakes —
# they parse real BMP/PNG containers (core/raster.py).
MediaDecoder = FakeMediaDecoder
ImageResizer = FakeImageResizer


# --- audio (round 3): real WAV codec + actor-pool featurize ------------------

WAV_MEDIA_TYPE = "audio/wav"


def synth_audio_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic PCM16 clip per row: a sine whose frequency/length are
    pure functions of the id, plus id-seeded integer dither — real RIFF
    containers, so AudioFeaturizer exercises the actual codec.  Every 7th
    row is stereo (the 8-bit widen path is unit-tested with hand-built
    containers in test_queries_r3)."""
    from ..core.wav import encode_wav

    ids = batch.column(id_col).to_pylist()
    media, mtype, srs = [], [], []
    for i in ids:
        sr = 8000 if i % 3 else 16000
        n = 400 + (i * 37) % 1200
        t = np.arange(n, dtype=np.float64)
        freq = 110.0 + (i % 40) * 13.0
        x = np.sin(2 * np.pi * freq * t / sr) * 0.6
        dither = (((i * 2654435761 + t.astype(np.int64) * 40503) >> 7)
                  % 129 - 64) / 16384.0
        pcm = np.clip((x + dither) * 32767, -32768, 32767).astype(np.int16)
        if i % 7 == 0:  # stereo: right channel is attenuated left
            pcm = np.column_stack([pcm, (pcm // 2)]).reshape(-1)
            media.append(encode_wav(pcm, sr, n_channels=2))
        else:
            media.append(encode_wav(pcm, sr))
        mtype.append(WAV_MEDIA_TYPE)
        srs.append(sr)
    return pa.table({
        "media_id": pa.array(ids, type=pa.int64()),
        "media": pa.array(media, type=pa.binary()),
        "media_type": pa.array(mtype, type=pa.string()),
        "sample_rate": pa.array(srs, type=pa.int32()),
    })


class AudioFeaturizer:
    """Actor-pool DECODE→FEATURIZE stage for audio columns: real RIFF/PCM
    parse per row (core/wav.py), vectorized numpy features, TOTAL — bad
    containers and non-PCM encodings land in the error column with the
    codec's precise reason.  Same shape rules as MediaDecoder: state in
    __init__, small batch_size (binary payloads dominate memory)."""

    def __init__(self) -> None:
        from ..core import wav as _wav

        self._wav = _wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = batch.column("media").to_pylist()
        ids = batch.column("media_id").to_pylist()
        ok, err, dur, rms, peak, zcr, nch = [], [], [], [], [], [], []
        for payload in media:
            try:
                sr, ch, samples = self._wav.decode_wav(payload or b"")
                f = self._wav.audio_features(sr, ch, samples)
                ok.append(True)
                err.append("")
                dur.append(f["duration_s"])
                rms.append(f["rms"])
                peak.append(f["peak"])
                zcr.append(f["zcr"])
                nch.append(ch)
            except ValueError as exc:
                ok.append(False)
                err.append(str(exc))
                dur.append(0.0)
                rms.append(0.0)
                peak.append(0.0)
                zcr.append(0.0)
                nch.append(0)
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "decode_ok": pa.array(ok, type=pa.bool_()),
            "error": pa.array(err, type=pa.string()),
            "duration_s": pa.array(dur, type=pa.float64()),
            "rms": pa.array(rms, type=pa.float64()),
            "peak": pa.array(peak, type=pa.float64()),
            "zcr": pa.array(zcr, type=pa.float64()),
            "n_channels": pa.array(nch, type=pa.int32()),
        })


# --- M22: perceptual hashing (dHash) for image near-dup -------------------------

_DHASH_W, _DHASH_H = 9, 8  # 9×8 luma grid → 64 horizontal-gradient bits


def _block_mean_resize(gray: np.ndarray, w: int, h: int,
                       ow: int, oh: int) -> np.ndarray:
    """Area-average downsample to (ow, oh) — integral-image free but
    fully vectorized: variable-width cell sums via np.add.reduceat on
    both axes (exact block means for any size ratio)."""
    img = gray.reshape(h, w).astype(np.float64)
    ys = (np.arange(oh, dtype=np.int64) * h) // oh
    xs = (np.arange(ow, dtype=np.int64) * w) // ow
    rows = np.add.reduceat(img, ys, axis=0)
    cells = np.add.reduceat(rows, xs, axis=1)
    ycnt = np.diff(np.concatenate((ys, [h])))
    xcnt = np.diff(np.concatenate((xs, [w])))
    return cells / (ycnt[:, None] * xcnt[None, :])


def dhash64(media_type: str, payload: bytes) -> int:
    """64-bit difference hash: decode → 9×8 block-mean luma →
    left-vs-right gradient sign per cell.  Robust to resizing and mild
    brightness shifts (monotone transforms preserve gradient signs) —
    the standard cheap image near-dup key."""
    w, h, gray = _decode_any(media_type, payload)
    buf = np.frombuffer(gray, dtype=np.uint8)
    if len(buf) < w * h:  # fake container may truncate — pad like decode
        buf = np.concatenate(
            [buf, np.zeros(w * h - len(buf), dtype=np.uint8)])
    g = _block_mean_resize(buf[:w * h], w, h, _DHASH_W, _DHASH_H)
    bits = (g[:, 1:] > g[:, :-1]).ravel()
    return int(bits.astype(np.uint64) @
               (np.uint64(1) << np.arange(64, dtype=np.uint64)))


class ImageDHasher:
    """Actor-pool stage: media row → (media_id, dhash, decode_ok,
    error).  Total like the decoder — undecodable payloads route to the
    error column, never kill the batch."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("media").to_pylist()
        out_h, ok, err = [], [], []
        for t, p in zip(types, payloads):
            try:
                out_h.append(dhash64(t, p))
                ok.append(True)
                err.append(None)
            except (ValueError, NotImplementedError) as e:
                out_h.append(None)
                ok.append(False)
                err.append(f"{type(e).__name__}: {e}")
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "dhash": pa.array(out_h, type=pa.uint64()),
            "decode_ok": pa.array(ok, type=pa.bool_()),
            "error": pa.array(err, type=pa.string()),
        })


def dhash_pairs(ds: "ray.data.Dataset", max_hamming: int = 10,
                id_col: str = "media_id", hash_col: str = "dhash"
                ) -> "ray.data.Dataset":
    """Image near-dup pairs by dHash hamming distance, banded like
    SimHash: 4 × 16-bit bands (pigeonhole: distance ≤ max_hamming < 16
    guarantees at least one identical band when ≤ 3 bands differ… for
    the standard ≤10 threshold two equal bands are guaranteed), bucket
    groupby, vectorized XOR-popcount within buckets, distinct pairs."""
    import ray.data as _rd  # noqa: F401 — type-only use above
    from .dedup import _signed64

    def band_rows(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        hs = b.column(hash_col).to_numpy(zero_copy_only=False)
        import pyarrow.compute as pc
        valid = ~pc.is_null(b.column(hash_col)).to_numpy(
            zero_copy_only=False)
        ids, hs = ids[valid], hs[valid].astype(np.uint64)
        parts = []
        for band in range(4):
            key = ((hs >> np.uint64(16 * band))
                   & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(pa.table({
                "bucket": pa.array(key + (band << 16)),
                "mid": pa.array(ids),
                "h": pa.array(_signed64(hs)),
            }))
        return pa.concat_tables(parts)

    def pairs(g: pa.Table) -> pa.Table:
        ids = g.column("mid").to_numpy(zero_copy_only=False)
        hs = g.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(ids)
        ids, hs = ids[order], hs[order]
        ia, ib = np.triu_indices(len(ids), k=1)
        if not len(ia):
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        x = hs[ia] ^ hs[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = (ham <= max_hamming) & (ids[ia] != ids[ib])
        return pa.table({
            "id_a": pa.array(ids[ia][keep]),
            "id_b": pa.array(ids[ib][keep]),
            "hamming": pa.array(ham[keep]),
        })

    return (ds.map_batches(band_rows, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pairs, batch_format="pyarrow")
            .groupby(["id_a", "id_b"])
            .map_groups(lambda g: g.slice(0, 1),
                        batch_format="pyarrow"))
