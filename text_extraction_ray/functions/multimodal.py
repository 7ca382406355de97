"""Multimodal column plumbing: opaque binary media + typed metadata.

The container has no image/audio codecs (SURVEY SS0.3), so the DECODE step
is stubbed — ``FakeMediaDecoder`` raises ``NotImplementedError`` for real
media types and uses a deterministic fake decoder for the synthetic
``application/x-fake-image`` payloads.  Everything Ray-side is real and
tested: the schema (binary column + metadata), the actor-pool stage shape
(decoder state built once per actor in ``__init__``), the small batch size
appropriate for large binary payloads, and the feature-table output layout.

Swapping the stub for Pillow/ffmpeg later changes ONE method.
"""

from __future__ import annotations

import struct

import pyarrow as pa

FAKE_MEDIA_TYPE = "application/x-fake-image"
_HEADER = struct.Struct("<HH")  # width, height


def synth_media_batch(batch: pa.Table, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    """Derive a deterministic fake 'image' per row: a (w,h) header plus a
    payload whose bytes are a pure function of the row id."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    media, mtype, width, height = [], [], [], []
    for i, t in zip(ids, texts):
        w = 16 + (i * 7) % 48
        h = 16 + (i * 13) % 32
        n = w * h
        payload = bytes(((i * 2654435761 + k * 40503) >> 7) & 0xFF
                        for k in range(min(n, 4096)))
        media.append(_HEADER.pack(w, h) + payload)
        mtype.append(FAKE_MEDIA_TYPE)
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
        frames = bytearray()
        for f in range(nf):
            frames += bytes(((i * 2654435761 + f * 97 + k * 40503) >> 7) & 0xFF
                            for k in range(w * h))
        media.append(_VHEADER.pack(nf, w, h) + bytes(frames))
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


class FakeImageResizer:
    """Actor-pool RESIZE stage: nearest-neighbor downsample of the fake
    raster to fit ``max_dim``, preserving aspect ratio.  Output rows keep
    the media schema (header rewritten), so the stage composes with
    ``FakeMediaDecoder`` downstream — the resize→decode chain is the
    thumbnailing pipeline shape.  Real codecs replace ``_resize`` only."""

    def __init__(self, max_dim: int = 16) -> None:
        self.max_dim = max_dim

    def _resize(self, payload: bytes) -> bytes:
        w, h = _HEADER.unpack_from(payload, 0)
        body = payload[_HEADER.size:]
        scale = max(w, h, 1) / self.max_dim
        tw = max(int(w / scale), 1) if scale > 1 else w
        th = max(int(h / scale), 1) if scale > 1 else h
        out = bytearray()
        for ty in range(th):
            sy = ty * h // th
            row = sy * w
            for tx in range(tw):
                k = row + tx * w // tw
                out.append(body[k] if k < len(body) else 0)
        return _HEADER.pack(tw, th) + bytes(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = batch.column("media").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        ids = batch.column("media_id").to_pylist()
        out_media, out_w, out_h = [], [], []
        for payload, mt in zip(media, mtypes):
            if mt != FAKE_MEDIA_TYPE:
                raise NotImplementedError(
                    f"no resize codec for {mt!r} — plug PIL here")
            resized = self._resize(payload or b"")
            w, h = _HEADER.unpack_from(resized, 0)
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
    """Actor-pool decode/feature stage for binary media columns.

    Use with small batches — binary payloads dominate batch memory::

        ds.map_batches(FakeMediaDecoder, concurrency=(1, N), batch_size=16,
                       batch_format="pyarrow", zero_copy_batch=True)
    """

    def __init__(self) -> None:
        # real decoders load codec/model state here, once per actor
        self._lut = bytes(range(256))

    def _decode(self, media_type: str, payload: bytes) -> tuple[int, int, bytes]:
        if media_type != FAKE_MEDIA_TYPE:
            raise NotImplementedError(
                f"no codec for {media_type!r} in this environment — "
                "plug a real decoder here (PIL/ffmpeg)")
        w, h = _HEADER.unpack_from(payload, 0)
        return w, h, payload[_HEADER.size:]

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
                mean_px.append(round(sum(body) / max(len(body), 1), 4))
                thumb.append(body[:16])
            except NotImplementedError as exc:
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
