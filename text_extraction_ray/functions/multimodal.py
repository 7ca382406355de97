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
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "decode_ok": pa.array(ok, type=pa.bool_()),
                "error": pa.array(err, type=pa.string()),
                "n_pixels": pa.array(n_px, type=pa.int64()),
                "mean_pixel": pa.array(mean_px, type=pa.float64()),
                "thumb16": pa.array(thumb, type=pa.binary()),
            }
        )
