"""TAR document-dump source — S22 (round 5).

Crawl snapshots and document corpora routinely ship as tarballs of raw
files (one member per document).  From-scratch ustar/POSIX parse — no
``tarfile`` import, matching the repo's container discipline (the ZIP
and CFB layers are also hand-rolled and independently interop-tested):

- 512-byte headers: name(100) + prefix(155) joined per POSIX §ustar,
  size/mtime as octal (GNU base-256 size form handled for >8 GiB
  members), data padded to the next 512 boundary;
- GNU long-name extensions: an ``L`` member carries the following
  member's real name; ``K`` (long linkname) is consumed and skipped;
- pax extended headers: an ``x`` member's ``path=`` record overrides
  the next member's name (the other pax records are irrelevant here);
- only regular files (typeflag '0' or NUL) yield documents; dirs,
  links and unknown types are skipped; two zero blocks end the
  archive (a torn tail just ends the iteration — crawl salvage);
- ``.tar.gz`` shards gunzip first (bounded, prefix-salvaging).

``read_tar_pages`` exposes shards as a PAGES-schema Dataset: one task
per shard (``read_binary_files`` keeps the bytes in the object store,
the flat-parse runs distributed), url = ``tar://<shard-stem>/<member
name>``, warc_ts from the member's mtime.  The checkpointed job
(`pipelines/job.py`) consumes ``.tar``/``.tar.gz`` shards directly via
``_iter_shard_tables``.
"""

from __future__ import annotations

import datetime as _dt
import zlib

import pyarrow as pa

_BLOCK = 512
_GUNZIP_CAP = 1 << 30      # shard-level bound (a shard is one tar file)


def _octal(field: bytes) -> int:
    """Parse an octal header field; GNU base-256 (high bit set) for
    oversize values.  Returns 0 on garbage (salvage posture)."""
    if field[:1] and field[0] & 0x80:
        val = 0
        for b in field:
            val = (val << 8) | b
        return val & ~(0x80 << (8 * (len(field) - 1)))
    s = field.split(b"\x00", 1)[0].strip()
    try:
        return int(s, 8) if s else 0
    except ValueError:
        return 0


def iter_tar(data: bytes):
    """ustar bytes → yields (name, mtime_epoch, member_bytes) for each
    regular file.  Total: a torn tail ends the iteration."""
    pos = 0
    n = len(data)
    pending_name: str | None = None
    while pos + _BLOCK <= n:
        hdr = data[pos : pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:
            break
        size = _octal(hdr[124:136])
        mtime = _octal(hdr[136:148])
        typeflag = hdr[156:157]
        name_raw = hdr[0:100].split(b"\x00", 1)[0]
        prefix = hdr[345:500].split(b"\x00", 1)[0]
        name = name_raw.decode("utf-8", "replace")
        if prefix:
            name = prefix.decode("utf-8", "replace") + "/" + name
        body_end = pos + _BLOCK + size
        body = data[pos + _BLOCK : min(body_end, n)]
        pos += _BLOCK + ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
        if typeflag == b"L":                 # GNU long name
            pending_name = body.split(b"\x00", 1)[0].decode(
                "utf-8", "replace")
            continue
        if typeflag == b"K":                 # GNU long linkname — skip
            continue
        if typeflag == b"x" or typeflag == b"g":   # pax records
            for line in body.split(b"\n"):
                sp = line.find(b" ")
                if sp > 0 and line[sp + 1 :].startswith(b"path="):
                    pending_name = line[sp + 6 :].decode(
                        "utf-8", "replace")
            continue
        if typeflag not in (b"0", b"\x00"):  # dirs, links, devices
            pending_name = None
            continue
        if pending_name is not None:
            name, pending_name = pending_name, None
        if len(body) < size:                 # torn tail: salvage prefix
            if body:
                yield name, mtime, body
            break
        yield name, mtime, body


def iter_tar_stream(fh):
    """Streaming variant of ``iter_tar`` over a binary file object:
    memory stays ~one member (tar is a sequence of fixed 512-byte
    blocks — no random access needed).  Yields (name, mtime, bytes)
    for regular files; same GNU-L/pax/skip semantics as the in-memory
    parser, torn tails salvage the decoded prefix.

    ``.tar.gz`` shards wrap the file object in a streaming gunzip
    first (`_GzipStream`), so the compressed shard never fully
    materializes either — the iter_warc_stream discipline."""
    pending_name: str | None = None
    while True:
        hdr = fh.read(_BLOCK)
        if len(hdr) < _BLOCK or hdr == b"\x00" * _BLOCK:
            return
        size = _octal(hdr[124:136])
        mtime = _octal(hdr[136:148])
        typeflag = hdr[156:157]
        name_raw = hdr[0:100].split(b"\x00", 1)[0]
        prefix = hdr[345:500].split(b"\x00", 1)[0]
        name = name_raw.decode("utf-8", "replace")
        if prefix:
            name = prefix.decode("utf-8", "replace") + "/" + name
        padded = ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
        body = fh.read(min(size, padded))
        if len(body) >= size:
            fh.read(padded - size)      # skip padding
        if typeflag == b"L":
            pending_name = body[:size].split(b"\x00", 1)[0].decode(
                "utf-8", "replace")
            continue
        if typeflag == b"K":
            continue
        if typeflag in (b"x", b"g"):
            for line in body[:size].split(b"\n"):
                sp = line.find(b" ")
                if sp > 0 and line[sp + 1:].startswith(b"path="):
                    pending_name = line[sp + 6:].decode(
                        "utf-8", "replace")
            continue
        if typeflag not in (b"0", b"\x00"):
            pending_name = None
            continue
        if pending_name is not None:
            name, pending_name = pending_name, None
        if len(body) < size:            # torn tail: salvage prefix
            if body:
                yield name, mtime, body[:size]
            return
        yield name, mtime, body[:size]


class _GzipStream:
    """Minimal streaming gunzip file-object wrapper (read(n) only),
    bounded per-chunk; a corrupt tail ends the stream (salvage)."""

    def __init__(self, fh, chunk: int = 1 << 20) -> None:
        self._fh = fh
        self._chunk = chunk
        self._d = zlib.decompressobj(31)
        self._buf = bytearray()
        self._eof = False

    def read(self, n: int) -> bytes:
        while len(self._buf) < n and not self._eof:
            raw = self._d.unconsumed_tail or self._fh.read(self._chunk)
            if not raw:
                self._eof = True
                break
            try:
                self._buf += self._d.decompress(raw, self._chunk)
            except zlib.error:
                self._eof = True
                break
            if self._d.eof:
                # concatenated gzip members (tar.gz is usually one
                # stream, but members cost nothing to support)
                tail = self._d.unused_data.lstrip(b"\x00")
                if tail[:2] == b"\x1f\x8b":
                    self._d = zlib.decompressobj(31)
                    self._buf += self._d.decompress(tail, self._chunk)
                else:
                    self._eof = True
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out


def open_tar_stream(path: str):
    """Path → (file handle to close, streaming member iterator)."""
    fh = open(path, "rb")
    if path.endswith((".tar.gz", ".tgz")):
        return fh, iter_tar_stream(_GzipStream(fh))
    return fh, iter_tar_stream(fh)


def _maybe_gunzip(data: bytes) -> bytes:
    if not data.startswith(b"\x1f\x8b"):
        return data
    d = zlib.decompressobj(31)
    try:
        return d.decompress(data, _GUNZIP_CAP)
    except zlib.error:
        return b""


def tar_to_pages(shard_name: str, data: bytes) -> pa.Table:
    """One tar shard → a PAGES-schema ``pyarrow.Table``: member name →
    url (``tar://<shard-stem>/<name>``), mtime → warc_ts, bytes →
    html; lang empty (no crawl metadata in a tarball)."""
    data = _maybe_gunzip(data)
    stem = shard_name.rsplit("/", 1)[-1]
    for suf in (".tar.gz", ".tgz", ".tar"):
        if stem.endswith(suf):
            stem = stem[: -len(suf)]
            break
    urls, tss, bodies = [], [], []
    for name, mtime, body in iter_tar(data):
        urls.append(f"tar://{stem}/{name}")
        # clamp to [epoch, year 2200]: mutated/garbage octal fields must
        # not overflow datetime (found by test_fuzz_tar_source_total)
        tss.append(_dt.datetime(1970, 1, 1)
                   + _dt.timedelta(seconds=min(max(mtime, 0),
                                               7_258_118_400)))
        bodies.append(body)
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(tss, type=pa.timestamp("us")),
        "html": pa.array(bodies, type=pa.binary()),
        "lang": pa.array([""] * len(urls), type=pa.string()),
    })


def read_tar_pages(paths: list[str]):
    """TAR shards → PAGES-schema Dataset (shard-parallel: one
    read_binary_files task per shard, flat-parse inside map_batches,
    the WET/sitemap source shape)."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        parts = [tar_to_pages(p, b) for p, b in
                 zip(batch.column("path").to_pylist(),
                     batch.column("bytes").to_pylist())]
        parts = [t for t in parts if t.num_rows]
        return (pa.concat_tables(parts) if parts
                else tar_to_pages("empty.tar", b""))

    return ds.map_batches(parse, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Writer — deterministic ustar archives (fixtures stay closed)
# --------------------------------------------------------------------------

def _hdr(name: str, size: int, mtime: int, typeflag: bytes) -> bytes:
    nb = name.encode("utf-8")
    hdr = bytearray(_BLOCK)
    hdr[0:min(100, len(nb))] = nb[:100]
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = (b"%011o" % size) + b"\x00"
    hdr[136:148] = (b"%011o" % mtime) + b"\x00"
    hdr[148:156] = b" " * 8                    # checksum placeholder
    hdr[156:157] = typeflag
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    chk = sum(hdr)
    hdr[148:156] = (b"%06o" % chk) + b"\x00 "
    return bytes(hdr)


def _pad(data: bytes) -> bytes:
    rem = len(data) % _BLOCK
    return data + b"\x00" * (_BLOCK - rem if rem else 0)


def write_tar(members: list[tuple[str, int, bytes]], *,
              gzip_out: bool = False) -> bytes:
    """[(name, mtime, bytes)...] → ustar archive; names over 100 chars
    emit a GNU ``L`` long-name member first (the form real tars use)."""
    out = bytearray()
    for name, mtime, body in members:
        if len(name.encode("utf-8")) > 100:
            nb = name.encode("utf-8") + b"\x00"
            out += _hdr("././@LongLink", len(nb), 0, b"L") + _pad(nb)
            short = name.encode("utf-8")[:100].decode("utf-8", "ignore")
        else:
            short = name
        out += _hdr(short, len(body), mtime, b"0") + _pad(body)
    out += b"\x00" * (2 * _BLOCK)
    if gzip_out:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(bytes(out)) + co.flush()
    return bytes(out)
