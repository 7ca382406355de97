"""Compound File Binary (OLE2) container (SURVEY §2.2 M36, round 5).

Legacy binary office documents (.doc/.xls/.ppt) are the pre-2007
formats still abundant in crawl strata — real crawls carry more .doc
than .odt (VERDICT r4 "missing" #2).  All three live inside the same
container: the Compound File Binary format ([MS-CFB]), a mini
FAT-filesystem-in-a-file.  This module implements it from the published
spec, stdlib-only, with the same reader/writer closure discipline as
the ZIP layer in ``core/docx.py``:

- ``cfb_entries`` — header validation, DIFAT (header array + chained
  DIFAT sectors), FAT assembly, directory-chain walk → the stream
  directory ``{name: (start_sector, size)}``.
- ``cfb_read`` — one stream's bytes: regular FAT chain for streams
  ≥ the mini-stream cutoff (4096), mini-FAT chain through the root
  entry's mini stream below it ([MS-CFB] §2.6.4) — both cycle-guarded
  and bounds-checked, ``ValueError`` on any malformation for the
  caller's error routing.
- ``build_cfb`` — deterministic writer (version 3, 512-byte sectors):
  small streams go to the mini stream exactly per spec so the reader's
  mini path is honestly exercised by the corpus; FAT/directory/miniFAT
  layout is a pure function of the input streams.

Scope: enough of [MS-CFB] for single-storage documents (every office
file routes its text through one named stream + optional table
streams); nested storages' streams are still readable since the
directory is walked flat by name.
"""

from __future__ import annotations

import struct

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_NOSTREAM = 0xFFFFFFFF

_MINI_CUTOFF = 4096
_MINI_SECTOR = 64
_MAX_SECTORS = 1 << 20           # 512 MiB bound on hostile chains


def _sector(data: bytes, sid: int, ssz: int) -> bytes:
    off = 512 + sid * ssz
    if sid >= _FATSECT or off + ssz > len(data) + ssz:  # allow short tail
        raise ValueError("cfb: sector id out of bounds")
    chunk = data[off:off + ssz]
    if not chunk:
        raise ValueError("cfb: sector beyond end of file")
    return chunk.ljust(ssz, b"\x00")


def _chain(fat: list[int], start: int) -> list[int]:
    """Follow a FAT chain from ``start`` → sector id list (cycle-guarded)."""
    out: list[int] = []
    seen: set[int] = set()
    sid = start
    while sid != _ENDOFCHAIN:
        if sid in seen or sid >= len(fat) or len(out) > _MAX_SECTORS:
            raise ValueError("cfb: corrupt sector chain")
        seen.add(sid)
        out.append(sid)
        sid = fat[sid]
    return out


def _parse_header(data: bytes) -> dict:
    if len(data) < 512 or not data.startswith(CFB_MAGIC):
        raise ValueError("cfb: not a compound file")
    (sshift, mshift) = struct.unpack_from("<HH", data, 30)
    if sshift not in (9, 12) or mshift != 6:
        raise ValueError("cfb: unsupported sector shift")
    n_fat, dir_start = struct.unpack_from("<II", data, 44)
    cutoff, = struct.unpack_from("<I", data, 56)
    minifat_start, n_minifat = struct.unpack_from("<II", data, 60)
    difat_start, n_difat = struct.unpack_from("<II", data, 68)
    difat = list(struct.unpack_from("<109I", data, 76))
    return {"ssz": 1 << sshift, "n_fat": n_fat, "dir_start": dir_start,
            "cutoff": cutoff or _MINI_CUTOFF,
            "minifat_start": minifat_start, "n_minifat": n_minifat,
            "difat_start": difat_start, "n_difat": n_difat,
            "difat": difat}


def _load_fat(data: bytes, hdr: dict) -> list[int]:
    ssz = hdr["ssz"]
    ids = [s for s in hdr["difat"] if s != _FREESECT]
    # chase DIFAT sectors (127 FAT sector ids + next pointer each)
    sid, hops = hdr["difat_start"], 0
    per = ssz // 4 - 1
    while sid != _ENDOFCHAIN and sid != _FREESECT:
        if hops > hdr["n_difat"] + 4:
            raise ValueError("cfb: DIFAT chain overrun")
        sec = _sector(data, sid, ssz)
        vals = struct.unpack(f"<{ssz // 4}I", sec)
        ids.extend(v for v in vals[:per] if v != _FREESECT)
        sid = vals[per]
        hops += 1
    fat: list[int] = []
    for s in ids[:hdr["n_fat"]]:
        fat.extend(struct.unpack(f"<{ssz // 4}I", _sector(data, s, ssz)))
    return fat


def _read_chain(data: bytes, fat: list[int], start: int, ssz: int,
                size: int | None = None) -> bytes:
    buf = b"".join(_sector(data, s, ssz) for s in _chain(fat, start))
    return buf if size is None else buf[:size]


def cfb_entries(data: bytes) -> dict[str, tuple[int, int]]:
    """Directory walk → {stream_name: (start_sector, size)}.

    Storage entries (folders) are skipped; the root entry is kept under
    its name ``"Root Entry"`` so ``cfb_read`` can reach the mini
    stream.  Raises ValueError on malformation."""
    hdr = _parse_header(data)
    fat = _load_fat(data, hdr)
    raw = _read_chain(data, fat, hdr["dir_start"], hdr["ssz"])
    entries: dict[str, tuple[int, int]] = {}
    for off in range(0, len(raw) - 127, 128):
        ent = raw[off:off + 128]
        nlen, = struct.unpack_from("<H", ent, 64)
        otype = ent[66]
        if otype not in (2, 5) or nlen < 2 or nlen > 64:
            continue
        name = ent[:nlen - 2].decode("utf-16-le", "replace")
        start, = struct.unpack_from("<I", ent, 116)
        size, = struct.unpack_from("<Q", ent, 120)
        if size > len(data) * 16:
            raise ValueError("cfb: stream size exceeds file bound")
        entries[name] = (start, int(size))
    if "Root Entry" not in entries:
        raise ValueError("cfb: no root directory entry")
    return entries


def cfb_read(data: bytes, name: str,
             entries: dict[str, tuple[int, int]] | None = None) -> bytes:
    """One stream's bytes (mini or regular FAT per [MS-CFB] §2.6.4)."""
    hdr = _parse_header(data)
    fat = _load_fat(data, hdr)
    if entries is None:
        entries = cfb_entries(data)
    if name not in entries:
        raise ValueError(f"cfb: no stream {name!r}")
    start, size = entries[name]
    if name == "Root Entry" or size >= hdr["cutoff"]:
        return _read_chain(data, fat, start, hdr["ssz"], size)
    # mini stream: miniFAT chain addressed inside the root chain
    root_start, root_size = entries["Root Entry"]
    mini = _read_chain(data, fat, root_start, hdr["ssz"], root_size)
    if hdr["n_minifat"] == 0:
        return b""[:size] if size == 0 else _fail_mini()
    mraw = _read_chain(data, fat, hdr["minifat_start"], hdr["ssz"])
    minifat = list(struct.unpack(f"<{len(mraw) // 4}I", mraw))
    out = bytearray()
    for sid in _chain(minifat, start):
        off = sid * _MINI_SECTOR
        if off >= len(mini):
            raise ValueError("cfb: mini sector beyond mini stream")
        out += mini[off:off + _MINI_SECTOR]
    return bytes(out[:size])


def _fail_mini() -> bytes:
    raise ValueError("cfb: mini stream missing")


# --------------------------------------------------------------------------
# writer — deterministic v3 (512-byte sectors), corpus closure
# --------------------------------------------------------------------------

def _dir_entry(name: str, otype: int, start: int, size: int,
               child: int = _NOSTREAM) -> bytes:
    raw = name.encode("utf-16-le")
    if len(raw) > 62:
        raise ValueError("cfb: name too long")
    ent = bytearray(128)
    ent[:len(raw)] = raw
    struct.pack_into("<H", ent, 64, len(raw) + 2)
    ent[66] = otype
    ent[67] = 1                                    # black
    struct.pack_into("<III", ent, 68, _NOSTREAM, _NOSTREAM, child)
    struct.pack_into("<I", ent, 116, start)
    struct.pack_into("<Q", ent, 120, size)
    return bytes(ent)


def build_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """Deterministic single-storage compound file (v3, 512-byte
    sectors).  Streams < 4096 bytes go to the mini stream per spec."""
    ssz, per = 512, 128

    def nsec(nbytes: int, unit: int = 512) -> int:
        return (nbytes + unit - 1) // unit

    small = [(n, b) for n, b in streams if len(b) < _MINI_CUTOFF]
    big = [(n, b) for n, b in streams if len(b) >= _MINI_CUTOFF]

    # mini stream layout + miniFAT
    mini = bytearray()
    minifat: list[int] = []
    mini_start: dict[str, int] = {}
    for n, b in small:
        first = len(minifat)
        k = max(1, nsec(len(b), _MINI_SECTOR)) if b else 0
        if not b:
            mini_start[n] = _ENDOFCHAIN
            continue
        mini_start[n] = first
        mini += b.ljust(k * _MINI_SECTOR, b"\x00")
        minifat.extend(list(range(first + 1, first + k)) + [_ENDOFCHAIN])
    n_mini_sectors = nsec(len(mini))
    n_minifat_sectors = nsec(len(minifat) * 4)

    n_dir_entries = 1 + len(streams)
    n_dir_sectors = nsec(n_dir_entries * 128)

    big_sectors = [nsec(len(b)) for _, b in big]

    # fixed point for the FAT sector count
    n_fat = 1
    while True:
        total = (n_fat + n_dir_sectors + n_minifat_sectors
                 + n_mini_sectors + sum(big_sectors))
        need = nsec(total * 4)
        if need <= n_fat:
            break
        n_fat = need

    # sector layout: [FAT][DIR][miniFAT][ministream][big streams...]
    fat_ids = list(range(n_fat))
    dir_first = n_fat
    minifat_first = dir_first + n_dir_sectors
    ministream_first = minifat_first + n_minifat_sectors
    big_first = ministream_first + n_mini_sectors

    fat: list[int] = [_FATSECT] * n_fat

    def add_chain(first: int, count: int) -> None:
        while len(fat) < first:
            fat.append(_FREESECT)
        fat.extend(list(range(first + 1, first + count)) + [_ENDOFCHAIN])

    if n_dir_sectors:
        add_chain(dir_first, n_dir_sectors)
    if n_minifat_sectors:
        add_chain(minifat_first, n_minifat_sectors)
    if n_mini_sectors:
        add_chain(ministream_first, n_mini_sectors)
    big_start: dict[str, int] = {}
    nxt = big_first
    for (n, b), k in zip(big, big_sectors):
        big_start[n] = nxt
        add_chain(nxt, k)
        nxt += k
    total_sectors = nxt
    fat.extend([_FREESECT] * (n_fat * per - len(fat)))

    # directory: root (child = entry 1) then streams in given order
    dirents = [_dir_entry("Root Entry", 5,
                          ministream_first if n_mini_sectors else _ENDOFCHAIN,
                          len(mini), child=1 if streams else _NOSTREAM)]
    for n, b in streams:
        start = (big_start[n] if len(b) >= _MINI_CUTOFF
                 else mini_start[n])
        dirents.append(_dir_entry(n, 2, start, len(b)))
    dir_raw = b"".join(dirents).ljust(n_dir_sectors * ssz, b"\x00")

    minifat_raw = b"".join(struct.pack("<I", v) for v in minifat)
    minifat_raw = minifat_raw.ljust(n_minifat_sectors * ssz, b"\xff")

    body = bytearray()
    body += b"".join(struct.pack("<I", v) for v in fat)
    body += dir_raw
    body += minifat_raw
    body += bytes(mini).ljust(n_mini_sectors * ssz, b"\x00")
    for n, b in big:
        body += b.ljust(nsec(len(b)) * ssz, b"\x00")
    assert len(body) == total_sectors * ssz

    hdr = bytearray(512)
    hdr[:8] = CFB_MAGIC
    struct.pack_into("<H", hdr, 24, 0x003E)        # minor
    struct.pack_into("<H", hdr, 26, 0x0003)        # major (v3)
    struct.pack_into("<H", hdr, 28, 0xFFFE)        # little-endian
    struct.pack_into("<HH", hdr, 30, 9, 6)         # sector shifts
    struct.pack_into("<II", hdr, 44, n_fat, dir_first)
    struct.pack_into("<I", hdr, 56, _MINI_CUTOFF)
    struct.pack_into("<II", hdr, 60,
                     minifat_first if n_minifat_sectors else _ENDOFCHAIN,
                     n_minifat_sectors)
    struct.pack_into("<II", hdr, 68, _ENDOFCHAIN, 0)   # no DIFAT sectors
    for k in range(109):
        struct.pack_into("<I", hdr, 76 + 4 * k,
                         fat_ids[k] if k < len(fat_ids) else _FREESECT)
    if n_fat > 109:
        raise ValueError("cfb: writer supports <= 109 FAT sectors")
    return bytes(hdr) + bytes(body)
