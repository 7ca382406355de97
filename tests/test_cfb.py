"""M36: Compound File Binary (OLE2) container reader/writer."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_extraction_ray.core.cfb import (
    CFB_MAGIC,
    build_cfb,
    cfb_entries,
    cfb_read,
)


def test_roundtrip_regular_and_mini_streams():
    """Streams below the 4096 cutoff travel the mini-FAT path, streams
    at/above it the regular FAT path — both must roundtrip exactly."""
    streams = [("Mini", b"m" * 100), ("Edge", b"e" * 4095),
               ("Cut", b"c" * 4096), ("Big", bytes(range(256)) * 300)]
    blob = build_cfb(streams)
    ents = cfb_entries(blob)
    for name, want in streams:
        assert cfb_read(blob, name, ents) == want, name
    assert ents["Mini"][1] == 100


def test_empty_stream_and_unicode_names():
    blob = build_cfb([("Läereß", b""), ("X", b"x")])
    assert cfb_read(blob, "Läereß") == b""
    assert cfb_read(blob, "X") == b"x"


def test_not_cfb_raises():
    for bad in (b"", b"PK\x03\x04", b"\xd0\xcf\x11\xe0 short",
                CFB_MAGIC + b"\x00" * 20):
        with pytest.raises(ValueError):
            cfb_entries(bad)


def test_missing_stream_raises():
    blob = build_cfb([("A", b"a")])
    with pytest.raises(ValueError):
        cfb_read(blob, "Nope")


def test_cycle_in_fat_is_bounded():
    """A FAT chain pointing at itself must raise, not loop forever."""
    blob = bytearray(build_cfb([("Big", b"b" * 5000)]))
    ents = cfb_entries(bytes(blob))
    start = ents["Big"][0]
    # FAT sector 0 begins at offset 512; entry `start` points to itself
    struct.pack_into("<I", blob, 512 + 4 * start, start)
    with pytest.raises(ValueError):
        cfb_read(bytes(blob), "Big")


def test_truncated_file_total():
    blob = build_cfb([("Big", b"b" * 9000), ("Mini", b"m" * 10)])
    for cut in (100, 512, 600, len(blob) // 2, len(blob) - 7):
        try:
            ents = cfb_entries(blob[:cut])
            for n in ents:
                cfb_read(blob[:cut], n, ents)
        except ValueError:
            pass        # any malformation must be ValueError, nothing else


@given(st.lists(
    st.tuples(st.integers(0, 6),
              st.binary(min_size=0, max_size=9000)),
    min_size=1, max_size=8))
@settings(max_examples=30, deadline=None)
def test_roundtrip_property(pairs):
    streams = [(f"S{k}_{i}", b) for i, (k, b) in enumerate(pairs)]
    blob = build_cfb(streams)
    ents = cfb_entries(blob)
    for name, want in streams:
        assert cfb_read(blob, name, ents) == want
