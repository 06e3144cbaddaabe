"""Stdlib ISO-BMFF box-walker tests (functions/mp4.py): the video
metadata decode slot."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions.mp4 import (
    Mp4Error,
    encode_mp4_shell,
    parse_mp4_header,
)


@settings(max_examples=60, deadline=None)
@given(
    ts=st.integers(min_value=1, max_value=1_000_000),
    dur=st.integers(min_value=0, max_value=1 << 40),
    v=st.sampled_from([0, 1]),
)
def test_shell_roundtrip_property(ts, dur, v):
    if v == 0 and dur >= 1 << 32:
        dur %= 1 << 32
    h = parse_mp4_header(encode_mp4_shell(ts, dur, version=v))
    assert (h["timescale"], h["duration"], h["version"]) == (ts, dur, v)
    assert h["duration_ms"] == dur * 1000 // ts


def test_v1_64bit_duration():
    h = parse_mp4_header(encode_mp4_shell(90000, 1 << 33, version=1))
    assert h["duration"] == 1 << 33


def test_ftyp_must_come_first():
    with pytest.raises(Mp4Error, match="ftyp"):
        parse_mp4_header(b"\x00\x00\x00\x08free")
    with pytest.raises(Mp4Error):
        parse_mp4_header(b"")


def test_truncated_box_rejected():
    buf = encode_mp4_shell(600, 100)
    with pytest.raises(Mp4Error):
        parse_mp4_header(buf[: len(buf) // 3])


def test_missing_mvhd_rejected():
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
    free = struct.pack(">I", 8) + b"free"
    with pytest.raises(Mp4Error, match="mvhd"):
        parse_mp4_header(ftyp + free)


def test_largesize_box_skipped():
    # insert a size==1 (u64 largesize) free box between ftyp and moov
    buf = encode_mp4_shell(600, 300)
    ftyp_len = struct.unpack_from(">I", buf, 0)[0]
    big = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 20) + b"abcd"
    patched = buf[:ftyp_len] + big + buf[ftyp_len:]
    h = parse_mp4_header(patched)
    assert h["timescale"] == 600 and h["n_boxes"] == 5


def test_zero_timescale_rejected():
    buf = bytearray(encode_mp4_shell(600, 100))
    i = buf.find(b"mvhd")
    # mvhd payload: version+flags (4) + creation (4) + modification (4)
    struct.pack_into(">I", buf, i + 4 + 4 + 4 + 4, 0)
    with pytest.raises(Mp4Error, match="timescale"):
        parse_mp4_header(bytes(buf))
