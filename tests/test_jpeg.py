"""Stdlib JPEG marker-walker tests (functions/jpeg.py): the real
metadata-decode slot behind the multimodal media column — frame
geometry without pixel decode."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions.jpeg import (
    JpegError,
    encode_jpeg_shell,
    parse_jpeg_header,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=0xFFFF),
    h=st.integers(min_value=1, max_value=0xFFFF),
    nc=st.sampled_from([1, 3, 4]),
)
def test_shell_roundtrip_property(w, h, nc):
    hdr = parse_jpeg_header(encode_jpeg_shell(w, h, nc))
    assert (hdr["width"], hdr["height"], hdr["ncomp"]) == (w, h, nc)
    assert hdr["precision"] == 8
    assert not hdr["progressive"]


def test_bad_magic_rejected():
    with pytest.raises(JpegError, match="magic"):
        parse_jpeg_header(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(JpegError):
        parse_jpeg_header(b"")


def test_truncated_segment_rejected():
    buf = encode_jpeg_shell(32, 16, 3)
    with pytest.raises(JpegError):
        parse_jpeg_header(buf[:10])


def test_missing_sof_rejected():
    # SOI + APP0 + EOI, never a frame header
    app0 = struct.pack(">BBH", 0xFF, 0xE0, 7) + b"JFIF\x00"
    with pytest.raises(JpegError, match="SOF"):
        parse_jpeg_header(b"\xff\xd8" + app0 + b"\xff\xd9")


def test_fill_bytes_before_marker_accepted():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    buf = encode_jpeg_shell(48, 24, 1)
    assert buf[:2] == b"\xff\xd8"
    padded = buf[:2] + b"\xff\xff\xff" + buf[2:]
    hdr = parse_jpeg_header(padded)
    assert (hdr["width"], hdr["height"]) == (48, 24)


def test_progressive_sof2_detected():
    buf = bytearray(encode_jpeg_shell(20, 10, 3))
    # rewrite the SOF0 marker byte (FF C0) to SOF2 (FF C2)
    i = buf.find(b"\xff\xc0")
    assert i > 0
    buf[i + 1] = 0xC2
    hdr = parse_jpeg_header(bytes(buf))
    assert hdr["progressive"] and hdr["width"] == 20


def test_segment_count_matches_shell_layout():
    # APP0, COM, DQT, SOF0, DHT, SOS = 6 segments before entropy data
    assert parse_jpeg_header(encode_jpeg_shell(8, 8, 1))["n_segments"] == 6
