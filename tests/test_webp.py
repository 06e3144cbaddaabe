"""Stdlib WebP RIFF-walker tests (functions/webp.py): the metadata
decode slot for the third dominant web image format."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions.webp import (
    WebpError,
    encode_webp_shell,
    parse_webp_header,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16000),
    h=st.integers(min_value=1, max_value=16000),
    layout=st.sampled_from(["VP8 ", "VP8L", "VP8X"]),
)
def test_shell_roundtrip_property(w, h, layout):
    hdr = parse_webp_header(encode_webp_shell(w, h, layout))
    assert (hdr["width"], hdr["height"], hdr["layout"]) == (w, h, layout)


def test_vp8x_24bit_range():
    hdr = parse_webp_header(encode_webp_shell(1 << 20, 3, "VP8X"))
    assert hdr["width"] == 1 << 20


def test_bad_magic_rejected():
    with pytest.raises(WebpError, match="magic"):
        parse_webp_header(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(WebpError):
        parse_webp_header(b"")


def test_truncated_chunk_rejected():
    buf = encode_webp_shell(64, 32, "VP8L")
    with pytest.raises(WebpError):
        parse_webp_header(buf[:18])


def test_unknown_chunks_skipped_with_padding():
    # prepend an odd-sized unknown chunk (padded) before the frame:
    # the walker must skip it, honoring the even-byte padding rule
    frame = encode_webp_shell(48, 24, "VP8 ")
    inner = frame[12:]  # chunks after RIFF....WEBP
    junk = b"XTRA" + struct.pack("<I", 3) + b"abc" + b"\x00"
    riff = b"WEBP" + junk + inner
    buf = b"RIFF" + struct.pack("<I", len(riff)) + riff
    hdr = parse_webp_header(buf)
    assert (hdr["width"], hdr["height"], hdr["n_chunks"]) == (48, 24, 2)


def test_missing_frame_chunk_rejected():
    junk = b"XTRA" + struct.pack("<I", 2) + b"ab"
    riff = b"WEBP" + junk
    buf = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(WebpError, match="frame chunk"):
        parse_webp_header(buf)


def test_vp8_sync_code_checked():
    buf = bytearray(encode_webp_shell(10, 10, "VP8 "))
    i = buf.find(b"\x9d\x01\x2a")
    buf[i] = 0x00
    with pytest.raises(WebpError, match="sync"):
        parse_webp_header(bytes(buf))
