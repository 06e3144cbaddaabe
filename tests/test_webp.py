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


# ---------------------------------------------------------------------------
# VP8L pixel codec (simple-prefix-code subset, functions/webp_vp8l.py)
# ---------------------------------------------------------------------------

import numpy as np
import pytest

from map2db_spark.functions.webp_vp8l import (
    decode_vp8l_simple,
    encode_vp8l_simple,
)


def _checker(h, w, c0, c1, phase=0):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = c0 if (x + y + phase) % 2 == 0 else c1
    return img


def test_vp8l_two_tone_roundtrip_exact():
    img = _checker(5, 7, (10, 200, 30), (250, 40, 90))
    dec = decode_vp8l_simple(encode_vp8l_simple(img))
    assert np.array_equal(dec[:, :, :3], img)
    assert (dec[:, :, 3] == 255).all()


def test_vp8l_solid_fill_zero_bits_per_pixel():
    """One-symbol codes cost zero scan bits: a solid image's size is
    header-only, independent of pixel count."""
    small = encode_vp8l_simple(np.full((2, 2, 3), 9, dtype=np.uint8))
    big = encode_vp8l_simple(np.full((64, 64, 3), 9, dtype=np.uint8))
    assert len(small) == len(big)
    dec = decode_vp8l_simple(big)
    assert (dec[:, :, :3] == 9).all() and dec.shape == (64, 64, 4)


def test_vp8l_mixed_channel_arity():
    img = _checker(4, 6, (7, 50, 200), (7, 90, 100))  # red constant
    dec = decode_vp8l_simple(encode_vp8l_simple(img))
    assert np.array_equal(dec[:, :, :3], img)


def test_vp8l_rgba_alpha_two_tone():
    img = np.zeros((3, 4, 4), dtype=np.uint8)
    img[:, :, :3] = 120
    img[:, :, 3] = 255
    img[1, 2, 3] = 128  # two-tone alpha
    dec = decode_vp8l_simple(encode_vp8l_simple(img))
    assert np.array_equal(dec, img)


def test_vp8l_header_agrees_with_metadata_walker():
    """The pixel encoder's bit layout matches the independent
    metadata walker's reading of the same header fields."""
    from map2db_spark.functions.webp import parse_webp_header

    enc = encode_vp8l_simple(np.full((11, 13, 3), 4, dtype=np.uint8))
    hdr = parse_webp_header(enc)
    assert (hdr["width"], hdr["height"], hdr["layout"]) == (13, 11, "VP8L")


def test_vp8l_rejects_out_of_envelope():
    from map2db_spark.functions.webp import WebpError, encode_webp_shell

    # >2 values per channel: encoder refuses
    with pytest.raises(WebpError):
        encode_vp8l_simple(np.arange(27, dtype=np.uint8).reshape(3, 3, 3))
    # lossy VP8 chunk: decoder raises NotImplementedError, never
    # mis-decodes
    with pytest.raises(NotImplementedError):
        decode_vp8l_simple(encode_webp_shell(8, 8, "VP8 "))
    # shell VP8L (filler payload, transform bit garbage) must raise,
    # not silently return pixels
    with pytest.raises((NotImplementedError, WebpError)):
        decode_vp8l_simple(encode_webp_shell(8, 8, "VP8L"))


def test_vp8l_truncation_always_raises_webp_error():
    """Quarantine contract under corruption: any truncation of a valid
    VP8L stream (except trailing pad bytes after a complete bitstream)
    raises WebpError — never a raw IndexError or silent garbage."""
    from map2db_spark.functions.webp import WebpError

    img = np.zeros((6, 8, 3), dtype=np.uint8)
    for y in range(6):
        for x in range(8):
            img[y, x] = (10, 20, 30) if (x + y) % 2 == 0 else (200, 210, 220)
    enc = encode_vp8l_simple(img)
    for cut in range(1, len(enc) - 1):
        try:
            out = decode_vp8l_simple(enc[:cut])
        except (WebpError, NotImplementedError):
            continue
        assert out.shape == (6, 8, 4)  # only legal if the stream fit
