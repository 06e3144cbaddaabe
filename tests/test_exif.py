"""EXIF metadata layer: encode/parse round-trips across byte orders
and field subsets, orientation transform exactness, typed errors."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from map2db_spark.functions.exif import (
    ExifError,
    apply_orientation,
    encode_exif_app1,
    encode_jpeg_with_exif,
    invert_orientation,
    parse_exif,
)


def test_roundtrip_all_fields_both_byte_orders():
    for bo in ("<", ">"):
        jpg = encode_jpeg_with_exif(
            40, 30,
            orientation=6, make="CamCo", model="X-100",
            datetime="2023:05:01 12:34:56",
            pixel_x=40, pixel_y=30, byte_order=bo,
        )
        meta = parse_exif(jpg)
        assert meta == {
            "orientation": 6, "make": "CamCo", "model": "X-100",
            "datetime": "2023:05:01 12:34:56",
            "pixel_x": 40, "pixel_y": 30,
            "byte_order": "II" if bo == "<" else "MM",
        }
        # the frame walker still reads the same stream (APP1 first)
        from map2db_spark.functions.jpeg import parse_jpeg_header

        hdr = parse_jpeg_header(jpg)
        assert (hdr["width"], hdr["height"]) == (40, 30)


def test_minimal_orientation_only():
    jpg = encode_jpeg_with_exif(8, 8, orientation=3)
    meta = parse_exif(jpg)
    assert meta["orientation"] == 3
    assert meta["make"] is None and meta["pixel_x"] is None


def test_typed_errors():
    with pytest.raises(ExifError, match="no EXIF"):
        from map2db_spark.functions.jpeg import encode_jpeg_shell

        parse_exif(encode_jpeg_shell(8, 8))
    with pytest.raises(ExifError, match="not a JPEG"):
        parse_exif(b"\x89PNG")
    with pytest.raises(ExifError, match="orientation"):
        encode_exif_app1(orientation=9)
    # truncated TIFF body inside APP1
    jpg = bytearray(encode_jpeg_with_exif(8, 8, orientation=2, make="A" * 40))
    # corrupt the IFD0 offset to point far outside
    i = jpg.index(b"Exif\0\0") + 6
    struct.pack_into("<I", jpg, i + 4, 1 << 30)
    with pytest.raises(ExifError):
        parse_exif(bytes(jpg))


def test_orientation_transforms_exact_and_invertible():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    # orientation 6 = rotated 90 CW: numpy rot90(k=-1) reference
    assert np.array_equal(apply_orientation(px, 8), np.rot90(px, 1))
    assert np.array_equal(apply_orientation(px, 6), np.rot90(px, -1))
    assert np.array_equal(apply_orientation(px, 3), np.rot90(px, 2))
    for o in range(1, 9):
        out = apply_orientation(px, o)
        if o >= 5:
            assert out.shape[:2] == (7, 5), o  # w/h swap states
        assert np.array_equal(apply_orientation(invert_orientation(px, o), o), px), o
    with pytest.raises(ExifError):
        apply_orientation(px, 0)


def test_fuzz_parse_typed_errors_only():
    random.seed(11)
    base = encode_jpeg_with_exif(
        16, 12, orientation=5, make="Fz", model="M",
        datetime="2020:01:01 00:00:00", pixel_x=16, pixel_y=12,
    )
    for _ in range(600):
        b = bytearray(base)
        for _k in range(random.randint(1, 3)):
            b[random.randrange(2, len(b))] ^= 1 << random.randrange(8)
        try:
            meta = parse_exif(bytes(b))
            assert 1 <= meta["orientation"] <= 8
        except (ExifError, ValueError):
            pass
    for cut in range(2, len(base), 5):
        try:
            parse_exif(base[:cut])
        except (ExifError, ValueError):
            pass
