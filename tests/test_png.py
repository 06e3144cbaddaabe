"""Stdlib PNG codec tests (functions/png.py): the real decode slot
behind the multimodal media column (VERDICT r1 item 10)."""

from __future__ import annotations

import numpy as np
import pytest

from map2db_spark.functions.multimodal import decode_image_real
from map2db_spark.functions.png import decode_png, encode_png


def test_roundtrip_rgb_rgba_gray():
    rng = np.random.RandomState(7)
    for shape in [(6, 4, 3), (9, 5, 4), (3, 3), (1, 1, 3), (17, 13, 3)]:
        px = rng.randint(0, 256, size=shape, dtype="uint8")
        out = decode_png(encode_png(px))
        exp = px if px.ndim == 3 else px[:, :, None]
        assert (out == exp).all(), shape


def test_all_filter_types_exercised():
    # >= 5 rows means the encoder emits filter types 0..4; a gradient
    # makes sub/up/average/paeth all produce distinct filtered bytes
    g = (np.arange(7 * 8 * 3, dtype=np.int64) * 37 % 256).astype("uint8")
    g = g.reshape(7, 8, 3)
    assert (decode_png(encode_png(g)) == g).all()


def test_non_png_rejected():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a....")


def test_corrupt_crc_rejected():
    buf = bytearray(encode_png(np.zeros((4, 4, 3), dtype="uint8")))
    buf[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError):
        decode_png(bytes(buf))


def test_decode_image_real_dispatches_png():
    px = np.full((2, 2, 3), 9, dtype="uint8")
    assert (decode_image_real(encode_png(px)) == px).all()
    # JPEG magic now routes to the REAL baseline codec (r3): a valid
    # stream decodes, a malformed one raises a loud JpegError
    from map2db_spark.functions.jpeg import JpegError
    from map2db_spark.functions.jpeg_codec import encode_jpeg_baseline

    jpg_px = np.full((8, 8), 55, dtype="uint8")
    assert (decode_image_real(encode_jpeg_baseline(jpg_px)) == jpg_px).all()
    with pytest.raises(JpegError):
        decode_image_real(b"\xff\xd8\xff\xe0\x00\x04xxfake jpeg")
    # lossy WebP is REAL as of r6 (functions/vp8_decode.py): a
    # committed libwebp-encoded fixture decodes through the full
    # boolean-arithmetic reconstruction; a truncated VP8 chunk raises
    # the typed WebpError, not a silent stub
    import base64
    import struct

    from map2db_spark.functions.vp8_fixtures import FIXTURES
    from map2db_spark.functions.webp import WebpError

    fx = FIXTURES[0]
    rgba = decode_image_real(base64.b64decode(fx["b64"]))
    assert rgba.shape == (fx["h"], fx["w"], 4)
    assert (rgba[:, :, 3] == 255).all()
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(WebpError):
        decode_image_real(lossy)
    from map2db_spark.functions.webp_vp8l import encode_vp8l_simple

    webp_px = np.full((3, 4, 3), 31, dtype="uint8")
    decoded = decode_image_real(encode_vp8l_simple(webp_px))
    assert (decoded[:, :, :3] == webp_px).all()


def test_png_fuzz_corruption_typed_errors_only():
    """r4 fuzz distillation (found a real hole): bit flips and
    truncation of a valid PNG must raise ValueError or decode — the
    original campaign surfaced raw zlib.error (truncated IDAT) and
    struct.error escapes, now wrapped."""
    import random

    import numpy as np

    from map2db_spark.functions.png import decode_png, encode_png

    pyr = random.Random(5)
    rng = np.random.default_rng(5)
    enc = encode_png(rng.integers(0, 256, (12, 9, 3), dtype=np.uint8))
    for _ in range(800):
        e = bytearray(enc)
        if pyr.random() < 0.5:
            for _k in range(pyr.randint(1, 3)):
                i = pyr.randrange(0, len(e))
                e[i] ^= 1 << pyr.randrange(8)
            data = bytes(e)
        else:
            data = bytes(e[: pyr.randrange(1, len(e))])
        try:
            out = decode_png(data)
            assert out.ndim == 3
        except ValueError:
            pass


def test_png_truncated_zlib_trailer_rejected():
    """ADVICE r7: a zlib stream cut right after the last raster byte
    (Z_STREAM_END / adler trailer missing) must still be rejected —
    the capped decompressobj call alone would decode it silently."""
    import struct
    import zlib

    import numpy as np

    from map2db_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    enc = encode_png(px)
    # rebuild the stream with the IDAT body truncated to the byte
    # count that still inflates to the full raster (strip the 4-byte
    # adler trailer and the stream-end marker bytes)
    pos, out, raster = 8, bytearray(enc[:8]), None
    while pos < len(enc):
        (length,) = struct.unpack_from(">I", enc, pos)
        tag = enc[pos + 4:pos + 8]
        body = enc[pos + 8:pos + 8 + length]
        if tag == b"IDAT":
            full = zlib.decompress(body)
            cut = body[:-4]  # strip exactly the adler32 trailer
            # the cut stream still yields every raster byte
            d = zlib.decompressobj()
            assert d.decompress(cut) == full and not d.eof
            body = cut
            out += struct.pack(">I", len(body)) + tag + body
            out += struct.pack(">I", zlib.crc32(tag + body))
        else:
            out += enc[pos:pos + 12 + length]
        pos += 12 + length
    import pytest

    with pytest.raises(ValueError, match="truncated|incomplete"):
        decode_png(bytes(out))
