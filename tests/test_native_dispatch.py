"""Native-first image-decode dispatch (VERDICT r6 #1): the production
slot routes every payload to the real system codec via ctypes, keeps
the from-scratch codecs as fallback + typed-error authority, and can
cross-check every Nth native decode against the from-scratch result.

These tests pin the dispatch CONTRACT; bit-parity of the decoders
themselves is pinned in tests/test_libpng_parity.py,
test_libwebp_parity.py, test_tiff.py, test_gif.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from map2db_spark.functions import giflib_oracle as LG
from map2db_spark.functions import libpng_oracle as LP
from map2db_spark.functions import libtiff_oracle as LT
from map2db_spark.functions import libwebp_oracle as LW
from map2db_spark.functions import multimodal as M
from map2db_spark.functions.gif_codec import encode_gif
from map2db_spark.functions.png import encode_png
from map2db_spark.functions.tiff_codec import encode_tiff
from map2db_spark.functions.webp_vp8l import encode_vp8l

_ALL_NATIVE = (
    LP.available() and LW.available() and LT.available() and LG.available()
)
needs_native = pytest.mark.skipif(
    not _ALL_NATIVE, reason="system codec libraries missing"
)

RNG = np.random.default_rng(7)
PNG_PX = RNG.integers(0, 256, (9, 13, 3), dtype=np.uint8)
WEBP_PX = RNG.integers(0, 256, (8, 11, 4), dtype=np.uint8)
TIFF_PX = RNG.integers(0, 256, (7, 10), dtype=np.uint8)
GIF_PAL = np.arange(48, dtype=np.uint8).reshape(16, 3)
GIF_IDX = RNG.integers(0, 16, (6, 9), dtype=np.uint8)


@needs_native
def test_native_path_used_and_equal_for_lossless_formats():
    cases = [
        ("png", encode_png(PNG_PX), PNG_PX),
        ("webp", encode_vp8l(WEBP_PX), WEBP_PX),
        ("tiff", encode_tiff(TIFF_PX, compression="lzw"), TIFF_PX),
        ("gif", encode_gif(GIF_IDX, GIF_PAL), GIF_PAL[GIF_IDX]),
    ]
    for fmt, payload, expected in cases:
        px, info = M.decode_image_with_info(payload)
        assert info == {"fmt": fmt, "path": "native", "checked": False}, fmt
        assert np.array_equal(px, expected), fmt
        # pure path produces the same pixels for lossless formats
        pure, pinfo = M.decode_image_with_info(payload, prefer_native=False)
        assert pinfo["path"] == "pure"
        assert np.array_equal(pure, px), fmt


def test_jpeg_takes_the_native_path_with_coefficient_cross_check():
    """r8: JPEG routes native through the libjpeg shim; the sampled
    cross-check compares quantized DCT coefficients (the T.81
    guaranteed-equal surface), not pixels."""
    from map2db_spark.functions import libjpeg_oracle as LJ
    from map2db_spark.functions.jpeg_codec import encode_jpeg_baseline

    jpg = encode_jpeg_baseline(np.full((8, 8), 55, dtype=np.uint8))
    if not LJ.available():
        px, info = M.decode_image_with_info(jpg)
        assert info["fmt"] == "jpeg" and info["path"] == "pure"
        assert (px == 55).all()
        return
    px, info = M.decode_image_with_info(jpg, cross_check_every=1)
    assert info == {"fmt": "jpeg", "path": "native", "checked": True}
    assert (px == 55).all()
    # a color stream cross-checks at the coefficient level even though
    # pixel outputs legitimately diverge (upsampler/color conversion)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    stream = LJ.encode(img, quality=80, progressive=True)
    px2, info2 = M.decode_image_with_info(stream, cross_check_every=1)
    assert info2 == {"fmt": "jpeg", "path": "native", "checked": True}
    assert px2.shape == img.shape
    assert np.array_equal(px2, LJ.decode(stream))


@needs_native
def test_cross_check_every_n_and_divergence_detection(monkeypatch):
    payload = encode_png(PNG_PX)
    # every decode checked
    _, info = M.decode_image_with_info(payload, cross_check_every=1)
    assert info["checked"] is True
    # sampling: exactly one of three consecutive decodes is checked
    M._decode_counter = 0
    checked = [
        M.decode_image_with_info(payload, cross_check_every=3)[1]["checked"]
        for _ in range(3)
    ]
    assert checked.count(True) == 1
    # an injected pure-side divergence is DETECTED, not averaged away
    real_pure = M._decode_pure

    def bad_pure(buf, fmt, max_pixels=1 << 24):
        out = real_pure(buf, fmt, max_pixels=max_pixels).copy()
        out.flat[0] ^= 1
        return out

    monkeypatch.setattr(M, "_decode_pure", bad_pure)
    with pytest.raises(AssertionError, match="cross-check failed"):
        M.decode_image_with_info(payload, cross_check_every=1)


@needs_native
def test_lossy_webp_native_rgba_with_plane_level_cross_check():
    img = np.full((16, 16, 4), 90, dtype=np.uint8)
    data = LW.encode_rgba(np.ascontiguousarray(img), quality=80.0)
    px, info = M.decode_image_with_info(data, cross_check_every=1)
    assert info == {"fmt": "webp", "path": "native", "checked": True}
    assert px.shape == (16, 16, 4)
    # native product IS libwebp's own RGBA (fancy upsampler and all)
    assert np.array_equal(px, LW.decode_rgba(data))


@needs_native
def test_native_failure_falls_back_to_typed_errors():
    # corrupt PNG: truncated IDAT -> native rejects -> pure re-decode
    # raises the family ValueError, never a bare ctypes status
    payload = bytearray(encode_png(PNG_PX))[:40]
    with pytest.raises(ValueError):
        M.decode_image_real(bytes(payload))
    with pytest.raises(NotImplementedError, match="unknown image format"):
        M.decode_image_real(b"\x00\x01\x02\x03\x04\x05\x06\x07")


def test_dispatch_layer_bomb_rail_blocks_before_any_decode():
    """The native libraries have no uniform output cap, so the
    dispatch reads declared dims from HEADER BYTES ONLY and rejects
    bombs before either path allocates: a tiny payload declaring a
    huge frame raises the typed rail error for every format."""
    import struct

    big = 60000
    # PNG: signature + IHDR declaring 60000x60000
    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">IIBBBBB", big, big, 8, 2, 0, 0, 0) + b"\0" * 8)
    # GIF: screen descriptor 60000x60000
    gif = b"GIF89a" + struct.pack("<HH", big, big) + b"\x00\x00\x00\x3b"
    # TIFF: little-endian IFD with LONG dims
    tif = (b"II\x2a\x00" + struct.pack("<I", 8) + struct.pack("<H", 2)
           + struct.pack("<HHII", 256, 4, 1, big)
           + struct.pack("<HHII", 257, 4, 1, big)
           + struct.pack("<I", 0))
    for fmt, payload in [("png", png), ("gif", gif), ("tiff", tif)]:
        with pytest.raises(ValueError, match="max_pixels"):
            M.decode_image_with_info(payload)
        # trusted-input override reaches the real decoder (which then
        # fails on the truncated body, loudly and typed)
        with pytest.raises((ValueError, NotImplementedError)):
            M.decode_image_with_info(payload, max_pixels=big * big + 1)


@needs_native
def test_giflib_cumulative_frame_rail():
    """An unbounded frame run over a small screen is capped by the
    native wrapper's frames x screen charge (the screen descriptor
    alone can't see it), mirroring decode_gif's cumulative rail."""
    img = np.zeros((64, 64), dtype=np.uint8)
    payload = encode_gif([img] * 3, GIF_PAL)
    frames, _ = LG.decode(payload)  # 3 x 4096 px: fine
    assert len(frames) == 3
    with pytest.raises(ValueError, match="max_pixels"):
        LG.decode(payload, max_pixels=2 * 64 * 64)


def test_per_codec_rails_complete_the_family():
    """r7 completes the per-codec rail convention: PNG (IHDR dims +
    capped inflate), JPEG (SOF dims), VP8L (14-bit dims) each reject
    declared bombs with their typed error — direct codec callers are
    protected even when they bypass the dispatch layer."""
    import struct

    from map2db_spark.functions.jpeg import JpegError
    from map2db_spark.functions.jpeg_codec import decode_jpeg_baseline
    from map2db_spark.functions.png import decode_png
    from map2db_spark.functions.webp import WebpError
    from map2db_spark.functions.webp_vp8l import decode_vp8l

    # PNG declaring 60000x60000 RGB
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    import zlib as _z

    png = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", 13) + b"IHDR" + ihdr
           + struct.pack(">I", _z.crc32(b"IHDR" + ihdr)))
    with pytest.raises(ValueError, match="max_pixels"):
        decode_png(png)

    # JPEG shell declaring 60000x60000x3 (SOI + SOF0)
    jpg = (b"\xff\xd8\xff\xc0" + struct.pack(">H", 8 + 9)
           + struct.pack(">BHHB", 8, 60000, 60000, 3)
           + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00")
    with pytest.raises(JpegError, match="max_pixels"):
        decode_jpeg_baseline(jpg)

    # VP8L declaring 16384x16384 (14-bit max dims)
    bits = 0x2F.to_bytes(1, "little")
    # width-1 = 16383 (14 bits all 1), height-1 = 16383
    body = bits + bytes([0xFF, 0xFF, 0xFF, 0x0F])
    vp8l = (b"RIFF" + struct.pack("<I", 12 + 8 + len(body)) + b"WEBP"
            + b"VP8L" + struct.pack("<I", len(body)) + body)
    with pytest.raises(WebpError, match="max_pixels"):
        decode_vp8l(vp8l)

    # a zlib bomb inside a small-dims PNG inflates at most
    # declared-size+1 bytes and dies on the length check
    ihdr2 = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = _z.compress(b"\x00" * 10_000_000)
    png2 = (b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR" + ihdr2
            + struct.pack(">I", _z.crc32(b"IHDR" + ihdr2))
            + struct.pack(">I", len(bomb)) + b"IDAT" + bomb
            + struct.pack(">I", _z.crc32(b"IDAT" + bomb))
            + struct.pack(">I", 0) + b"IEND"
            + struct.pack(">I", _z.crc32(b"IEND")))
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(png2)


@needs_native
def test_native_fallback_records_error_reason(monkeypatch):
    """ADVICE r7: when the native decode fails and the pure path
    rescues the payload, the swallowed native error must travel in
    the info dict (info['native_error']) so ingest kernels can
    aggregate fallback reasons — and a NON-codec exception (a bug)
    must propagate, not silently degrade the whole ingest to pure."""
    payload = encode_png(PNG_PX)

    def native_rejects(buf, fmt, max_pixels=1 << 24):
        raise ValueError("synthetic native rejection")

    monkeypatch.setattr(M, "_decode_native", native_rejects)
    px, info = M.decode_image_with_info(payload)
    assert info["path"] == "pure"
    assert "synthetic native rejection" in info["native_error"]
    assert np.array_equal(px, PNG_PX)

    def native_buggy(buf, fmt, max_pixels=1 << 24):
        raise TypeError("systemic fault, must propagate")

    monkeypatch.setattr(M, "_decode_native", native_buggy)
    with pytest.raises(TypeError, match="systemic fault"):
        M.decode_image_with_info(payload)


@needs_native
def test_jpeg_cross_check_out_of_envelope_is_unchecked_not_fatal(monkeypatch):
    """A JPEG the native library decodes but the pure codec cannot
    even coefficient-parse (arithmetic-coded / 12-bit / non-integer
    sampling ratios raise NotImplementedError) must come back as
    checked=False, not crash the sampled row — the stream has no
    comparable surface."""
    import map2db_spark.functions.jpeg_codec as J
    from map2db_spark.functions.jpeg_codec import encode_jpeg_baseline

    jpg = encode_jpeg_baseline(np.full((8, 8), 55, dtype=np.uint8))

    def out_of_envelope(buf, max_pixels=1 << 24):
        raise NotImplementedError("arithmetic JPEG not supported")

    monkeypatch.setattr(J, "decode_jpeg_coefficients", out_of_envelope)
    px, info = M.decode_image_with_info(jpg, cross_check_every=1)
    assert info == {"fmt": "jpeg", "path": "native", "checked": False}
    assert (px == 55).all()


def test_cross_check_inherits_caller_max_pixels(monkeypatch):
    """ADVICE r8 (low): decode_image_with_info(max_pixels=<raised>,
    cross_check_every=N) on a trusted large JPEG must thread the
    caller's rail into BOTH coefficient readers — with the readers'
    default 1<<24 rail a legitimately admitted payload would raise
    the bomb-rail error on every sampled row instead of returning
    checked.  Spied rather than exercised with a real >16M-pixel
    stream (which would dominate the suite's runtime)."""
    import map2db_spark.functions.jpeg_codec as J
    import map2db_spark.functions.libjpeg_oracle as LJ
    from map2db_spark.functions.jpeg_codec import encode_jpeg_baseline

    if not LJ.available():
        pytest.skip("no libjpeg shim")
    jpg = encode_jpeg_baseline(np.full((8, 8), 55, dtype=np.uint8))
    seen: dict[str, int] = {}
    real_pure_coefs = J.decode_jpeg_coefficients
    real_native_coefs = LJ.read_coefficients

    def spy_pure(buf, max_pixels=1 << 24):
        seen["pure"] = max_pixels
        return real_pure_coefs(buf, max_pixels=max_pixels)

    def spy_native(buf, max_pixels=1 << 24):
        seen["native"] = max_pixels
        return real_native_coefs(buf, max_pixels=max_pixels)

    monkeypatch.setattr(J, "decode_jpeg_coefficients", spy_pure)
    monkeypatch.setattr(LJ, "read_coefficients", spy_native)
    raised = 1 << 30
    _, info = M.decode_image_with_info(
        jpg, cross_check_every=1, max_pixels=raised
    )
    assert info["checked"] is True
    assert seen == {"pure": raised, "native": raised}
