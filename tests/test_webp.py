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


# ---------------------------------------------------------------------------
# Normal prefix codes + LZ77 (the r4 extension beyond the simple subset)
# ---------------------------------------------------------------------------

from map2db_spark.functions.webp_vp8l import (
    _limited_huffman_lengths,
    _prefix_decode_val,
    _prefix_encode,
    decode_vp8l,
    encode_vp8l,
)


def test_vp8l_normal_code_random_roundtrip_exact():
    rng = np.random.default_rng(11)
    for shape in ((16, 20, 3), (9, 7, 4), (1, 1, 3), (1, 50, 3), (37, 2, 4)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = decode_vp8l(encode_vp8l(img))
        if shape[2] == 4:
            assert np.array_equal(dec, img)
        else:
            assert np.array_equal(dec[:, :, :3], img)
            assert (dec[:, :, 3] == 255).all()


def test_vp8l_lz77_compresses_and_roundtrips():
    """Tiled content must round-trip exactly AND come out smaller with
    backrefs than literal-only — proof the references are emitted."""
    rng = np.random.default_rng(5)
    tile = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    img = np.tile(tile, (8, 10, 1))
    enc = encode_vp8l(img)
    assert np.array_equal(decode_vp8l(enc)[:, :, :3], img)
    assert len(enc) < len(encode_vp8l(img, use_lz77=False)) / 3


def test_vp8l_lz77_overlapping_copy():
    """dist < length (run-length via overlap) must copy pixel by
    pixel, exactly as the spec requires."""
    img = np.full((16, 16, 3), 200, dtype=np.uint8)
    img[0, 0] = (1, 2, 3)  # break the run start so a backref overlaps
    dec = decode_vp8l(encode_vp8l(img))
    assert np.array_equal(dec[:, :, :3], img)


def test_vp8l_gradient_many_symbols():
    """>2 distinct values per channel forces the NORMAL code path
    (simple-form encoder refuses this input)."""
    from map2db_spark.functions.webp import WebpError

    x = np.linspace(0, 255, 64).astype(np.uint8)
    img = np.stack([np.tile(x, (16, 1))] * 3, axis=-1)
    with pytest.raises(WebpError):
        encode_vp8l_simple(img)
    assert np.array_equal(decode_vp8l(encode_vp8l(img))[:, :, :3], img)


def test_vp8l_corruption_typed_errors_only():
    """Quarantine contract on normal-code streams: random bit flips
    raise WebpError/NotImplementedError or decode to a full-size
    array — never raw IndexError/KeyError/garbage shapes."""
    import random

    from map2db_spark.functions.webp import WebpError

    rng = np.random.default_rng(3)
    tile = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
    enc = encode_vp8l(np.tile(tile, (4, 4, 1)))
    random.seed(1)
    for _ in range(300):
        b = bytearray(enc)
        i = random.randrange(20, len(b))
        b[i] ^= 1 << random.randrange(8)
        try:
            out = decode_vp8l(bytes(b))
            assert out.shape[2] == 4
        except (WebpError, NotImplementedError):
            pass
    for cut in range(1, len(enc) - 1):
        try:
            decode_vp8l(enc[:cut])
        except (WebpError, NotImplementedError):
            pass


def test_vp8l_package_merge_properties():
    """Limited-length Huffman: Kraft-complete, within the limit, and
    optimal-order (more frequent symbol never gets a longer code than
    a rarer one when both fit the limit... monotone by frequency)."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(2, 60))
        freqs = {s: int(rng.integers(1, 1000)) for s in range(n)}
        lengths = _limited_huffman_lengths(freqs, 15)
        assert max(lengths.values()) <= 15
        assert sum(2 ** -l for l in lengths.values()) == 1.0  # complete
    # degenerate: huge alphabet at a tight limit still fits
    lengths = _limited_huffman_lengths({s: 1 for s in range(128)}, 7)
    assert set(lengths.values()) == {7}


def test_vp8l_length_distance_prefix_codec_inverse():
    """_prefix_encode/_prefix_decode_val are exact inverses over the
    whole LZ77 range."""

    class _FakeReader:
        def __init__(self, v):
            self.v = v

        def read(self, n):
            return self.v & ((1 << n) - 1)

    for n in list(range(0, 300)) + [4095, 4096, 100_000]:
        idx, eb, extra = _prefix_encode(n)
        assert 0 <= extra < (1 << eb) if eb else extra == 0
        assert _prefix_decode_val(idx, _FakeReader(extra)) == n + 1


def test_vp8l_color_cache_roundtrip_and_compresses():
    """Color cache (green symbols >= 280): palette-heavy content
    round-trips exactly with every legal cache size, compresses vs
    literal-only, and the cache refreshes on literal, copied AND
    cache-referenced pixels (the round-trip would break otherwise)."""
    rng = np.random.default_rng(9)
    palette = rng.integers(0, 256, (12, 3), dtype=np.uint8)
    img = palette[rng.integers(0, 12, (24, 31))]
    base = len(encode_vp8l(img, use_lz77=False))
    for cb in (1, 4, 8, 11):
        enc = encode_vp8l(img, cache_bits=cb)
        assert np.array_equal(decode_vp8l(enc)[:, :, :3], img), cb
    cached = encode_vp8l(img, use_lz77=False, cache_bits=6)
    assert np.array_equal(decode_vp8l(cached)[:, :, :3], img)
    assert len(cached) < base / 2
    # random RGBA content with the cache on still round-trips
    img2 = rng.integers(0, 256, (10, 13, 4), dtype=np.uint8)
    assert np.array_equal(decode_vp8l(encode_vp8l(img2, cache_bits=5)), img2)


def test_vp8l_cache_bits_validation():
    from map2db_spark.functions.webp import WebpError

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    with pytest.raises(WebpError):
        encode_vp8l(img, cache_bits=12)
    with pytest.raises(WebpError):
        encode_vp8l(img, cache_bits=-1)


def test_vp8l_subtract_green_transform():
    """Subtract-green (transform type 2): gray-correlated content
    compresses measurably and round-trips exactly, alone and stacked
    with LZ77 + color cache; predictor/color/palette transforms still
    raise NotImplementedError."""
    rng = np.random.default_rng(21)
    g = rng.integers(40, 200, (20, 25), dtype=np.uint8)
    img = np.stack(
        [
            (g.astype(np.int16) + rng.integers(-3, 4, g.shape)) % 256,
            g,
            (g.astype(np.int16) - rng.integers(-3, 4, g.shape)) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    sg = encode_vp8l(img, subtract_green=True)
    assert np.array_equal(decode_vp8l(sg)[:, :, :3], img)
    assert len(sg) < len(encode_vp8l(img))
    img2 = rng.integers(0, 256, (9, 14, 4), dtype=np.uint8)
    enc = encode_vp8l(img2, cache_bits=4, subtract_green=True)
    assert np.array_equal(decode_vp8l(enc), img2)


def test_vp8l_meta_prefix_images():
    """Meta prefix images (multiple code groups): per-block-column
    groups round-trip exactly across shapes and compose with LZ77 +
    color cache + subtract-green; on content whose statistics differ
    by region the grouped streams beat the single-group encoding."""
    rng = np.random.default_rng(123)
    for (h, w) in [(8, 16), (17, 33), (4, 4), (5, 70)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for mb in (2, 3, 5):
            enc = encode_vp8l(img, cache_bits=4, subtract_green=True,
                              meta_bits=mb)
            assert np.array_equal(decode_vp8l(enc)[:, :, :3], img), (h, w, mb)
    img = np.zeros((16, 64, 3), dtype=np.uint8)
    img[:, :32] = rng.integers(0, 8, (16, 32, 3), dtype=np.uint8)
    img[:, 32:] = rng.integers(0, 256, (16, 32, 3), dtype=np.uint8)
    meta = encode_vp8l(img, use_lz77=False, meta_bits=5)
    assert np.array_equal(decode_vp8l(meta)[:, :, :3], img)
    assert len(meta) < len(encode_vp8l(img, use_lz77=False))


def test_vp8l_meta_prefix_corruption_typed_errors_only():
    import random

    from map2db_spark.functions.webp import WebpError

    rng = np.random.default_rng(9)
    enc = encode_vp8l(
        rng.integers(0, 256, (9, 40, 3), dtype=np.uint8), meta_bits=3
    )
    pyr = random.Random(2)
    for _ in range(400):
        e = bytearray(enc)
        i = pyr.randrange(20, len(e))
        e[i] ^= 1 << pyr.randrange(8)
        try:
            out = decode_vp8l(bytes(e))
            assert out.shape[2] == 4
        except (WebpError, NotImplementedError):
            pass
    for cut in range(1, len(enc) - 1):
        try:
            decode_vp8l(enc[:cut])
        except (WebpError, NotImplementedError):
            pass


def test_vp8l_predictor_transform():
    """Predictor transform (type 0): 14 spatial predictors chosen per
    block, mode map carried as a recursive VP8L image.  Smooth
    gradients must compress hard (>3x vs no transform) and everything
    round-trips exactly, alone and stacked with subtract-green +
    color cache + LZ77, including 1x1 and non-block-aligned shapes."""
    rng = np.random.default_rng(55)
    yy, xx = np.mgrid[0:24, 0:40]
    img = np.stack(
        [(xx * 3 + yy * 2) % 256, (xx * 2 + yy * 5 + 40) % 256,
         (xx + yy) % 256],
        axis=-1,
    ).astype(np.uint8)
    pred = encode_vp8l(img, use_lz77=False, predict_bits=4)
    assert np.array_equal(decode_vp8l(pred)[:, :, :3], img)
    assert len(pred) * 3 < len(encode_vp8l(img, use_lz77=False))
    for (h, w) in [(1, 1), (3, 17), (16, 16), (9, 33)]:
        im = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        for pb in (2, 5):
            enc = encode_vp8l(im, cache_bits=4, subtract_green=True,
                              predict_bits=pb)
            assert np.array_equal(decode_vp8l(enc), im), (h, w, pb)


def test_vp8l_predictor_corruption_typed_errors_only():
    import random

    from map2db_spark.functions.webp import WebpError

    rng = np.random.default_rng(8)
    img = (np.cumsum(rng.integers(-6, 7, (12, 20, 3)), axis=1) % 256).astype(
        np.uint8
    )
    enc = encode_vp8l(img, predict_bits=3, subtract_green=True)
    pyr = random.Random(4)
    for _ in range(400):
        e = bytearray(enc)
        i = pyr.randrange(20, len(e))
        e[i] ^= 1 << pyr.randrange(8)
        try:
            out = decode_vp8l(bytes(e))
            assert out.shape[2] == 4
        except (WebpError, NotImplementedError):
            pass
    for cut in range(1, len(enc) - 1):
        try:
            decode_vp8l(enc[:cut])
        except (WebpError, NotImplementedError):
            pass


def test_vp8l_palette_transform():
    """Color-indexing transform (type 3): delta-coded palette rides a
    recursive VP8L image, small palettes bundle 2/4/8 indices per
    packed green byte.  Round-trips exactly at every palette size and
    bundle-width edge, beats non-palette coding, and refuses > 256
    colors with a typed error."""
    from map2db_spark.functions.webp import WebpError

    rng = np.random.default_rng(66)
    for n_colors in (2, 4, 9, 16, 17, 256):
        pal = rng.integers(0, 256, (n_colors, 4), dtype=np.uint8)
        pal[:, 3] = 255
        pal = np.unique(pal, axis=0)
        img = pal[rng.integers(0, len(pal), (13, 29))]
        enc = encode_vp8l(img, palette=True)
        assert np.array_equal(decode_vp8l(enc), img), n_colors
        assert len(enc) < len(encode_vp8l(img)), n_colors
    for w in (1, 7, 8, 9, 17):  # bundle-width edges at 8 indices/byte
        img = (rng.integers(0, 2, (5, w, 3)) * 255).astype(np.uint8)
        assert np.array_equal(
            decode_vp8l(encode_vp8l(img, palette=True))[:, :, :3], img
        ), w
    with pytest.raises(WebpError):
        encode_vp8l(rng.integers(0, 256, (30, 30, 3), dtype=np.uint8),
                    palette=True)


def test_vp8l_palette_corruption_typed_errors_only():
    import random

    from map2db_spark.functions.webp import WebpError

    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, (10, 3), dtype=np.uint8)
    enc = encode_vp8l(pal[rng.integers(0, 10, (11, 23))], palette=True)
    pyr = random.Random(6)
    for _ in range(400):
        e = bytearray(enc)
        i = pyr.randrange(20, len(e))
        e[i] ^= 1 << pyr.randrange(8)
        try:
            out = decode_vp8l(bytes(e))
            assert out.shape[2] == 4
        except (WebpError, NotImplementedError):
            pass
    for cut in range(1, len(enc) - 1):
        try:
            decode_vp8l(enc[:cut])
        except (WebpError, NotImplementedError):
            pass


def test_vp8l_color_transform():
    """Cross-channel color transform (type 1): per-block signed 3.5
    fixed-point g2r/g2b/r2b multipliers, cte map carried as a recursive
    VP8L image.  Channel-correlated images must round-trip exactly at
    every color_bits 2..5 (including non-block-aligned shapes), the
    encoder must actually pick non-zero multipliers for correlated
    content, and stacking with subtract-green + predictor + cache +
    LZ77 must round-trip too."""
    from map2db_spark.functions.webp_vp8l import _apply_color_transform

    rng = np.random.default_rng(77)
    # strongly green-correlated channels: the per-block search must
    # find non-zero multipliers (g2r=1.0 zeroes most of the red
    # residual; all-zero ctes would leave the full g+x residual)
    yy, xx = np.mgrid[0:13, 0:21]
    g = ((5 * xx + yy) % 100).astype(np.uint8)
    img = np.stack([(g + xx) % 256, g, (2 * g.astype(int) - yy) % 256],
                   axis=-1).astype(np.uint8)
    for bits in (2, 3, 4, 5):
        enc = encode_vp8l(img, color_bits=bits)
        assert np.array_equal(decode_vp8l(enc)[:, :, :3], img), bits
    rgba = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
    _, ctes = _apply_color_transform(rgba, 2)
    assert ctes.any(), "correlated content must engage the multipliers"
    # random + odd shapes, alone and stacked with every other transform
    for (h, w) in [(1, 1), (3, 17), (16, 16), (9, 33)]:
        im = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        for cb in (2, 5):
            enc = encode_vp8l(im, color_bits=cb)
            assert np.array_equal(decode_vp8l(enc), im), (h, w, cb)
            enc2 = encode_vp8l(im, color_bits=cb, subtract_green=True,
                               predict_bits=3, cache_bits=4)
            assert np.array_equal(decode_vp8l(enc2), im), (h, w, cb)
    with pytest.raises(WebpError):
        encode_vp8l(img, color_bits=1)
    with pytest.raises(WebpError):
        encode_vp8l(img, color_bits=6)


def test_vp8l_color_transform_fixed_point_semantics():
    """The spec delta is (int8(t) * int8(c)) >> 5 with an ARITHMETIC
    (floor) shift — both operands reinterpreted as signed bytes.  Pin
    the kernel against a scalar reference on the full sign grid."""
    from map2db_spark.functions.webp_vp8l import _ct_delta

    def ref(t, c):
        ts = t - 256 if t >= 128 else t
        cs = c - 256 if c >= 128 else c
        return (ts * cs) >> 5  # python >> on ints floors

    for t in (0, 1, 16, 32, 48, 127, 128, 208, 224, 240, 255):
        for c in range(0, 256, 7):
            assert int(_ct_delta(t, c)) == ref(t, c), (t, c)


def test_vp8l_color_transform_corruption_typed_errors_only():
    import random

    from map2db_spark.functions.webp import WebpError

    rng = np.random.default_rng(21)
    g = (np.cumsum(rng.integers(-5, 6, (11, 19)), axis=1) % 128).astype(
        np.uint8
    )
    img = np.stack([(g + 7) % 256, g, (2 * g.astype(int)) % 256], axis=-1
                   ).astype(np.uint8)
    enc = encode_vp8l(img, color_bits=3)
    pyr = random.Random(9)
    for _ in range(400):
        e = bytearray(enc)
        i = pyr.randrange(20, len(e))
        e[i] ^= 1 << pyr.randrange(8)
        try:
            out = decode_vp8l(bytes(e))
            assert out.shape[2] == 4
        except (WebpError, NotImplementedError):
            pass
    for cut in range(1, len(enc) - 1):
        try:
            decode_vp8l(enc[:cut])
        except (WebpError, NotImplementedError):
            pass


def test_vp8l_lz77_distance_cap_and_symbol_guard():
    """The 40-symbol distance alphabet carries direct distances up to
    2^20 - 120 only: the matcher must skip farther candidates (a
    farther match would silently fall out of the stored code while the
    token pass still emits its word -> undecodable stream), and
    _store_code must refuse out-of-alphabet symbols loudly."""
    from map2db_spark.functions.webp_vp8l import (
        _DIST_ALPHABET,
        _MAX_LZ_DIST,
        _BitWriter,
        _greedy_lz77,
        _prefix_encode,
        _store_code,
    )

    assert _prefix_encode(_MAX_LZ_DIST + 120 - 1)[0] == _DIST_ALPHABET - 1
    assert _prefix_encode(_MAX_LZ_DIST + 120)[0] == _DIST_ALPHABET

    # a 3-pixel repeat exactly one past the cap must NOT become a ref
    n = _MAX_LZ_DIST + 4
    pix = np.arange(n, dtype=np.uint32) % 0xFFFFFF00 + 1
    pix[-3:] = pix[0:3]
    toks = _greedy_lz77(pix, width=n)
    refs = [t for t in toks if t[0] == "ref"]
    assert all(t[2] <= _MAX_LZ_DIST for t in refs)
    far = [t for t in refs if t[3] >= n - 3]
    assert not far, "match beyond the direct-distance cap must be skipped"

    with pytest.raises(WebpError):
        _store_code(_BitWriter(), {0: 3, _DIST_ALPHABET: 5}, _DIST_ALPHABET)
