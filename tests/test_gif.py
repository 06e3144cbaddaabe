"""From-scratch GIF codec: LZW (GIF flavor) round-trips, interlacing,
animations, typed-error fuzz campaigns, and EXTERNAL pixel parity in
both directions against the system giflib 5.2."""

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions import giflib_oracle as G
from map2db_spark.functions.gif_codec import (
    _lzw_compress,
    _lzw_decompress,
    decode_gif,
    encode_gif,
)

RNG = np.random.default_rng(5)
PAL16 = RNG.integers(0, 256, (16, 3), dtype=np.uint8)
PAL256 = RNG.integers(0, 256, (256, 3), dtype=np.uint8)


def test_lzw_roundtrip_matrix():
    for mcs in (2, 3, 5, 8):
        for n in (0, 1, 10, 5000):
            data = bytes(
                int(v) % (1 << mcs)
                for v in RNG.integers(0, 256, n, dtype=np.uint8))
            assert _lzw_decompress(_lzw_compress(data, mcs), mcs) == data


def test_lzw_table_full_clear():
    """Pixels chosen to exhaust the 4096-entry table force the
    encoder's mid-stream Clear; the decoder must follow."""
    data = bytes(RNG.integers(0, 256, 30000, dtype=np.uint8))
    assert _lzw_decompress(_lzw_compress(data, 8), 8) == data


@pytest.mark.parametrize("interlace", [False, True])
def test_single_frame_roundtrip(interlace):
    img = RNG.integers(0, 16, (23, 31), dtype=np.uint8)
    g = encode_gif(img, PAL16, interlace=interlace)
    frames, pal, meta = decode_gif(g)
    assert np.array_equal(frames[0], img)
    assert np.array_equal(pal[:16], PAL16)
    assert meta["interlaced"] == interlace
    assert meta["version"] == "87a"


def test_animation_roundtrip_with_gce():
    frames_in = [RNG.integers(0, 16, (9, 12), dtype=np.uint8)
                 for _ in range(4)]
    g = encode_gif(frames_in, PAL16, delays_cs=[10, 20, 30, 40],
                   transparent_index=3)
    fr, _, meta = decode_gif(g)
    assert len(fr) == 4
    assert all(np.array_equal(a, b) for a, b in zip(fr, frames_in))
    assert meta["delays_cs"] == [10, 20, 30, 40]
    assert meta["transparent_index"] == 3
    assert meta["version"] == "89a"


def test_256_color_full_table():
    img = RNG.integers(0, 256, (80, 90), dtype=np.uint8)
    g = encode_gif(img, PAL256)
    fr, _, _ = decode_gif(g)
    assert np.array_equal(fr[0], img)


def test_lzw_actually_compresses():
    img = np.tile(np.arange(8, dtype=np.uint8), (64, 32))
    g = encode_gif(img, PAL16)
    assert len(g) < img.size // 4  # periodic rows crush under LZW


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 25), st.integers(1, 25), st.integers(0, 2 ** 31 - 1),
       st.booleans())
def test_hypothesis_roundtrip(h, w, seed, interlace):
    rng = np.random.default_rng(seed)
    nc = int(rng.integers(2, 257))
    pal = rng.integers(0, 256, (nc, 3), dtype=np.uint8)
    img = rng.integers(0, nc, (h, w), dtype=np.uint8)
    g = encode_gif(img, pal, interlace=interlace)
    fr, _, _ = decode_gif(g)
    assert np.array_equal(fr[0], img)


def test_fuzz_bitflip_truncation_typed_errors():
    """Corrupt GIFs raise ValueError (or decode) — never IndexError /
    struct.error / MemoryError."""
    rng = random.Random(42)
    img = np.frombuffer(random.Random(1).randbytes(23 * 31),
                        dtype=np.uint8).reshape(23, 31) % 16
    base = encode_gif(img.astype(np.uint8), PAL16)
    for trial in range(3000):
        buf = bytearray(base)
        k = rng.randrange(3)
        if k == 0:
            i = rng.randrange(len(buf))
            buf[i] ^= 1 << rng.randrange(8)
        elif k == 1:
            buf = buf[:rng.randrange(len(buf))]
        else:
            for _ in range(rng.randrange(1, 6)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
        try:
            decode_gif(bytes(buf))
        except ValueError:
            pass


def test_malformed_typed():
    with pytest.raises(ValueError, match="magic"):
        decode_gif(b"JIF87a" + b"\x00" * 20)
    with pytest.raises(ValueError, match="palette too large"):
        encode_gif(np.zeros((2, 2), np.uint8),
                   np.zeros((300, 3), np.uint8))
    with pytest.raises(ValueError, match="index beyond palette"):
        encode_gif(np.full((2, 2), 9, np.uint8), PAL16[:4])
    with pytest.raises(ValueError, match="share one size"):
        encode_gif([np.zeros((2, 2), np.uint8),
                    np.zeros((3, 2), np.uint8)], PAL16)


# --- external giflib parity -------------------------------------------------

needs_giflib = pytest.mark.skipif(
    not G.available(), reason="system giflib not loadable")


@needs_giflib
def test_giflib_layout_selfcheck():
    assert G.version_selfchecked()


@needs_giflib
def test_ours_to_giflib_matrix():
    """Every file our encoder emits decodes pixel-exact under REAL
    giflib — sizes, palette widths, and interlace both ways."""
    rng = np.random.default_rng(7)
    for trial in range(25):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        nc = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, (nc, 3), dtype=np.uint8)
        img = rng.integers(0, nc, (h, w), dtype=np.uint8)
        g = encode_gif(img, pal, interlace=bool(trial % 2))
        fr, p = G.decode(g)
        assert np.array_equal(fr[0], img), trial
        assert np.array_equal(p[:nc], pal), trial


@needs_giflib
def test_giflib_to_ours_matrix():
    rng = np.random.default_rng(9)
    for trial in range(25):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        nc = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, (nc, 3), dtype=np.uint8)
        img = rng.integers(0, nc, (h, w), dtype=np.uint8)
        th = G.encode(img, pal)
        fr, _, _ = decode_gif(th)
        assert np.array_equal(fr[0], img), trial


@needs_giflib
def test_animation_both_ways_giflib():
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 16, (9, 12), dtype=np.uint8)
              for _ in range(3)]
    fra, _ = G.decode(encode_gif(frames, PAL16, delays_cs=[5, 5, 5]))
    assert all(np.array_equal(a, b) for a, b in zip(fra, frames))
    frb, _, _ = decode_gif(G.encode(frames, PAL16))
    assert all(np.array_equal(a, b) for a, b in zip(frb, frames))


def test_decompression_bomb_rails():
    """Screen-descriptor and cumulative-frame rails (ADVICE r6): a
    65535x65535 screen, and an unbounded run of frames over a small
    screen, are both rejected before composited arrays materialize."""
    # 13-byte header declaring a 65535x65535 logical screen, no GCT
    hdr = b"GIF89a" + (65535).to_bytes(2, "little") * 2 + b"\x00\x00\x00"
    with pytest.raises(ValueError, match="max_pixels"):
        decode_gif(hdr + b"\x3b")

    # many small frames on a small screen: each composites to the full
    # logical screen, so the rail charges w*h per frame
    img = np.zeros((64, 64), dtype=np.uint8)
    one = encode_gif([img] * 3, PAL16)
    frames, _, _ = decode_gif(one)  # 3 frames x 4096 px: fine
    assert len(frames) == 3
    with pytest.raises(ValueError, match="max_pixels"):
        decode_gif(one, max_pixels=2 * 64 * 64)


def test_giflib_prewalk_bomb_rail():
    """The native-path bomb rail must bound giflib's own per-frame C
    allocation, not just the numpy compositing (ADVICE r7): the
    header-level pre-walk counts image descriptors BEFORE DGifSlurp,
    so a many-tiny-frames stream is rejected without giflib decoding
    a single frame."""
    if not G.available():
        pytest.skip("no system giflib")
    img = np.zeros((64, 64), dtype=np.uint8)
    stream = encode_gif([img] * 3, PAL16)
    # pre-walk agrees with the real frame count and screen dims, and
    # charges 3 frames x 64x64 (locals == screen here)
    assert G._prewalk_frames(stream) == (3, 64, 64, 3 * 64 * 64)
    frames, _ = G.decode(stream)
    assert len(frames) == 3
    with pytest.raises(ValueError, match="pre-walk|declared frames"):
        G.decode(stream, max_pixels=2 * 64 * 64)
    # malformed block byte is a typed error, not a crash
    with pytest.raises(ValueError, match="unknown block"):
        G._prewalk_frames(stream[:13] + b"\x7f" + stream[13:])


def test_giflib_local_descriptor_bomb_rail():
    """ADVICE r8 (medium): a GIF declaring a tiny 1x1 logical screen
    whose image descriptor declares a 65535x65535 LOCAL frame must be
    charged at the local size — DGifSlurp mallocs Width*Height per
    frame from the LOCAL descriptor, so a screen-only charge lets
    ~4.3 GB allocate in C before any rail fires.  The pre-walk must
    reject this header-only (no giflib call needed to verify the
    charge)."""
    # header: 1x1 screen, no GCT; one image descriptor declaring a
    # 65535x65535 local frame; no local color table; LZW min code size
    # then an empty data stream and trailer.  The stream is not a
    # decodable GIF (no pixel data) — the rail must fire BEFORE any
    # decode attempt, which is exactly the point.
    hdr = b"GIF89a" + (1).to_bytes(2, "little") * 2 + b"\x00\x00\x00"
    desc = (
        b"\x2c" + (0).to_bytes(2, "little") * 2
        + (65535).to_bytes(2, "little") * 2 + b"\x00"
    )
    stream = hdr + desc + b"\x02\x00\x3b"
    frames, sw, sh, charge = G._prewalk_frames(stream)
    assert (frames, sw, sh) == (1, 1, 1)
    assert charge == 65535 * 65535
    if G.available():
        with pytest.raises(ValueError, match="pre-walk"):
            G.decode(stream, max_pixels=1 << 24)
