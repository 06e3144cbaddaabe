"""From-scratch bzip2 codec: external stdlib-bz2 (libbz2) parity in
both directions, the four chained transforms individually, CRC
verification, multi-block streams, and fuzz campaigns."""

import bz2
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions import bzip2_codec as B

RNG = random.Random(7)
FIXTURES = [
    b"",
    b"a",
    b"abc",
    b"aaaaaaaaaaaaaaaaaaa",            # RLE1 run + degenerate BWT
    b"banana" * 3,
    b"hello world hello world hello world",
    bytes(range(256)),
    RNG.randbytes(1000),
    b"the quick brown fox jumps " * 300,
    bytes(RNG.choices(b"abcd", k=9000)),
    b"ab" * 5000,                       # fully periodic rotations
    RNG.randbytes(150000),              # multi-block at level 1
]


def test_ours_to_bz2_every_fixture():
    """Every stream our encoder emits decompresses byte-exactly under
    the REAL stdlib bz2 (libbz2)."""
    for f in FIXTURES:
        enc = B.bzip2_compress(f)
        assert bz2.decompress(enc) == f
        assert B.bzip2_decompress(enc) == f


def test_bz2_to_ours_every_level():
    for f in FIXTURES:
        for lvl in (1, 2, 5, 9):
            assert B.bzip2_decompress(bz2.compress(f, lvl)) == f


def test_multi_block_ours():
    f = random.Random(11).randbytes(200000)
    enc = B.bzip2_compress(f, level=1)  # 3 blocks through combined CRC
    assert bz2.decompress(enc) == f
    assert B.bzip2_decompress(enc) == f


def test_transforms_individually():
    data = b"banana_bandana" * 20
    rle = B._rle1_encode(data)
    assert B._rle1_decode(rle) == data
    bwt, ptr = B._bwt_encode(rle)
    assert B._bwt_decode(bwt, ptr) == rle
    used = sorted(set(bwt))
    mtf = B._mtf_rle2_encode(bwt, used)
    assert B._mtf_rle2_decode(iter(mtf), used, 10 ** 6) == bwt


def test_rle1_run_boundaries():
    for run in (3, 4, 5, 254, 255, 256, 600):
        data = b"x" * run + b"y"
        assert B._rle1_decode(B._rle1_encode(data)) == data
        assert bz2.decompress(B.bzip2_compress(data)) == data


def test_crc_matches_reference_convention():
    """Corrupting a payload byte must fail OUR decoder's block CRC —
    proving we verify, not just parse."""
    f = b"payload " * 100
    enc = bytearray(B.bzip2_compress(f))
    # flip a bit deep in the entropy-coded area
    enc[len(enc) // 2] ^= 0x10
    with pytest.raises(ValueError):
        B.bzip2_decompress(bytes(enc))


def test_compresses_text():
    t = b"the quick brown fox jumps over the lazy dog " * 1000
    ours = len(B.bzip2_compress(t))
    ref = len(bz2.compress(t, 9))
    assert ours < len(t) // 100
    assert ours <= int(ref * 1.25)


def test_zip_bomb_rail():
    f = b"z" * 400000
    enc = B.bzip2_compress(f)
    with pytest.raises(ValueError, match="max_output"):
        B.bzip2_decompress(enc, max_output=65536)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=3000))
def test_hypothesis_both_directions(data):
    enc = B.bzip2_compress(data)
    assert bz2.decompress(enc) == data
    assert B.bzip2_decompress(enc) == data
    assert B.bzip2_decompress(bz2.compress(data, 9)) == data


def test_fuzz_bitflip_truncation_typed_errors():
    rng = random.Random(42)
    base = B.bzip2_compress(rng.randbytes(300) + b"abc" * 200)
    refbase = bz2.compress(b"payload " * 100, 9)
    for trial in range(2500):
        buf = bytearray(base if trial % 2 else refbase)
        k = rng.randrange(3)
        if k == 0:
            buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        elif k == 1:
            buf = buf[:rng.randrange(len(buf))]
        else:
            for _ in range(rng.randrange(1, 6)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
        try:
            B.bzip2_decompress(bytes(buf), max_output=1 << 22)
        except ValueError:
            pass


def test_malformed_typed():
    with pytest.raises(ValueError, match="too short"):
        B.bzip2_decompress(b"BZh9")
    with pytest.raises(ValueError, match="magic"):
        B.bzip2_decompress(b"BAh9" + b"\x00" * 20)
    with pytest.raises(ValueError, match="level"):
        B.bzip2_decompress(b"BZh0" + b"\x00" * 20)
    with pytest.raises(ValueError, match="bad level"):
        B.bzip2_compress(b"x", level=10)
