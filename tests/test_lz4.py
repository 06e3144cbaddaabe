"""From-scratch LZ4 block codec: self round-trips, EXTERNAL
both-direction parity vs the system liblz4, spec end-rules, and
bitflip/truncation fuzz with the typed-error contract."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions import lz4_codec as L

RNG = random.Random(3)
FIXTURES = [
    b"", b"a", b"abcd", b"x" * 11, b"x" * 12, b"x" * 13, b"x" * 100,
    b"hello world hello world hello world!",
    RNG.randbytes(20), RNG.randbytes(5000),
    b"the quick brown fox " * 500,
    bytes(RNG.choices(b"ab", k=30000)),
    RNG.randbytes(100000),
]

needs_lz4 = pytest.mark.skipif(
    not L.available(), reason="system liblz4 not loadable")


def test_self_roundtrip():
    for f in FIXTURES:
        assert L.lz4_decompress(L.lz4_compress(f)) == f


@needs_lz4
def test_ours_to_liblz4():
    for f in FIXTURES:
        assert L.ref_decompress(L.lz4_compress(f), len(f)) == f


@needs_lz4
def test_liblz4_to_ours():
    for f in FIXTURES:
        assert L.lz4_decompress(L.ref_compress(f)) == f


@needs_lz4
def test_empty_block_matches_reference():
    assert L.lz4_compress(b"") == L.ref_compress(b"") == b"\x00"


def test_compresses_repetitive():
    f = b"the quick brown fox " * 500
    assert len(L.lz4_compress(f)) < len(f) // 50


def test_overlapping_match_rle():
    """offset < match_len exercises the byte-at-a-time overlap copy —
    the RLE trick LZ4 uses for runs."""
    f = b"ab" + b"a" * 1000
    enc = L.lz4_compress(f)
    assert L.lz4_decompress(enc) == f
    if L.available():
        assert L.ref_decompress(enc, len(f)) == f
        assert L.lz4_decompress(L.ref_compress(f)) == f


def test_zip_bomb_rail():
    f = b"y" * 500000
    enc = L.lz4_compress(f)
    with pytest.raises(ValueError, match="max_output"):
        L.lz4_decompress(enc, max_output=4096)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=4000))
def test_hypothesis_roundtrip_and_parity(data):
    enc = L.lz4_compress(data)
    assert L.lz4_decompress(enc) == data
    if L.available():
        assert L.ref_decompress(enc, len(data)) == data
        assert L.lz4_decompress(L.ref_compress(data)) == data


def test_fuzz_typed_errors():
    rng = random.Random(42)
    base = L.lz4_compress(rng.randbytes(200) + b"abc" * 300)
    for trial in range(3000):
        buf = bytearray(base)
        k = rng.randrange(3)
        if k == 0:
            buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        elif k == 1:
            buf = buf[:rng.randrange(len(buf))]
        else:
            for _ in range(rng.randrange(1, 6)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
        try:
            L.lz4_decompress(bytes(buf), max_output=1 << 20)
        except ValueError:
            pass


def test_malformed_typed():
    with pytest.raises(ValueError, match="zero offset"):
        L.lz4_decompress(b"\x10a\x00\x00")
    with pytest.raises(ValueError, match="offset beyond"):
        L.lz4_decompress(b"\x10a\x09\x00")
    with pytest.raises(ValueError, match="truncated literals"):
        L.lz4_decompress(b"\x40ab")
    with pytest.raises(ValueError, match="truncated offset"):
        L.lz4_decompress(b"\x11ab")
