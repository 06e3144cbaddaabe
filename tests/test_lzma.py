"""From-scratch LZMA1 codec: external stdlib-lzma (liblzma) parity —
decoder against every preset and custom lc/lp/pb specs, literal-only
encoder under the real decoder — plus fuzz campaigns."""

import lzma
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions import lzma_codec as L

RNG = random.Random(7)
FIXTURES = [
    b"",
    b"a",
    b"hello world hello world hello world",
    b"aaaaaaaaaaaaaaaaaaaaaa",
    bytes(range(256)) * 3,
    RNG.randbytes(1000),
    b"the quick brown fox jumps over the lazy dog " * 200,
    bytes(RNG.choices(b"abcdefgh", k=20000)),  # big-distance matches
    RNG.randbytes(60000),
]


def test_liblzma_to_ours_every_preset():
    """stdlib lzma (FORMAT_ALONE) output at presets 0/1/6/9 decodes
    byte-exactly under our decoder — sweeping literal, match, rep,
    short-rep, matched-literal, SpecPos and direct-bits+align
    distance paths."""
    for f in FIXTURES:
        for preset in (0, 1, 6, 9):
            z = lzma.compress(f, format=lzma.FORMAT_ALONE, preset=preset)
            assert L.lzma_decompress(z) == f


def test_custom_lclppb_specs():
    """Non-default lc/lp/pb exercise every literal-context layout."""
    for f in FIXTURES[:8]:
        for lc, lp, pb in ((0, 2, 0), (4, 0, 3), (1, 3, 4), (2, 2, 2),
                           (0, 0, 0)):
            filt = [{"id": lzma.FILTER_LZMA1, "lc": lc, "lp": lp,
                     "pb": pb, "preset": 6}]
            z = lzma.compress(f, format=lzma.FORMAT_ALONE, filters=filt)
            assert L.lzma_decompress(z) == f, (lc, lp, pb)


def test_real_file():
    data = open(__file__.rsplit("/tests/", 1)[0]
                + "/map2db_spark/queries_round5.py", "rb").read()
    z = lzma.compress(data, format=lzma.FORMAT_ALONE, preset=6)
    assert L.lzma_decompress(z) == data


def test_ours_to_liblzma_literal_encoder():
    for f in FIXTURES:
        for lc, lp, pb in ((3, 0, 2), (0, 2, 0), (4, 0, 3)):
            enc = L.lzma_compress_literal(f, lc, lp, pb)
            assert lzma.decompress(enc, format=lzma.FORMAT_ALONE) == f
            assert L.lzma_decompress(enc) == f


def test_unknown_size_end_marker():
    """liblzma's raw encoder can emit the unknown-size header + end
    marker; build one via LZMAFile-style streaming."""
    f = b"end marker path " * 50
    comp = lzma.LZMACompressor(format=lzma.FORMAT_ALONE, preset=6)
    z = comp.compress(f) + comp.flush()
    # stdlib one-shot writes known size; streamed write may use marker.
    # Either way our decoder must accept what liblzma produced:
    assert L.lzma_decompress(z) == f


def test_zip_bomb_rail():
    f = b"q" * 1_000_000
    z = lzma.compress(f, format=lzma.FORMAT_ALONE, preset=6)
    assert len(z) < 2000
    with pytest.raises(ValueError, match="max_output"):
        L.lzma_decompress(z, max_output=65536)


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=4000), st.sampled_from([0, 6, 9]))
def test_hypothesis_liblzma_to_ours(data, preset):
    z = lzma.compress(data, format=lzma.FORMAT_ALONE, preset=preset)
    assert L.lzma_decompress(z) == data


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=3000))
def test_hypothesis_ours_to_liblzma(data):
    enc = L.lzma_compress_literal(data)
    assert lzma.decompress(enc, format=lzma.FORMAT_ALONE) == data


def test_fuzz_bitflip_truncation_typed_errors():
    rng = random.Random(42)
    base = lzma.compress(rng.randbytes(300) + b"abc" * 300,
                         format=lzma.FORMAT_ALONE, preset=6)
    for trial in range(4000):
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
            L.lzma_decompress(bytes(buf), max_output=1 << 22)
        except ValueError:
            pass


def test_malformed_typed():
    with pytest.raises(ValueError, match="header too short"):
        L.lzma_decompress(b"\x5d\x00")
    with pytest.raises(ValueError, match="properties"):
        L.lzma_decompress(bytes([225]) + b"\x00" * 17)
    with pytest.raises(ValueError, match="first range byte"):
        L.lzma_decompress(b"\x5d" + b"\x00\x00\x10\x00"
                          + (5).to_bytes(8, "little") + b"\x01" + b"\x00" * 4)
    with pytest.raises(ValueError, match="lc/lp/pb"):
        L.lzma_compress_literal(b"x", lc=9)
