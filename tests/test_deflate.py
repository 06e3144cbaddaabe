"""From-scratch DEFLATE/zlib/gzip codec: external stdlib-zlib (libz)
parity in both directions, container checks, zip-bomb rail, and
bitflip/truncation fuzz campaigns with the typed-error contract."""

import gzip
import random
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions import deflate_codec as D

FIXTURES = [
    b"",
    b"a",
    b"ab",
    b"aaaaaaaaaaaaaaaaaaaaaaaa",                      # single distance code
    b"abcabcabcabcabcabcabcabc",
    b"hello world hello world hello world",
    bytes(range(256)) * 4,
    random.Random(7).randbytes(5000),                  # near-incompressible
    b"the quick brown fox jumps over the lazy dog " * 300,
    bytes(random.Random(9).choices(b"abcd", k=20000)),  # small alphabet
    random.Random(11).randbytes(70000),                # > one stored block
]


@pytest.mark.parametrize("mode", ["stored", "fixed", "dynamic"])
def test_ours_to_zlib_every_fixture(mode):
    """Every stream our encoder emits decompresses byte-exactly under
    the REAL zlib (raw-deflate wbits=-15)."""
    for f in FIXTURES:
        enc = D.deflate(f, mode)
        assert zlib.decompress(enc, -15) == f
        assert D.inflate(enc) == f


def test_zlib_to_ours_every_level():
    """Every stream zlib.compress emits at every level 0-9 inflates
    byte-exactly under our decoder (level 0 = stored blocks, 1 = greedy
    fixed-ish, 9 = max lazy matching: all three emitted shapes)."""
    for f in FIXTURES:
        for lvl in range(10):
            raw = zlib.compress(f, lvl)[2:-4]
            assert D.inflate(raw) == f


def test_zlib_container_both_ways():
    for f in FIXTURES:
        assert zlib.decompress(D.zlib_compress(f)) == f
        assert D.zlib_decompress(zlib.compress(f, 6)) == f
        assert D.zlib_decompress(D.zlib_compress(f)) == f


def test_gzip_member_decode_with_flags():
    for f in FIXTURES:
        assert D.gzip_decompress(gzip.compress(f)) == f
    # FNAME flag path (gzip.compress never sets it; build via GzipFile)
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(filename="corpus.txt", mode="wb", fileobj=buf) as g:
        g.write(b"named member payload")
    assert D.gzip_decompress(buf.getvalue()) == b"named member payload"


def test_checksums_match_zlib():
    for f in FIXTURES:
        assert D.adler32(f) == zlib.adler32(f)
        assert D.crc32(f) == zlib.crc32(f)


def test_dynamic_beats_stored_on_text():
    f = b"the quick brown fox jumps over the lazy dog " * 300
    dyn = len(D.deflate(f, "dynamic"))
    sto = len(D.deflate(f, "stored"))
    assert dyn < sto // 10  # text compresses >10x
    # and is within 15% of real zlib level 6
    assert dyn <= int((len(zlib.compress(f, 6)) - 6) * 1.15)


def test_zip_bomb_rail():
    f = b"x" * 1_000_000
    z = D.zlib_compress(f)
    assert len(z) < 2000  # the bomb premise: ~1000x expansion
    with pytest.raises(ValueError, match="max_output"):
        D.zlib_decompress(z, max_output=65536)
    with pytest.raises(ValueError, match="max_output"):
        D.gzip_decompress(gzip.compress(f), max_output=65536)
    # rail off -> full round-trip
    assert D.zlib_decompress(z) == f


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=4000),
       st.sampled_from(["stored", "fixed", "dynamic"]))
def test_hypothesis_roundtrip(data, mode):
    enc = D.deflate(data, mode)
    assert zlib.decompress(enc, -15) == data
    assert D.inflate(enc) == data


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=3000))
def test_hypothesis_zlib_to_ours(data):
    assert D.zlib_decompress(zlib.compress(data, 9)) == data


def test_fuzz_bitflip_truncation_typed_errors():
    """Corrupt streams either raise ValueError or produce bytes — never
    IndexError/KeyError/OverflowError/MemoryError leaks."""
    rng = random.Random(42)
    base = D.zlib_compress(rng.randbytes(300) + b"abc" * 200)
    gz = gzip.compress(b"payload " * 100)
    for trial in range(3000):
        buf = bytearray(base if trial % 2 else gz)
        k = rng.randrange(3)
        if k == 0:
            i = rng.randrange(len(buf))
            buf[i] ^= 1 << rng.randrange(8)
        elif k == 1:
            buf = buf[:rng.randrange(len(buf))]
        else:
            for _ in range(rng.randrange(1, 6)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
        fn = D.zlib_decompress if trial % 2 else D.gzip_decompress
        try:
            fn(bytes(buf), max_output=1 << 20)
        except ValueError:
            pass


def test_malformed_headers_typed():
    with pytest.raises(ValueError, match="too short"):
        D.zlib_decompress(b"\x78")
    with pytest.raises(ValueError, match="method"):
        D.zlib_decompress(b"\x77\x01" + b"\x00" * 8)
    with pytest.raises(ValueError, match="FCHECK"):
        D.zlib_decompress(b"\x78\x00" + b"\x00" * 8)
    with pytest.raises(ValueError, match="dictionary"):
        D.zlib_decompress(bytes((0x78, 0x20 | (31 - (0x7820 % 31)))) + b"\x00" * 8)
    with pytest.raises(ValueError, match="magic"):
        D.gzip_decompress(b"\x1f\x8c" + b"\x00" * 20)
    with pytest.raises(ValueError, match="reserved block type"):
        D.inflate(b"\x07")  # BFINAL=1 BTYPE=3
    with pytest.raises(ValueError, match="LEN/NLEN"):
        D.inflate(b"\x01\x05\x00\x00\x00")
    with pytest.raises(ValueError, match="distance beyond"):
        # fixed block: one literal then a match with dist > output
        w = D._BitWriter()
        w.write(1, 1)
        w.write(1, 2)
        codes = D._canonical_codes(D._fixed_lit_lengths())
        lens = D._fixed_lit_lengths()
        w.write_code(codes[65], lens[65])       # 'A'
        w.write_code(codes[257], lens[257])     # length 3
        w.write_code(D._canonical_codes([5] * 30)[10], 5)  # dist 33..48
        w.write(0, 4)
        w.write_code(codes[256], lens[256])
        D.inflate(w.bytes())


def test_single_distance_code_header():
    """RFC 1951 1-distance-code special case: zlib must accept our
    header for an 'aaaa...' stream whose only distance is 1."""
    f = b"a" * 500
    enc = D.deflate(f, "dynamic")
    assert zlib.decompress(enc, -15) == f
    # and symmetric: zlib's own single-distance stream under our decoder
    assert D.inflate(zlib.compress(f, 9)[2:-4]) == f
