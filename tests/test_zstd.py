"""From-scratch zstd decoder + raw-block encoder: EXTERNAL parity vs
the system libzstd at every compression level, frame-format surfaces
(skippable frames, multi-frame, checksums), own-XXH64 against the
official vectors, and fuzz campaigns."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions import zstd_codec as Z

RNG = random.Random(7)
FIXTURES = [
    b"",
    b"a",
    b"hello world hello world hello world",
    b"aaaaaaaaaaaaaaaaaaaaaa",
    bytes(range(256)) * 3,
    RNG.randbytes(1000),
    b"the quick brown fox jumps over the lazy dog " * 200,
    bytes(RNG.choices(b"abcdefgh", k=20000)),   # FSE-coded Huffman weights
    RNG.randbytes(60000),
    b"".join(bytes(RNG.choices(bytes(range(64)), k=5000))
             for _ in range(8)),                # 4-stream + FSE seq tables
]

needs_zstd = pytest.mark.skipif(
    not Z.available(), reason="system libzstd not loadable")


@needs_zstd
def test_libzstd_to_ours_every_level():
    """Output of REAL libzstd at every level 1..22 decodes byte-exactly
    under our decoder — this sweeps raw/RLE/compressed blocks,
    predefined + RLE + FSE-described sequence tables, direct and
    FSE-compressed Huffman weights, 1- and 4-stream literals, and
    treeless repeats."""
    for f in FIXTURES:
        for lvl in range(1, 23):
            assert Z.zstd_decompress(Z.ref_compress(f, lvl)) == f


@needs_zstd
def test_real_file_multi_block():
    data = open(__file__.rsplit("/tests/", 1)[0]
                + "/map2db_spark/queries_round5.py", "rb").read()
    for lvl in (1, 3, 19):
        assert Z.zstd_decompress(Z.ref_compress(data, lvl)) == data


@needs_zstd
def test_ours_to_libzstd_stored():
    for f in FIXTURES:
        for ck in (True, False):
            enc = Z.zstd_compress_stored(f, checksum=ck)
            assert Z.ref_decompress(enc, len(f)) == f
            assert Z.zstd_decompress(enc) == f


@needs_zstd
def test_stored_multi_block_frame():
    f = random.Random(9).randbytes(3_000_000)  # > 2^21-1 per block
    enc = Z.zstd_compress_stored(f)
    assert Z.ref_decompress(enc, len(f)) == f
    assert Z.zstd_decompress(enc) == f


@needs_zstd
def test_multi_frame_and_skippable():
    a, b = RNG.randbytes(500), b"hello" * 100
    skip = (0x184D2A53).to_bytes(4, "little") \
        + (5).to_bytes(4, "little") + b"meta!"
    stream = Z.ref_compress(a, 3) + skip + Z.zstd_compress_stored(b)
    assert Z.zstd_decompress(stream) == a + b


def test_xxh64_official_vectors():
    assert Z.xxh64(b"") == 0xEF46DB3751D8E999
    assert Z.xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert Z.xxh64(b"abc") == 0x44BC2CF5AD770999
    # >32 bytes exercises the four-lane path
    data = bytes(range(101))
    import struct
    # cross-check against libzstd-compressed frame checksum instead of
    # a hardcoded vector: the frame checksum IS xxh64 & 0xffffffff
    if Z.available():
        lib = Z._load()
        enc = Z.zstd_compress_stored(data, checksum=True)
        assert Z.ref_decompress(enc, len(data)) == data  # libzstd verifies


def test_checksum_enforced():
    enc = bytearray(Z.zstd_compress_stored(b"payload" * 50, checksum=True))
    enc[20] ^= 1
    with pytest.raises(ValueError, match="checksum"):
        Z.zstd_decompress(bytes(enc))


@needs_zstd
def test_zip_bomb_rail():
    big = Z.ref_compress(b"z" * 1_000_000, 19)
    assert len(big) < 1000
    with pytest.raises(ValueError, match="max_output"):
        Z.zstd_decompress(big, max_output=4096)


@needs_zstd
@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=4000), st.integers(1, 22))
def test_hypothesis_libzstd_to_ours(data, lvl):
    assert Z.zstd_decompress(Z.ref_compress(data, lvl)) == data


@needs_zstd
@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=4000))
def test_hypothesis_stored_to_libzstd(data):
    enc = Z.zstd_compress_stored(data)
    assert Z.ref_decompress(enc, len(data)) == data


@needs_zstd
def test_fuzz_bitflip_truncation_typed_errors():
    rng = random.Random(42)
    bases = [Z.ref_compress(rng.randbytes(300) + b"abc" * 300, lvl)
             for lvl in (1, 3, 19)]
    for trial in range(4000):
        buf = bytearray(bases[trial % 3])
        k = rng.randrange(3)
        if k == 0:
            buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        elif k == 1:
            buf = buf[:rng.randrange(len(buf))]
        else:
            for _ in range(rng.randrange(1, 6)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
        try:
            Z.zstd_decompress(bytes(buf), max_output=1 << 22)
        except ValueError:
            pass


def test_malformed_typed():
    with pytest.raises(ValueError, match="empty"):
        Z.zstd_decompress(b"")
    with pytest.raises(ValueError, match="magic"):
        Z.zstd_decompress(b"\x00\x00\x00\x00" + b"\x00" * 8)
    with pytest.raises(ValueError, match="window size"):
        # window descriptor demanding 2^41 bytes
        Z.zstd_decompress(
            (0xFD2FB528).to_bytes(4, "little") + b"\x00\xf8" + b"\x00" * 8)
    with pytest.raises(ValueError, match="dictionaries"):
        # dict-id flag set with a nonzero id
        Z.zstd_decompress(
            (0xFD2FB528).to_bytes(4, "little") + b"\x01\x00\x07"
            + b"\x00" * 8)


# --- compressing encoder (sequences + predefined FSE) ----------------------


@needs_zstd
def test_compressing_encoder_to_libzstd():
    """Our entropy-coded frames (FSE-encoded sequences + raw literals)
    decode byte-exactly under REAL libzstd AND our own decoder, at
    real compression ratios."""
    for f in FIXTURES:
        enc = Z.zstd_compress(f)
        assert Z.ref_decompress(enc, len(f)) == f
        assert Z.zstd_decompress(enc) == f
    text = b"the quick brown fox jumps over the lazy dog " * 100
    assert len(Z.zstd_compress(text)) < len(text) // 10


@needs_zstd
def test_compressing_encoder_real_file_multi_block():
    data = open(__file__.rsplit("/tests/", 1)[0]
                + "/map2db_spark/queries_round5.py", "rb").read()
    enc = Z.zstd_compress(data)  # >128 KiB: multiple compressed blocks
    assert len(enc) < len(data) // 2
    assert Z.ref_decompress(enc, len(data)) == data
    assert Z.zstd_decompress(enc) == data


@needs_zstd
def test_compressing_encoder_rle_block():
    f = b"\x42" * 100000
    enc = Z.zstd_compress(f)
    assert len(enc) < 50
    assert Z.ref_decompress(enc, len(f)) == f


@needs_zstd
@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=5000))
def test_hypothesis_compressing_encoder(data):
    enc = Z.zstd_compress(data)
    assert Z.ref_decompress(enc, len(data)) == data
    assert Z.zstd_decompress(enc) == data
