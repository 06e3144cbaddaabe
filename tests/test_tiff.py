"""TIFF baseline codec tests (functions/tiff_codec.py): container
walk, PackBits, TIFF-LZW with early change, predictor, strips — plus
external bit-parity against the system libtiff when present."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from map2db_spark.functions import libtiff_oracle as LT
from map2db_spark.functions.tiff_codec import (
    TiffError,
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode_row,
    decode_tiff,
    encode_tiff,
)

_need_libtiff = pytest.mark.skipif(
    not LT.available(), reason="no system libtiff in this environment"
)


def _corpus() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(9)
    base = np.cumsum(np.cumsum(rng.normal(0, 1, (60, 80)), axis=0), axis=1)
    base = ((base - base.min()) / (np.ptp(base) + 1e-9) * 255).astype(np.uint8)
    return {
        "gray": rng.integers(0, 256, (13, 17), dtype=np.uint8),
        "rgb": rng.integers(0, 256, (9, 21, 3), dtype=np.uint8),
        "rgba": rng.integers(0, 256, (11, 7, 4), dtype=np.uint8),
        "runs": np.repeat(
            rng.integers(0, 256, (25, 8), dtype=np.uint8), 6, axis=1
        ),
        "grad": (np.add.outer(np.arange(40), np.arange(50)) % 256).astype(
            np.uint8
        ),
        "photo_rgb": np.ascontiguousarray(np.stack(
            [base, (base * 0.8).astype(np.uint8),
             (base * 0.6 + 30).astype(np.uint8)], axis=-1
        )),
        "flat": np.full((33, 47), 128, np.uint8),
        "thin": rng.integers(0, 256, (1, 500), dtype=np.uint8),
        "tall": rng.integers(0, 256, (500, 1), dtype=np.uint8),
        "one": rng.integers(0, 256, (1, 1), dtype=np.uint8),
    }


def _combos(img):
    for comp in ("none", "packbits", "lzw"):
        for rps in (None, 4, 1):
            preds = (False, True) if comp == "lzw" else (False,)
            for pred in preds:
                yield comp, rps, pred


def test_self_roundtrip_matrix():
    """Every (image, compression, strip-size, predictor) combo
    round-trips exactly through encode_tiff/decode_tiff."""
    n = 0
    for name, img in _corpus().items():
        for comp, rps, pred in _combos(img):
            data = encode_tiff(
                img, compression=comp, rows_per_strip=rps, predictor=pred
            )
            assert data[:4] == b"II\x2a\x00"
            out = decode_tiff(data)
            assert np.array_equal(out, img), (name, comp, rps, pred)
            n += 1
    assert n >= 70


def test_lzw_width_growth_and_table_reset_roundtrip():
    """Payloads long enough to cross every width bump (9->12) and the
    4094-entry table reset still round-trip exactly."""
    rng = np.random.default_rng(4)
    for size in (300, 900, 7000, 120_000):
        data = bytes(rng.integers(0, 256, size, dtype=np.uint8))
        assert _lzw_decode(_lzw_encode(data), size) == data
    # highly repetitive: deep table strings + KwKwK cases
    data = bytes([1, 2, 3] * 5000) + bytes([7] * 4000)
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_lzw_decode_rejects_malformed():
    with pytest.raises(TiffError):
        _lzw_decode(b"", 1)  # truncated
    # first code after clear must be a literal
    # 9-bit stream: CLEAR(256)=100000000, then 300=100101100
    acc = (256 << 9) | 300
    raw = acc.to_bytes(3, "big")  # 18 bits -> 3 bytes (6 pad bits)
    with pytest.raises(TiffError):
        _lzw_decode(raw, 4)
    # code far beyond the table
    acc = (256 << 9) | 65
    stream = (acc << 9) | 400  # 400 > len(table)=259 after one literal
    with pytest.raises(TiffError):
        _lzw_decode(stream.to_bytes(4, "big"), 10)


def test_packbits_roundtrip_and_errors():
    rng = np.random.default_rng(5)
    rows = [
        bytes(rng.integers(0, 256, 200, dtype=np.uint8)),
        bytes([9] * 300),
        bytes([1, 1, 2, 2, 3, 3] * 40),
        bytes([5]),
        bytes(range(129)) + bytes([7] * 129),
    ]
    for row in rows:
        packed = _packbits_encode_row(row)
        assert _packbits_decode(packed, len(row)) == row
        # worst-case expansion bound: 1 control byte per 128 literals
        assert len(packed) <= len(row) + (len(row) + 127) // 128
    with pytest.raises(TiffError):
        _packbits_decode(b"", 1)
    with pytest.raises(TiffError):
        _packbits_decode(b"\x05\x01", 6)  # literal overruns stream
    with pytest.raises(TiffError):
        _packbits_decode(b"\xfe", 3)  # repeat missing its byte


def test_container_validation_and_envelope():
    img = np.zeros((4, 4), np.uint8)
    good = encode_tiff(img)
    with pytest.raises(TiffError):
        decode_tiff(b"XX" + good[2:])  # byte-order mark
    with pytest.raises(TiffError):
        decode_tiff(good[:2] + struct.pack("<H", 41) + good[4:])  # magic
    with pytest.raises(NotImplementedError):
        decode_tiff(good[:2] + struct.pack("<H", 43) + good[4:])  # BigTIFF
    with pytest.raises(TiffError):
        decode_tiff(good[:6])  # truncated header

    def with_tag_patched(data: bytes, tag: int, new_val: int) -> bytes:
        (ifd,) = struct.unpack_from("<I", data, 4)
        (n,) = struct.unpack_from("<H", data, ifd)
        b = bytearray(data)
        for k in range(n):
            off = ifd + 2 + 12 * k
            (t,) = struct.unpack_from("<H", data, off)
            if t == tag:
                struct.pack_into("<I", b, off + 8, new_val)
                return bytes(b)
        raise AssertionError(f"tag {tag} not found")

    with pytest.raises(NotImplementedError):
        decode_tiff(with_tag_patched(good, 259, 7))  # JPEG compression
    with pytest.raises(NotImplementedError):
        decode_tiff(with_tag_patched(good, 284, 2))  # planar separate
    with pytest.raises(NotImplementedError):
        decode_tiff(with_tag_patched(good, 258, 16))  # 16-bit
    with pytest.raises(TiffError):
        decode_tiff(with_tag_patched(good, 279, 1 << 30))  # strip overrun


def test_big_endian_decode():
    """A hand-built MM (big-endian) file decodes identically — the
    reader honors the byte-order mark for every multi-byte field."""
    img = np.arange(6, dtype=np.uint8).reshape(2, 3)

    def entry(tag, ftype, count, val):
        if ftype == 3:
            return struct.pack(">HHIHH", tag, ftype, count, val, 0)
        return struct.pack(">HHII", tag, ftype, count, val)

    entries = [
        entry(256, 4, 1, 3), entry(257, 4, 1, 2), entry(258, 3, 1, 8),
        entry(259, 3, 1, 1), entry(262, 3, 1, 1),
        entry(273, 4, 1, 0),  # patched below
        entry(277, 3, 1, 1), entry(278, 4, 1, 2), entry(279, 4, 1, 6),
    ]
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + b"\x00" * 4
    data_off = 8 + len(ifd)
    entries[5] = entry(273, 4, 1, data_off)
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + b"\x00" * 4
    buf = b"MM" + struct.pack(">HI", 42, 8) + ifd + img.tobytes()
    assert np.array_equal(decode_tiff(buf), img)


def test_fuzz_bitflips_truncation_typed_errors_only():
    """Corruption campaign over all three compressions: decode either
    succeeds with a full-size array or raises TiffError /
    NotImplementedError — never an untyped exception."""
    rng = np.random.default_rng(6)
    img = np.repeat(rng.integers(0, 256, (10, 12), dtype=np.uint8), 3, axis=1)
    streams = [
        encode_tiff(img, compression=c, rows_per_strip=4,
                    predictor=(c == "lzw"))
        for c in ("none", "packbits", "lzw")
    ]
    random.seed(8)
    for _ in range(900):
        enc = random.choice(streams)
        b = bytearray(enc)
        for _k in range(random.randint(1, 3)):
            i = random.randrange(0, len(b))
            b[i] ^= 1 << random.randrange(8)
        try:
            out = decode_tiff(bytes(b))
            assert out.dtype == np.uint8
        except (TiffError, NotImplementedError):
            pass
    for enc in streams:
        for cut in range(1, len(enc) - 1, 2):
            try:
                decode_tiff(enc[:cut])
            except (TiffError, NotImplementedError):
                pass


@_need_libtiff
def test_external_parity_both_directions():
    """Our streams read back scanline-exact under libtiff AND
    libtiff-written files decode exactly under our decoder, across the
    full envelope matrix (compressions x strip sizes x predictor)."""
    n = 0
    for name, img in _corpus().items():
        for comp, rps, pred in _combos(img):
            ours = encode_tiff(
                img, compression=comp, rows_per_strip=rps, predictor=pred
            )
            assert np.array_equal(LT.decode(ours), img), (name, comp, rps)
            theirs = LT.encode(
                img, compression=comp,
                rows_per_strip=rps or img.shape[0], predictor=pred,
            )
            assert np.array_equal(decode_tiff(theirs), img), (
                name, comp, rps, pred,
            )
            n += 1
    assert n >= 70


@_need_libtiff
def test_lzw_streams_byte_identical_to_libtiff():
    """Stronger than round-trip: our LZW encoder emits the SAME BYTES
    as libtiff 4.5.0 across width bumps and table resets (the full
    9->12-bit ramp and the 4094-entry Clear policy)."""
    def strip_bytes(buf: bytes) -> bytes:
        (ifd,) = struct.unpack_from("<I", buf, 4)
        (n,) = struct.unpack_from("<H", buf, ifd)
        tags = {}
        for k in range(n):
            off = ifd + 2 + 12 * k
            tag, _ft = struct.unpack_from("<HH", buf, off)
            (val,) = struct.unpack_from("<I", buf, off + 8)
            tags[tag] = val
        return buf[tags[273] : tags[273] + tags[279]]

    rng = np.random.default_rng(0)
    for size in (900, 6000, 60000):
        img = rng.integers(0, 256, (1, size), dtype=np.uint8)
        theirs = strip_bytes(LT.encode(img, compression="lzw"))
        assert theirs == _lzw_encode(img.tobytes()), size


@_need_libtiff
def test_libtiff_reads_our_multistrip_rgba_predictor():
    """The fussiest layout — 4-sample RGBA, 3-row strips, predictor 2
    under LZW — is accepted by libtiff scanline-for-scanline."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (17, 11, 4), dtype=np.uint8)
    data = encode_tiff(img, compression="lzw", rows_per_strip=3,
                       predictor=True)
    assert np.array_equal(LT.decode(data), img)


def test_decompression_bomb_rail():
    """A tiny crafted file declaring a 2^20 x 2^20 x 4 raster must be
    rejected by the total-output rail (decode_vp8's max_pixels
    convention) before any strip expansion is attempted — per-axis
    caps alone still admit multi-TiB outputs (ADVICE r6)."""
    big = 1 << 20
    data = encode_tiff(np.zeros((2, 2), dtype=np.uint8))
    # rewrite width/height/spp in the little-endian IFD in place
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    buf = bytearray(data)
    for k in range(n):
        off = ifd_off + 2 + 12 * k
        (tag,) = struct.unpack_from("<H", buf, off)
        if tag in (256, 257):  # ImageWidth / ImageLength
            struct.pack_into("<HHI I", buf, off, tag, 4, 1, big)
        if tag == 277:  # SamplesPerPixel
            struct.pack_into("<HHI I", buf, off, tag, 3, 1, 4)
    with pytest.raises(TiffError, match="max_pixels"):
        decode_tiff(bytes(buf))
    # trusted-input override still reaches the structural checks
    # (strip accounting fails loudly instead of a silent bomb)
    with pytest.raises(TiffError, match="strips"):
        decode_tiff(bytes(buf), max_pixels=big * big * 4)
