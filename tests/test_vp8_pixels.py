"""Bit-parity for the full VP8 keyframe pixel decoder
(functions/vp8_decode.py) against the system libwebp.

Three tiers:

- committed-fixture parity (no libwebp needed): the 16 streams in
  functions/vp8_fixtures.py decode to the reference decoder's own
  recorded plane sums/MD5s — external ground truth frozen at
  generation time by tools/make_vp8_fixtures.py;
- live parity (skipped without libwebp): fresh reference-encoded
  keyframes across content classes, qualities and advanced-API
  configs (mb_no_coeff_skip, SIMPLE loop filter, disabled
  segmentation, sharpness) must decode bit-identically to
  WebPDecodeYUV, with stats proving each feature actually ran;
- fuzz: bit flips and truncations over real streams either decode to
  full-size planes or raise the typed contract, never an untyped
  exception.
"""

from __future__ import annotations

import base64
import hashlib
import random

import numpy as np
import pytest

from map2db_spark.functions import libwebp_oracle as LW
from map2db_spark.functions.vp8_decode import decode_vp8
from map2db_spark.functions.vp8_fixtures import FIXTURES
from map2db_spark.functions.webp import WebpError


def test_committed_fixtures_bit_exact():
    """Every committed fixture reproduces libwebp's recorded planes —
    this is the m_vp8_pixels oracle run locally, libwebp-free."""
    assert len(FIXTURES) == 16
    for f in FIXTURES:
        y, u, v = decode_vp8(base64.b64decode(f["b64"]))
        assert (y.shape[1], y.shape[0]) == (f["w"], f["h"]), f["i"]
        assert int(y.astype(np.int64).sum()) == f["y_sum"], f["i"]
        assert int(u.astype(np.int64).sum()) == f["u_sum"], f["i"]
        assert int(v.astype(np.int64).sum()) == f["v_sum"], f["i"]
        assert hashlib.md5(y.tobytes()).hexdigest() == f["y_md5"], f["i"]
        assert hashlib.md5(u.tobytes() + v.tobytes()).hexdigest() \
            == f["uv_md5"], f["i"]


def _corpus() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(20260815)
    base = np.cumsum(np.cumsum(rng.normal(0, 1, (48, 64)), axis=0), axis=1)
    base = ((base - base.min()) / (np.ptp(base) + 1e-9) * 255).astype(
        np.uint8
    )
    photo = np.stack(
        [base, (base * 0.8 + 30).astype(np.uint8),
         (base * 0.5 + 60).astype(np.uint8), np.full_like(base, 255)],
        axis=-1,
    )
    gx, gy = np.meshgrid(np.arange(64) * 4, np.arange(48) * 5)
    grad = np.stack(
        [gx % 256, gy % 256, (gx // 2 + gy // 2) % 256,
         np.full_like(gx, 255)], axis=-1
    ).astype(np.uint8)
    return {
        "flat": np.full((32, 48, 4), 128, np.uint8),
        "photo": np.ascontiguousarray(photo),
        "gradient": np.ascontiguousarray(grad),
        "noise": rng.integers(0, 256, (33, 47, 4), dtype=np.uint8),
        "odd": rng.integers(0, 256, (17, 19, 4), dtype=np.uint8),
        "one": rng.integers(0, 256, (1, 1, 4), dtype=np.uint8),
        "thin": rng.integers(0, 256, (1, 120, 4), dtype=np.uint8),
        "tall": rng.integers(0, 256, (120, 1, 4), dtype=np.uint8),
    }


def _assert_parity(data: bytes) -> dict:
    ry, ru, rv = LW.decode_yuv(data)
    y, u, v, st = decode_vp8(data, with_stats=True)
    assert np.array_equal(y, ry)
    assert np.array_equal(u, ru)
    assert np.array_equal(v, rv)
    return st


@pytest.mark.skipif(not LW.available(), reason="no system libwebp")
def test_live_parity_simple_api_all_qualities():
    """Reference-encoded keyframes decode bit-identically across the
    corpus at four qualities; the aggregate stats prove B_PRED, every
    16x16 mode, token-prob updates and the loop filter all ran."""
    tot_ymodes = [0] * 5
    tot_bmodes = [0] * 10
    tot_upd = tot_filtered = 0
    for img in _corpus().values():
        for q in (10.0, 50.0, 75.0, 95.0):
            st = _assert_parity(
                LW.encode_rgba(np.ascontiguousarray(img), quality=q)
            )
            tot_ymodes = [a + b for a, b in zip(tot_ymodes, st["ymodes"])]
            tot_bmodes = [a + b for a, b in zip(tot_bmodes, st["bmodes"])]
            tot_upd += st["prob_updates"]
            tot_filtered += st["filtered_edges"]
    assert all(c > 0 for c in tot_ymodes), tot_ymodes
    # the corpus must exercise most of the ten B predictors (the
    # encoder picks them data-dependently; require >= 8 distinct)
    assert sum(1 for c in tot_bmodes if c > 0) >= 8, tot_bmodes
    assert tot_upd > 0 and tot_filtered > 0


@pytest.mark.skipif(not LW.available(), reason="no system libwebp")
def test_live_parity_advanced_configs():
    """WebPEncode with explicit configs reaches the bitstream features
    the simple API never emits; each decodes bit-exactly and the
    stats prove the feature was actually present."""
    rng = np.random.default_rng(7)
    flat = np.full((192, 256, 4), 180, np.uint8)
    flat[80:112, 100:140] = rng.integers(0, 256, (32, 40, 4), np.uint8)

    # mb_no_coeff_skip (method=0): many MBs must take the skip path
    st = _assert_parity(LW.encode_rgba_advanced(flat, method=0))
    assert st["skipped"] > 50, st["skipped"]

    # SIMPLE loop filter (config filter_type=0 -> bitstream bit 1)
    from map2db_spark.functions.vp8 import decode_vp8_header

    data = LW.encode_rgba_advanced(flat, filter_type=0)
    hdr = decode_vp8_header(data)
    assert hdr["filter_type"] == 1 and hdr["loop_filter_level"] > 0
    _assert_parity(data)

    # segmentation disabled
    data = LW.encode_rgba_advanced(flat, segments=1)
    assert decode_vp8_header(data)["segmentation_enabled"] == 0
    _assert_parity(data)

    # sharpness-shaped interior limit
    data = LW.encode_rgba_advanced(flat, filter_sharpness=5, quality=25.0)
    assert decode_vp8_header(data)["sharpness_level"] == 5
    _assert_parity(data)

    # combined: skip + simple filter at another quality
    st = _assert_parity(
        LW.encode_rgba_advanced(flat, method=0, filter_type=0,
                                quality=40.0)
    )
    assert st["skipped"] > 50


@pytest.mark.skipif(not LW.available(), reason="no system libwebp")
def test_fuzz_bitflips_truncation_typed_errors_only():
    """r6 fuzz campaign over the new pixel-decode surface (token
    walker, mode trees, partition framing, loop filter): corrupt real
    streams either decode to full-size planes or raise the typed
    contract — never an untyped exception."""
    rng = np.random.default_rng(3)
    imgs = [
        np.ascontiguousarray(rng.integers(0, 256, (32, 48, 4),
                                          dtype=np.uint8)),
        np.full((32, 48, 4), 90, np.uint8),
    ]
    streams = [LW.encode_rgba(i, quality=60.0) for i in imgs]
    streams.append(LW.encode_rgba_advanced(imgs[0], method=0,
                                           filter_type=0))
    random.seed(29)
    for _ in range(300):
        enc = random.choice(streams)
        b = bytearray(enc)
        for _k in range(random.randint(1, 3)):
            i = random.randrange(12, len(b))
            b[i] ^= 1 << random.randrange(8)
        try:
            y, u, v = decode_vp8(bytes(b))
            assert y.ndim == 2 and u.ndim == 2 and v.ndim == 2
        except (WebpError, NotImplementedError):
            pass
    for enc in streams[:1]:
        for cut in range(1, len(enc) - 1, 7):
            try:
                decode_vp8(enc[:cut])
            except (WebpError, NotImplementedError):
                pass


@pytest.mark.skipif(not LW.available(), reason="no system libwebp")
def test_alpha_plane_bit_exact_and_image_decode_wiring():
    """Lossy WebP with an ALPH chunk (the shape every RGBA input
    produces): the FROM-SCRATCH path (prefer_native=False — r7's
    native-first dispatch would otherwise hand back libwebp's own
    RGBA and the comparison would be a tautology) reconstructs the
    ALPHA plane bit-identically to WebPDecodeRGBA across raw/
    compressed/filtered ALPH variants, and RGB matches exactly
    wherever chroma is flat (the only divergence channel is libwebp's
    fancy chroma upsampler, documented engine-defined in
    _decode_pure)."""
    from functools import partial

    from map2db_spark.functions.multimodal import decode_image_real

    decode_image_real = partial(decode_image_real, prefer_native=False)

    rng = np.random.default_rng(9)
    grad = np.full((32, 48, 4), 100, np.uint8)
    grad[:, :, 3] = (
        (np.add.outer(np.arange(32), np.arange(48)) * 3) % 256
    ).astype(np.uint8)
    two_tone = np.full((24, 24, 4), 50, np.uint8)
    two_tone[:, :, 3] = np.where(
        (np.add.outer(np.arange(24), np.arange(24)) // 4) % 2 == 0,
        255, 64,
    ).astype(np.uint8)
    cases = [
        np.full((16, 16, 4), 77, np.uint8),        # opaque constant
        grad,                                      # smooth alpha ramp
        two_tone,                                  # few-value alpha
        rng.integers(0, 256, (20, 28, 4), np.uint8),  # dense alpha
    ]
    flat_rgb_exact = 0
    for img in cases:
        for q in (30.0, 75.0, 95.0):
            data = LW.encode_rgba(np.ascontiguousarray(img), quality=q)
            ours = decode_image_real(data)
            ref = LW.decode_rgba(data)
            assert ours.shape == ref.shape
            assert np.array_equal(ours[:, :, 3], ref[:, :, 3])
            if np.array_equal(ours[:, :, :3], ref[:, :, :3]):
                flat_rgb_exact += 1
    # the three flat-chroma cases x three qualities must be RGB-exact
    assert flat_rgb_exact >= 9, flat_rgb_exact


@pytest.mark.skipif(not LW.available(), reason="no system libwebp")
def test_fuzz_alpha_stream_typed_errors_only():
    """Corruption campaign over the ALPH path (decode_image_real on a
    real RGBA lossy stream: container walk + alpha unfilter +
    headerless VP8L body + YUV convert): bit flips and truncations
    decode to an (h, w, 4) array or raise the typed contract
    (WebpError / NotImplementedError / ValueError), never an untyped
    exception."""
    from map2db_spark.functions.multimodal import decode_image_real

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (20, 28, 4), np.uint8)
    enc = LW.encode_rgba(np.ascontiguousarray(img), quality=60.0)
    random.seed(5)
    for _ in range(400):
        b = bytearray(enc)
        for _k in range(random.randint(1, 3)):
            i = random.randrange(12, len(b))
            b[i] ^= 1 << random.randrange(8)
        try:
            out = decode_image_real(bytes(b))
            assert out.ndim == 3 and out.shape[2] == 4
        except (WebpError, NotImplementedError, ValueError):
            pass
    for cut in range(1, len(enc) - 1, 3):
        try:
            decode_image_real(enc[:cut])
        except (WebpError, NotImplementedError, ValueError):
            pass


def test_decompression_bomb_rail():
    """A tiny stream declaring huge dims must raise the typed rail
    before the macroblock walk starts (the family's max_output
    convention); the limit is caller-raisable for trusted input."""
    import struct

    part = b"\x00" * 8
    tag = (1 << 4) | (len(part) << 5)
    body = (struct.pack("<I", tag)[:3] + b"\x9d\x01\x2a"
            + struct.pack("<HH", 16383, 16383) + part)
    buf = (b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
           + b"VP8 " + struct.pack("<I", len(body)) + body)
    with pytest.raises(WebpError, match="max_pixels"):
        decode_vp8(buf)
    # fixtures stay comfortably under the default rail
    y, u, v = decode_vp8(base64.b64decode(FIXTURES[0]["b64"]))
    assert y.size <= 1 << 24


def test_multipartition_frames_decode_and_vary_by_row():
    """Synthesized 1/2/4/8-partition keyframes decode with distinct
    flat luma per MB row — so a wrong row->partition mapping cannot
    decode correctly — and framing errors raise typed (libwebp-free
    half of the multi-partition check)."""
    from map2db_spark.functions.vp8 import decode_vp8_header
    from map2db_spark.functions.vp8_decode import encode_vp8_rowpattern

    for log2 in range(4):
        buf = encode_vp8_rowpattern(
            64, 80, dct_partition_log2=log2, row_values=[0, 1, 2, 3, 4]
        )
        assert decode_vp8_header(buf)["dct_partitions"] == 1 << log2
        y, u, v = decode_vp8(buf)
        rows = [int(y[r * 16, 0]) for r in range(5)]
        assert len(set(rows)) == 5, rows
        # the first MB of each row is flat (constant prediction +
        # constant residual); later columns accumulate the DC chain
        assert all((y[r * 16:r * 16 + 16, :16] == rows[r]).all()
                   for r in range(5))
        assert (u == 128).all() and (v == 128).all()
    # truncating the partition-size table raises the typed framing error
    buf = encode_vp8_rowpattern(64, 80, dct_partition_log2=3)
    hdr_end = 20 + (int.from_bytes(buf[20:23], "little") >> 5)
    with pytest.raises(WebpError):
        decode_vp8(buf[:hdr_end + 12])


@pytest.mark.skipif(not LW.available(), reason="no system libwebp")
def test_multipartition_frames_bit_exact_under_reference():
    """The reference DECODER accepts multi-partition frames even
    though its encoder never emits them: every synthesized frame
    decodes bit-identically under libwebp and this decoder, closing
    the one VP8 path real streams could not reach."""
    from map2db_spark.functions.vp8_decode import encode_vp8_rowpattern

    for log2 in range(4):
        for dims, vals in (((64, 80), [0, 1, 2, 3, 4]),
                           ((48, 128), [4, 2, 0, 3]),
                           ((17, 130), [1, 3])):
            buf = encode_vp8_rowpattern(
                dims[0], dims[1], dct_partition_log2=log2,
                row_values=vals, y_ac_qi=40 + 10 * log2,
            )
            ry, ru, rv = LW.decode_yuv(buf)
            y, u, v = decode_vp8(buf)
            assert np.array_equal(y, ry), (log2, dims)
            assert np.array_equal(u, ru), (log2, dims)
            assert np.array_equal(v, rv), (log2, dims)
