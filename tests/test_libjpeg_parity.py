"""External parity for the from-scratch JPEG codec against the system
libjpeg(-turbo) via the session-compiled shim
(functions/libjpeg_oracle.py).

Upgrades the JPEG verification story from "self-round-trip + spec
vectors" to the libwebp-style two-direction external check, on JPEG's
guaranteed-equal surface — QUANTIZED DCT COEFFICIENTS (T.81 mandates
the marker+entropy layer bit-exactly; IDCT rounding, chroma
upsampling, and color conversion are engine-defined, the same split as
lossy WebP's YUV-plane comparison):

- OUR streams (baseline 4:4:4/4:2:0/4:2:2, restart markers,
  progressive with successive approximation) yield bit-identical
  quantized coefficients under the REAL libjpeg's
  jpeg_read_coefficients and under OUR entropy decoder;
- REAL libjpeg-encoded streams (its own Huffman optimization choices,
  default quant tables across a quality sweep, progressive scan
  scripts from jpeg_simple_progression) decode to bit-identical
  coefficients under OUR decoder.

Pixels are the documented divergence channel: grayscale output differs
by at most 1 (IDCT rounding only — asserted); color output additionally
differs by the upsampler/color-conversion choice (not asserted beyond
shape).

Every test skips when the shim cannot be built (no gcc / headers /
library).
"""

from __future__ import annotations

import numpy as np
import pytest

from map2db_spark.functions import libjpeg_oracle as LJ
from map2db_spark.functions.jpeg_codec import (
    decode_jpeg_baseline,
    decode_jpeg_coefficients,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)

pytestmark = pytest.mark.skipif(
    not LJ.available(), reason="libjpeg shim unavailable"
)


def _corpus() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(20260815)
    grad = (np.add.outer(np.arange(40), np.arange(56)) % 256).astype(
        np.uint8
    )
    return {
        "rgb_noise": rng.integers(0, 256, (21, 17, 3), np.uint8),
        "rgb_grad": np.stack([grad, grad[:, ::-1], 255 - grad], axis=-1),
        "gray_noise": rng.integers(0, 256, (24, 19), np.uint8),
        "gray_flat": np.full((16, 16), 130, np.uint8),
        "odd_dims": rng.integers(0, 256, (13, 11, 3), np.uint8),
        "one": rng.integers(0, 256, (1, 1, 3), np.uint8),
    }


def _coef_equal(stream: bytes) -> bool:
    """The two coefficient readers agree bit-exactly on `stream`."""
    _w, _h, ours = decode_jpeg_coefficients(stream)
    ref = LJ.read_coefficients(stream)
    if len(ours) != len(ref):
        return False
    return all(
        o["hi"] == r["hi"]
        and o["vi"] == r["vi"]
        and np.array_equal(o["qtable"], r["qtable"])
        and np.array_equal(o["blocks"], r["blocks"])
        for o, r in zip(ours, ref)
    )


def test_our_streams_parse_identically_under_reference():
    """OUR encoder's streams — every subsampling layout, restart
    markers, progressive — yield the same quantized coefficients from
    libjpeg's entropy decoder as from ours."""
    for name, img in _corpus().items():
        if img.ndim == 3:
            for sub in ("444", "420", "422"):
                for ri in (0, 2):
                    s = encode_jpeg_baseline(
                        img, subsampling=sub, restart_interval=ri
                    )
                    assert _coef_equal(s), (name, sub, ri)
            assert _coef_equal(encode_jpeg_progressive(img)), name
        else:
            assert _coef_equal(encode_jpeg_baseline(img)), name


def test_reference_streams_decode_identically_under_ours():
    """REAL libjpeg streams (default 4:2:0 color layout, optimized
    Huffman decisions, progressive scan scripts, restart markers,
    quality sweep) decode to bit-identical coefficients under OUR
    decoder."""
    for name, img in _corpus().items():
        for prog in (False, True):
            for quality in (35, 75, 95):
                s = LJ.encode(
                    img, quality=quality, progressive=prog,
                    restart_interval=3 if quality == 75 else 0,
                )
                assert _coef_equal(s), (name, prog, quality)
                # and the pixel path accepts the stream
                px = decode_jpeg_baseline(s)
                assert px.shape[:2] == img.shape[:2]


def test_grayscale_pixels_within_idct_rounding():
    """With no upsampling/color step in play, native and pure pixel
    outputs differ only by IDCT rounding: |diff| <= 1."""
    for img in (
        _corpus()["gray_noise"],
        _corpus()["gray_flat"],
    ):
        for producer in (
            lambda im: encode_jpeg_baseline(im),
            lambda im: LJ.encode(im, quality=90),
        ):
            s = producer(img)
            native = LJ.decode(s)
            pure = decode_jpeg_baseline(s)
            assert native.shape == pure.shape
            diff = np.abs(native.astype(int) - pure.astype(int))
            assert int(diff.max()) <= 1


def test_native_decode_conventions_and_rails():
    """Native decode matches the family conventions: grayscale ->
    (h, w), RGB -> (h, w, 3); header-level max_pixels rail fires
    before allocation; malformed input is a typed ValueError."""
    import struct

    img = _corpus()["rgb_noise"]
    px = LJ.decode(encode_jpeg_baseline(img))
    assert px.shape == img.shape
    g = LJ.decode(encode_jpeg_baseline(img[:, :, 0]))
    assert g.shape == img.shape[:2]

    # rewrite a real stream's SOF dims to a 60000x60000 bomb shell
    s = bytearray(encode_jpeg_baseline(np.zeros((8, 8), np.uint8)))
    i = s.find(b"\xff\xc0")
    struct.pack_into(">HH", s, i + 5, 60000, 60000)
    with pytest.raises(ValueError, match="max_pixels"):
        LJ.decode(bytes(s))

    with pytest.raises(ValueError, match="libjpeg"):
        LJ.decode(b"\xff\xd8\xff\xee junk")


def test_coefficient_read_bomb_rail_header_only():
    """A tiny SOF shell declaring 60000x60000 must be rejected by
    read_coefficients BEFORE jpeg_read_coefficients decodes into
    libjpeg's virtual arrays (header-only rail, the family
    convention)."""
    import struct

    s = bytearray(encode_jpeg_baseline(np.zeros((8, 8), np.uint8)))
    i = s.find(b"\xff\xc0")
    struct.pack_into(">HH", s, i + 5, 60000, 60000)
    with pytest.raises(ValueError, match="max_pixels"):
        LJ.read_coefficients(bytes(s))


def test_shim_fuzz_typed_errors_never_crash():
    """Bit flips and truncations of valid streams through every shim
    entry point must either succeed or raise ValueError — never
    segfault the worker or leak a raw ctypes status (libjpeg errors
    longjmp through the shim's setjmp trampoline into a typed
    message).  400 trials per producer across baseline/progressive/
    restart streams."""
    import random

    rng = np.random.default_rng(11)
    pyr = random.Random(11)
    img = rng.integers(0, 256, (17, 13, 3), dtype=np.uint8)
    streams = [
        encode_jpeg_baseline(img, subsampling="420", restart_interval=2),
        encode_jpeg_progressive(img),
        LJ.encode(img, quality=60, progressive=True),
    ]
    for enc in streams:
        for _ in range(400):
            e = bytearray(enc)
            if pyr.random() < 0.5:
                for _k in range(pyr.randint(1, 4)):
                    i = pyr.randrange(0, len(e))
                    e[i] ^= 1 << pyr.randrange(8)
                data = bytes(e)
            else:
                data = bytes(e[: pyr.randrange(1, len(e))])
            for fn in (LJ.info, LJ.decode, LJ.read_coefficients):
                try:
                    fn(data)
                except ValueError:
                    pass
