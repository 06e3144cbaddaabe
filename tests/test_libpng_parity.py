"""External bit-parity for the from-scratch PNG codec against the
system libpng16 via the simplified API (functions/libpng_oracle.py).

Upgrades the PNG verification story from "self-round-trip + spec
vectors" to the libwebp-style two-direction external check:

- OUR streams (filter-cycling encoder, both the stdlib-zlib and the
  from-scratch DEFLATE compressor paths) decode to the exact source
  pixels under the REAL libpng;
- REAL libpng-encoded streams (adaptive per-row filtering — filters
  chosen by the reference encoder, not by us) decode bit-exactly
  under OUR decoder.

Every test skips when no system libpng is loadable.
"""

from __future__ import annotations

import numpy as np
import pytest

from map2db_spark.functions import libpng_oracle as LP
from map2db_spark.functions.deflate_codec import zlib_compress
from map2db_spark.functions.png import decode_png, encode_png

pytestmark = pytest.mark.skipif(
    not LP.available(), reason="no system libpng in this environment"
)


def _corpus() -> dict[str, np.ndarray]:
    """Channel layouts x content classes the filters react to:
    noise (filter None/Sub win), gradients (Up/Average/Paeth win),
    flat runs, thin/tall degenerates."""
    rng = np.random.default_rng(20260815)
    grad = (np.add.outer(np.arange(48), np.arange(64)) % 256).astype(
        np.uint8
    )
    return {
        "rgba_noise": rng.integers(0, 256, (23, 17, 4), np.uint8),
        "rgb_noise": rng.integers(0, 256, (31, 29, 3), np.uint8),
        "gray_noise": rng.integers(0, 256, (16, 40), np.uint8),
        "ga_noise": rng.integers(0, 256, (12, 12, 2), np.uint8),
        "rgb_grad": np.stack([grad, grad[:, ::-1], 255 - grad],
                             axis=-1),
        "gray_grad": grad,
        "rgba_flat": np.full((20, 30, 4), 200, np.uint8),
        "one": rng.integers(0, 256, (1, 1, 3), np.uint8),
        "thin": rng.integers(0, 256, (1, 300, 4), np.uint8),
        "tall": rng.integers(0, 256, (300, 1, 2), np.uint8),
    }


def _as3d(img: np.ndarray) -> np.ndarray:
    return img[:, :, None] if img.ndim == 2 else img


def test_our_streams_decode_under_reference():
    """Every corpus image through OUR encoder — stdlib zlib AND the
    from-scratch DEFLATE compressor — decodes to the exact source
    under the real libpng (certifying the filter bytes, the IDAT
    framing AND deflate_codec's streams through a second external
    consumer)."""
    for name, img in _corpus().items():
        for compress in (None, zlib_compress):
            data = encode_png(img, compress=compress)
            dec = LP.decode(data)
            assert np.array_equal(dec, _as3d(img)), (name, compress)


def test_reference_streams_decode_under_ours():
    """Real libpng streams (reference-chosen adaptive filters) decode
    bit-exactly under OUR decoder on every channel layout."""
    for name, img in _corpus().items():
        data = LP.encode(img)
        dec = decode_png(data)
        assert np.array_equal(dec, _as3d(img)), name


def test_reference_stream_corruption_typed_errors_only():
    """Bit flips and truncations over REAL libpng streams keep the
    decoder's typed contract (ValueError or a decoded array, never a
    raw zlib/struct error) — extends the self-stream fuzz campaigns
    to the reference encoder's bit patterns."""
    import random

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (24, 32, 3), np.uint8)
    enc = LP.encode(img)
    random.seed(31)
    for _ in range(400):
        b = bytearray(enc)
        for _k in range(random.randint(1, 3)):
            i = random.randrange(8, len(b))
            b[i] ^= 1 << random.randrange(8)
        try:
            out = decode_png(bytes(b))
            assert out.ndim == 3
        except ValueError:
            pass
    for cut in range(1, len(enc) - 1, 5):
        try:
            decode_png(enc[:cut])
        except ValueError:
            pass
