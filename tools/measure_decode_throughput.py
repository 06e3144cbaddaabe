#!/usr/bin/env python3
"""Measure single-core image-decode throughput for BOTH dispatch paths
(BASELINE.md table; VERDICT r6 #1): the native ctypes route
(libpng / libwebp / libtiff / giflib / the compiled libjpeg shim) vs
the from-scratch stdlib+numpy codecs, on the same payloads.

MB/s is DECODED output bytes per second (pixels produced, the number
that scales an ingest cluster), single-threaded, min-of-three timed
repetitions after a warm-up pass.  As of r8 every format has a native
route (JPEG via the session-compiled libjpeg shim,
functions/libjpeg_oracle.py).

Usage: python3 tools/measure_decode_throughput.py [side_px]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _bench(fn, payloads, reps=3):
    fn(payloads[0])  # warm (imports, lib load, JIT-ish caches)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for p in payloads:
            fn(p)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    w, h = side, side * 3 // 4
    n_payloads = 24
    rng = np.random.default_rng(1)

    from map2db_spark.functions import giflib_oracle as LG
    from map2db_spark.functions import libtiff_oracle as LT
    from map2db_spark.functions import libwebp_oracle as LW
    from map2db_spark.functions import multimodal as M
    from map2db_spark.functions.gif_codec import encode_gif
    from map2db_spark.functions.jpeg_codec import encode_jpeg_baseline
    from map2db_spark.functions.png import encode_png
    from map2db_spark.functions.tiff_codec import encode_tiff

    assert LW.available() and LT.available() and LG.available()

    # photographic-ish content (smooth + noise) so entropy coders do
    # real work; pure noise under-states PNG/VP8L decode cost, flat
    # content over-states it
    base = np.add.outer(np.arange(h), np.arange(w)) % 256
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)

    def img(seed, ch):
        noise = rng.integers(0, 32, (h, w, ch))
        return ((base[:, :, None] + noise + seed * 17) % 256).astype(np.uint8)

    cases = {}
    cases["png"] = [encode_png(img(s, 3)) for s in range(n_payloads)]
    rgba = [
        np.ascontiguousarray(
            np.dstack([img(s, 3), np.full((h, w, 1), 255, np.uint8)])
        )
        for s in range(n_payloads)
    ]
    cases["webp_lossless"] = [LW.encode_lossless_rgba(a) for a in rgba]
    cases["webp_lossy"] = [LW.encode_rgba(a, quality=75.0) for a in rgba]
    cases["tiff_lzw"] = [
        encode_tiff(img(s, 3), compression="lzw") for s in range(n_payloads)
    ]
    cases["gif"] = [
        encode_gif(
            rng.integers(0, 16, (h, w), dtype=np.uint8), pal
        )
        for _ in range(n_payloads)
    ]
    cases["jpeg"] = [
        encode_jpeg_baseline(img(s, 3)) for s in range(n_payloads)
    ]

    out_bytes = {
        "png": h * w * 3, "webp_lossless": h * w * 4,
        "webp_lossy": h * w * 4, "tiff_lzw": h * w * 3,
        "gif": h * w * 3, "jpeg": h * w * 3,
    }

    print(f"payload: {w}x{h}, {n_payloads} images/format, "
          "MB/s = decoded bytes / wall (single core, min of 3)")
    print(f"{'format':<14} {'native MB/s':>12} {'pure MB/s':>12} {'ratio':>8}")
    for fmt, payloads in cases.items():
        total = out_bytes[fmt] * n_payloads / 1e6
        sniff = M.sniff_image_format(payloads[0])
        tn = _bench(lambda p, f=sniff: M._decode_native(p, f), payloads)
        tp = _bench(lambda p, f=sniff: M._decode_pure(p, f), payloads)
        print(
            f"{fmt:<14} {total / tn:>12.2f} {total / tp:>12.2f} "
            f"{tp / tn:>7.0f}x"
        )


if __name__ == "__main__":
    main()
