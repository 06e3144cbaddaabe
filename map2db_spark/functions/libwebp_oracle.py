"""External WebP verification oracle — a ctypes binding to the
system libwebp (when present), used ONLY by tests and verification
queries to prove real bit-parity for the from-scratch VP8L codec in
functions/webp_vp8l.py and the VP8 header codec in functions/vp8.py.

Earlier rounds adjudicated external codec bit-parity as
container-blocked on the premise that no WebP library exists in the
container.  Round 6 found `libwebp.so.7` (libwebp 1.2.4, encoder AND
decoder, lossless and lossy) installed as a runtime shared library —
no headers or Python bindings, but the simple one-call API
(WebPDecodeRGBA / WebPEncodeLosslessRGBA / WebPEncodeRGBA /
WebPGetInfo) is flat C, so ctypes reaches it directly.  That upgrades
the VP8L verification story from "spec-layout construction +
self-round-trip" to: our encoder's streams decode bit-exactly under
the reference decoder, and the reference encoder's streams decode
bit-exactly under our decoder (tests/test_libwebp_parity.py).

Everything stays OUT of data-plane hot paths: the engine's codecs
remain pure-Python/numpy; this module exists so correctness claims
are externally checkable, and every entry point degrades to
``available() == False`` when the library is absent (import never
fails).

Reference parity note: the reference pipeline (map2db.py) contains no
raster codecs; this module verifies the multimodal family that
extends it (same relationship as functions/webp_vp8l.py itself).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np


class LibwebpUnavailable(RuntimeError):
    """Raised by oracle calls when no system libwebp could be loaded."""


_LIB = None
_TRIED = False

# Candidate sonames, most-specific first.  ABI note: the simple
# encode/decode calls used here are stable across every libwebp
# major in circulation (0.x .. 1.x all export them with identical
# signatures), so accepting any soname is safe.
_SONAMES = ("libwebp.so.7", "libwebp.so.6", "libwebp.so", "libwebp.7.dylib")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = list(_SONAMES)
    found = ctypes.util.find_library("webp")
    if found:
        names.insert(0, found)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPGetInfo.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p),
            ]
            lib.WebPEncodeRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
            ]
            lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
            lib.WebPDecodeYUV.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            lib.WebPGetDecoderVersion.restype = ctypes.c_int
        except AttributeError:
            continue
        _LIB = lib
        break
    return _LIB


def available() -> bool:
    """True when a usable system libwebp was found and bound."""
    return _load() is not None


def version() -> str:
    """Decoder version as 'major.minor.patch' (e.g. '1.2.4')."""
    lib = _load()
    if lib is None:
        raise LibwebpUnavailable("no system libwebp")
    v = lib.WebPGetDecoderVersion()
    return f"{(v >> 16) & 0xFF}.{(v >> 8) & 0xFF}.{v & 0xFF}"


def get_info(data: bytes) -> tuple[int, int]:
    """(width, height) per WebPGetInfo; raises on unparseable input."""
    lib = _load()
    if lib is None:
        raise LibwebpUnavailable("no system libwebp")
    w = ctypes.c_int()
    h = ctypes.c_int()
    if not lib.WebPGetInfo(data, len(data), ctypes.byref(w), ctypes.byref(h)):
        raise ValueError("libwebp: WebPGetInfo failed")
    return w.value, h.value


def decode_rgba(data: bytes) -> np.ndarray:
    """Reference decode to an (h, w, 4) RGBA uint8 array (lossless
    VP8L and lossy VP8 streams alike); raises ValueError on failure."""
    lib = _load()
    if lib is None:
        raise LibwebpUnavailable("no system libwebp")
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp: WebPDecodeRGBA failed")
    try:
        arr = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    finally:
        lib.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return arr


def decode_yuv(data: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference decode of a LOSSY (VP8) stream to its native YCbCr
    4:2:0 planes — (h, w) Y and (ceil(h/2), ceil(w/2)) U/V uint8
    arrays, cropped to the declared dims.  This is the plane-level
    ground truth for functions/vp8_decode.py: comparing here checks
    the full reconstruction (boolean decode, dequant, IDCT/WHT,
    intra prediction, loop filter) with no RGB-conversion or
    upsampling code in the comparison path."""
    lib = _load()
    if lib is None:
        raise LibwebpUnavailable("no system libwebp")
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)()
    v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not y:
        raise ValueError("libwebp: WebPDecodeYUV failed")
    try:
        uv_h = (h.value + 1) // 2
        uv_w = (w.value + 1) // 2
        yp = np.ctypeslib.as_array(
            y, shape=(h.value, stride.value)
        )[:, : w.value].copy()
        up = np.ctypeslib.as_array(
            u, shape=(uv_h, uv_stride.value)
        )[:, :uv_w].copy()
        vp = np.ctypeslib.as_array(
            v, shape=(uv_h, uv_stride.value)
        )[:, :uv_w].copy()
    finally:
        lib.WebPFree(ctypes.cast(y, ctypes.c_void_p))
    return yp, up, vp


def _as_rgba(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError(f"expected (h, w, 3|4) uint8 image, got {img.shape}")
    if img.shape[2] == 3:
        alpha = np.full(img.shape[:2] + (1,), 255, dtype=np.uint8)
        img = np.concatenate([img, alpha], axis=2)
    return np.ascontiguousarray(img.astype(np.uint8, copy=False))


def encode_lossless_rgba(img: np.ndarray) -> bytes:
    """Reference lossless (VP8L) encode of an (h, w, 3|4) uint8 image.

    Caveat carried into every parity test: the simple API runs with
    exact=0, so the encoder may rewrite RGB under fully-transparent
    pixels — compare round-trips against the reference DECODE of the
    stream, not against the pre-encode source, unless alpha is opaque.
    """
    lib = _load()
    if lib is None:
        raise LibwebpUnavailable("no system libwebp")
    rgba = _as_rgba(img)
    h, w = rgba.shape[:2]
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGBA(
        rgba.tobytes(), w, h, w * 4, ctypes.byref(out)
    )
    if not n:
        raise ValueError("libwebp: WebPEncodeLosslessRGBA failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)


_ENC_ABI = 0x020F  # libwebp 1.2.x encoder ABI (probed by tests)

_WRITER_FUNC = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_size_t,
    ctypes.c_void_p,
)


class _WebPConfig(ctypes.Structure):
    """libwebp 1.2.x WebPConfig (encode.h) — flat ints/floats only."""

    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int),
        ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int),
        ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int),
    ]


class _WebPPicture(ctypes.Structure):
    """libwebp 1.2.x WebPPicture (encode.h) with pads flattened."""

    _fields_ = [
        ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.c_void_p), ("u", ctypes.c_void_p),
        ("v", ctypes.c_void_p),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", _WRITER_FUNC), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int), ("extra_info", ctypes.c_void_p),
        ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
        ("pad6", ctypes.c_uint32 * 8),
        ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2),
    ]


def encode_rgba_advanced(img: np.ndarray, **config) -> bytes:
    """Reference lossy encode through the ADVANCED WebPEncode API so
    tests can reach bitstream features the simple API never emits:
    ``filter_type=0`` (the SIMPLE loop filter — note libwebp's config
    flag is inverted vs the bitstream bit), ``filter_sharpness``,
    ``segments=1`` (segmentation disabled), ``method=0`` (enables the
    mb_no_coeff_skip probability), ``autofilter``, arbitrary
    ``quality``.  Raises on encode failure; validates the config via
    WebPValidateConfig inside WebPEncode."""
    lib = _load()
    if lib is None:
        raise LibwebpUnavailable("no system libwebp")
    rgba = _as_rgba(img)
    h, w = rgba.shape[:2]
    cfg = _WebPConfig()
    quality = float(config.pop("quality", 75.0))
    if not lib.WebPConfigInitInternal(
        ctypes.byref(cfg), 0, ctypes.c_float(quality), _ENC_ABI
    ):
        raise ValueError("libwebp: WebPConfigInit failed (ABI mismatch?)")
    for k, v in config.items():
        if not hasattr(cfg, k):
            raise ValueError(f"unknown WebPConfig field {k!r}")
        setattr(cfg, k, v)
    pic = _WebPPicture()
    if not lib.WebPPictureInitInternal(ctypes.byref(pic), _ENC_ABI):
        raise ValueError("libwebp: WebPPictureInit failed")
    pic.width, pic.height, pic.use_argb = w, h, 1
    if not lib.WebPPictureImportRGBA(
        ctypes.byref(pic), rgba.tobytes(), w * 4
    ):
        raise ValueError("libwebp: WebPPictureImportRGBA failed")
    chunks: list[bytes] = []

    def _write(data, size, _ptr):
        chunks.append(ctypes.string_at(data, size))
        return 1

    writer = _WRITER_FUNC(_write)  # keep a ref alive through WebPEncode
    pic.writer = writer
    ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    err = pic.error_code
    lib.WebPPictureFree(ctypes.byref(pic))
    if not ok:
        raise ValueError(f"libwebp: WebPEncode failed (error {err})")
    return b"".join(chunks)


def encode_rgba(img: np.ndarray, quality: float = 75.0) -> bytes:
    """Reference lossy (VP8) encode — produces REAL RFC 6386 keyframe
    streams for verifying functions/vp8.py's header decoder."""
    lib = _load()
    if lib is None:
        raise LibwebpUnavailable("no system libwebp")
    rgba = _as_rgba(img)
    h, w = rgba.shape[:2]
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGBA(
        rgba.tobytes(), w, h, w * 4, ctypes.c_float(quality),
        ctypes.byref(out),
    )
    if not n:
        raise ValueError("libwebp: WebPEncodeRGBA failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)
