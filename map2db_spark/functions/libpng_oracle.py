"""External PNG verification oracle — a ctypes binding to the system
libpng16 (when present), used ONLY by tests and verification queries
to prove real bit-parity for the from-scratch PNG codec in
functions/png.py (and, through its pluggable compressor hook, the
from-scratch DEFLATE encoder in functions/deflate_codec.py).

libpng's classic API is struct+setjmp (unreachable from ctypes
without headers, same adjudication as libjpeg), but since 1.6 it
ships the SIMPLIFIED API — ``png_image_begin_read_from_memory`` /
``png_image_finish_read`` / ``png_image_write_to_memory`` — a flat
fixed-layout struct with no callbacks, exactly the shape of opening
libwebp's one-call API (functions/libwebp_oracle.py, the precedent
this module follows).

Everything stays OUT of data-plane hot paths: the engine's PNG codec
remains pure-Python/numpy; this module exists so correctness claims
are externally checkable, and every entry point degrades to
``available() == False`` when the library is absent (import never
fails).

Reference parity note: the reference pipeline (map2db.py) contains no
raster codecs; this module verifies the multimodal family that
extends it (same relationship as functions/png.py itself).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np


class LibpngUnavailable(RuntimeError):
    """Raised by oracle calls when no system libpng could be loaded."""


# png_image (png.h, PNG_IMAGE_VERSION 1): fixed flat layout
class _PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


_PNG_IMAGE_VERSION = 1
# format bits: FLAG_ALPHA = 1, FLAG_COLOR = 2
_FORMATS = {1: 0, 2: 1, 3: 2, 4: 3}  # channels -> png_image format

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = ["libpng16.so.16", "libpng16.so", "libpng.so"]
    found = ctypes.util.find_library("png16") or ctypes.util.find_library(
        "png"
    )
    if found:
        names.insert(0, found)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.png_image_begin_read_from_memory.restype = ctypes.c_int
            lib.png_image_begin_read_from_memory.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_char_p, ctypes.c_size_t,
            ]
            lib.png_image_finish_read.restype = ctypes.c_int
            lib.png_image_finish_read.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_void_p,
            ]
            lib.png_image_write_to_memory.restype = ctypes.c_int
            lib.png_image_write_to_memory.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
            ]
            lib.png_image_free.restype = None
            lib.png_image_free.argtypes = [ctypes.POINTER(_PngImage)]
        except AttributeError:
            continue
        _LIB = lib
        break
    return _LIB


def available() -> bool:
    """True when a usable system libpng16 was found and bound."""
    return _load() is not None


def decode(data: bytes) -> np.ndarray:
    """Reference decode to an (h, w, c) uint8 array in the stream's
    own channel count (gray / gray+alpha / RGB / RGBA); raises
    ValueError on failure."""
    lib = _load()
    if lib is None:
        raise LibpngUnavailable("no system libpng16")
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    if not lib.png_image_begin_read_from_memory(
        ctypes.byref(img), data, len(data)
    ):
        raise ValueError(
            f"libpng: begin_read failed: {img.message.decode()!r}"
        )
    # keep the stream's native 8-bit channel layout
    ch = 1 + (1 if img.format & 1 else 0) + (2 if img.format & 2 else 0)
    img.format &= 3  # strip LINEAR/COLORMAP requests, keep 8-bit
    buf = np.empty((img.height, img.width, ch), np.uint8)
    if not lib.png_image_finish_read(
        ctypes.byref(img), None,
        buf.ctypes.data_as(ctypes.c_void_p), 0, None,
    ):
        lib.png_image_free(ctypes.byref(img))
        raise ValueError(
            f"libpng: finish_read failed: {img.message.decode()!r}"
        )
    return buf


def encode(pixels: np.ndarray) -> bytes:
    """Reference encode of an (h, w) or (h, w, c) uint8 array (c in
    1/2/3/4) to a PNG stream via png_image_write_to_memory (two-call
    size-then-fill protocol); raises ValueError on failure."""
    lib = _load()
    if lib is None:
        raise LibpngUnavailable("no system libpng16")
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch not in _FORMATS:
        raise ValueError(f"unsupported channel count {ch}")
    px = np.ascontiguousarray(px)
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    img.width, img.height = w, h
    img.format = _FORMATS[ch]
    size = ctypes.c_size_t(0)
    if not lib.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0,
        px.ctypes.data_as(ctypes.c_void_p), 0, None,
    ):
        raise ValueError(
            f"libpng: write sizing failed: {img.message.decode()!r}"
        )
    out = ctypes.create_string_buffer(size.value)
    if not lib.png_image_write_to_memory(
        ctypes.byref(img), out, ctypes.byref(size), 0,
        px.ctypes.data_as(ctypes.c_void_p), 0, None,
    ):
        raise ValueError(
            f"libpng: write failed: {img.message.decode()!r}"
        )
    return out.raw[: size.value]
