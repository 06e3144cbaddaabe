"""External TIFF verification oracle — a ctypes binding to the system
libtiff (when present), used ONLY by tests and verification queries to
prove real bit-parity for the from-scratch TIFF codec in
functions/tiff_codec.py (the same upgrade path round 6 established
with functions/libwebp_oracle.py for the VP8L codec).

The container ships libtiff.so.6 (4.5.0) as a runtime shared library.
Unlike libjpeg's struct+setjmp API (genuinely unreachable from ctypes
without headers), libtiff's classic interface is flat C calls over an
opaque TIFF* handle — TIFFOpen / TIFFSetField / TIFFWriteScanline /
TIFFReadScanline / TIFFClose — with one wrinkle: TIFFSetField /
TIFFGetField are varargs, which ctypes handles by passing explicitly
typed arguments (every vararg here is an int or an out-pointer, so no
ABI guessing about struct layouts is involved).  The API is file-based
(no in-memory open in the classic soname), so the oracle round-trips
through temp files; callers pass/receive plain bytes.

Everything stays OUT of data-plane hot paths; every entry point
degrades to ``available() == False`` when the library is absent
(import never fails).

Reference parity note: the reference pipeline (map2db.py) contains no
raster codecs; this module verifies the multimodal family that
extends it.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile

import numpy as np

_COMP_CODES = {"none": 1, "lzw": 5, "packbits": 32773}


class LibtiffUnavailable(RuntimeError):
    """Raised by oracle calls when no system libtiff could be loaded."""


_LIB = None
_TRIED = False

_SONAMES = ("libtiff.so.6", "libtiff.so.5", "libtiff.so", "libtiff.6.dylib")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = list(_SONAMES)
    found = ctypes.util.find_library("tiff")
    if found:
        names.insert(0, found)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.TIFFGetVersion.restype = ctypes.c_char_p
            lib.TIFFOpen.restype = ctypes.c_void_p
            lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.TIFFClose.restype = None
            lib.TIFFClose.argtypes = [ctypes.c_void_p]
            lib.TIFFSetField.restype = ctypes.c_int
            lib.TIFFGetField.restype = ctypes.c_int
            lib.TIFFWriteScanline.restype = ctypes.c_int
            lib.TIFFWriteScanline.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_uint32, ctypes.c_uint16,
            ]
            lib.TIFFReadScanline.restype = ctypes.c_int
            lib.TIFFReadScanline.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_uint32, ctypes.c_uint16,
            ]
            # tmsize_t (signed ssize_t) in libtiff >= 4.0
            lib.TIFFScanlineSize.restype = ctypes.c_ssize_t
            lib.TIFFScanlineSize.argtypes = [ctypes.c_void_p]
            # silence libtiff's stderr warning handler (deterministic
            # test output); NULL handler = suppress
            lib.TIFFSetWarningHandler.restype = ctypes.c_void_p
            lib.TIFFSetWarningHandler(None)
        except AttributeError:
            continue
        _LIB = lib
        break
    return _LIB


def available() -> bool:
    """True when a usable system libtiff was found and bound."""
    return _load() is not None


def version() -> str:
    """First line of TIFFGetVersion(), e.g. 'LIBTIFF, Version 4.5.0'."""
    lib = _load()
    if lib is None:
        raise LibtiffUnavailable("no system libtiff")
    return lib.TIFFGetVersion().decode().split("\n")[0]


def _set_int(lib, tif, tag: int, value: int) -> None:
    if not lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                            ctypes.c_int(value)):
        raise ValueError(f"libtiff: TIFFSetField({tag}) failed")


def encode(img: np.ndarray, compression: str = "none",
           rows_per_strip: int | None = None,
           predictor: bool = False) -> bytes:
    """Reference encode of an (h, w) or (h, w, 3|4) uint8 image via
    TIFFWriteScanline; returns the file bytes."""
    lib = _load()
    if lib is None:
        raise LibtiffUnavailable("no system libtiff")
    img = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if img.ndim == 2:
        h, w = img.shape
        spp = 1
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        h, w, spp = img.shape
    else:
        raise ValueError(f"expected (h,w) or (h,w,3|4), got {img.shape}")
    comp = _COMP_CODES[compression]
    rps = rows_per_strip or h
    fd, path = tempfile.mkstemp(suffix=".tif")
    os.close(fd)
    try:
        tif = lib.TIFFOpen(path.encode(), b"w")
        if not tif:
            raise ValueError("libtiff: TIFFOpen(w) failed")
        try:
            _set_int(lib, tif, 256, w)
            _set_int(lib, tif, 257, h)
            _set_int(lib, tif, 258, 8)
            _set_int(lib, tif, 259, comp)
            _set_int(lib, tif, 262, 1 if spp == 1 else 2)
            _set_int(lib, tif, 277, spp)
            _set_int(lib, tif, 278, rps)
            _set_int(lib, tif, 284, 1)
            if spp == 4:
                # ExtraSamples: count 1, pointer to uint16[1] = {2}
                extra = (ctypes.c_uint16 * 1)(2)
                if not lib.TIFFSetField(
                    ctypes.c_void_p(tif), ctypes.c_uint32(338),
                    ctypes.c_int(1), extra,
                ):
                    raise ValueError("libtiff: ExtraSamples failed")
            if predictor:
                _set_int(lib, tif, 317, 2)
            flat = img.reshape(h, w * spp)
            for y in range(h):
                buf = ctypes.create_string_buffer(
                    flat[y].tobytes(), w * spp
                )
                if lib.TIFFWriteScanline(tif, buf, y, 0) != 1:
                    raise ValueError(f"libtiff: write scanline {y} failed")
        finally:
            lib.TIFFClose(tif)
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


def decode(data: bytes) -> np.ndarray:
    """Reference decode via TIFFReadScanline to (h, w) or (h, w, spp)
    uint8 — raw sample bytes, same shape convention as
    tiff_codec.decode_tiff."""
    lib = _load()
    if lib is None:
        raise LibtiffUnavailable("no system libtiff")
    fd, path = tempfile.mkstemp(suffix=".tif")
    try:
        os.write(fd, data)
        os.close(fd)
        tif = lib.TIFFOpen(path.encode(), b"r")
        if not tif:
            raise ValueError("libtiff: TIFFOpen(r) failed")
        try:
            w = ctypes.c_uint32()
            h = ctypes.c_uint32()
            spp = ctypes.c_uint16(1)
            if not lib.TIFFGetField(ctypes.c_void_p(tif),
                                    ctypes.c_uint32(256), ctypes.byref(w)):
                raise ValueError("libtiff: no ImageWidth")
            if not lib.TIFFGetField(ctypes.c_void_p(tif),
                                    ctypes.c_uint32(257), ctypes.byref(h)):
                raise ValueError("libtiff: no ImageLength")
            lib.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(277),
                             ctypes.byref(spp))
            # the uint8 output contract below assumes 8-bit samples;
            # a 16/32-bit file would otherwise make libtiff write past
            # a width*spp buffer (heap corruption, not an exception)
            bits = ctypes.c_uint16(8)
            lib.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(258),
                             ctypes.byref(bits))
            if bits.value != 8:
                raise ValueError(
                    f"libtiff oracle: BitsPerSample {bits.value} outside "
                    "the 8-bit decode contract"
                )
            hh, ww, s = h.value, w.value, spp.value
            # size the row buffer by libtiff's own accounting, not by
            # an assumed layout — belt for the check above
            row_bytes = int(lib.TIFFScanlineSize(ctypes.c_void_p(tif)))
            if row_bytes < ww * s:
                raise ValueError(
                    f"libtiff: scanline size {row_bytes} < {ww * s}"
                )
            out = np.empty((hh, ww * s), dtype=np.uint8)
            buf = ctypes.create_string_buffer(row_bytes)
            for y in range(hh):
                if lib.TIFFReadScanline(tif, buf, y, 0) != 1:
                    raise ValueError(f"libtiff: read scanline {y} failed")
                out[y] = np.frombuffer(buf.raw[: ww * s], np.uint8)
        finally:
            lib.TIFFClose(tif)
        return out.reshape(hh, ww) if s == 1 else out.reshape(hh, ww, s)
    finally:
        os.unlink(path)
