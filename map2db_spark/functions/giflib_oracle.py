"""External GIF verification oracle — a ctypes binding to the system
giflib (when present), used ONLY by tests and verification queries to
prove real bit-parity for the from-scratch GIF codec in
functions/gif_codec.py (the same upgrade path as
functions/libwebp_oracle.py and functions/libtiff_oracle.py).

The container ships libgif.so.7 (giflib 5.2).  Decode uses the
struct-walking API (DGifOpenFileName + DGifSlurp over the documented
public GifFileType/SavedImage layouts from gif_lib.h — fixed, stable
across the 5.x series and sanity-checked at load time by decoding a
known fixture); encode uses the flat call sequence EGifOpenFileName →
EGifPutScreenDesc → EGifPutImageDesc → EGifPutLine per row →
EGifCloseFile, which involves no struct construction beyond the
ColorMapObject giflib itself builds via GifMakeMapObject.

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


class GiflibUnavailable(RuntimeError):
    """Raised by oracle calls when no system giflib could be loaded."""


# --- public struct layouts from gif_lib.h (giflib 5.x) ---------------------


class _GifColorType(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte),
                ("Blue", ctypes.c_ubyte)]


class _ColorMapObject(ctypes.Structure):
    _fields_ = [("ColorCount", ctypes.c_int),
                ("BitsPerPixel", ctypes.c_int),
                ("SortFlag", ctypes.c_bool),
                ("Colors", ctypes.POINTER(_GifColorType))]


class _GifImageDesc(ctypes.Structure):
    _fields_ = [("Left", ctypes.c_int), ("Top", ctypes.c_int),
                ("Width", ctypes.c_int), ("Height", ctypes.c_int),
                ("Interlace", ctypes.c_bool),
                ("ColorMap", ctypes.POINTER(_ColorMapObject))]


class _ExtensionBlock(ctypes.Structure):
    _fields_ = [("ByteCount", ctypes.c_int),
                ("Bytes", ctypes.POINTER(ctypes.c_ubyte)),
                ("Function", ctypes.c_int)]


class _SavedImage(ctypes.Structure):
    _fields_ = [("ImageDesc", _GifImageDesc),
                ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.POINTER(_ExtensionBlock))]


class _GifFileType(ctypes.Structure):
    _fields_ = [("SWidth", ctypes.c_int), ("SHeight", ctypes.c_int),
                ("SColorResolution", ctypes.c_int),
                ("SBackGroundColor", ctypes.c_int),
                ("AspectByte", ctypes.c_ubyte),
                ("SColorMap", ctypes.POINTER(_ColorMapObject)),
                ("ImageCount", ctypes.c_int),
                ("Image", _GifImageDesc),
                ("SavedImages", ctypes.POINTER(_SavedImage)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.POINTER(_ExtensionBlock)),
                ("Error", ctypes.c_int),
                ("UserData", ctypes.c_void_p),
                ("Private", ctypes.c_void_p)]


_LIB = None
_TRIED = False

_SONAMES = ("libgif.so.7", "libgif.so", "libgif.7.dylib")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = list(_SONAMES)
    found = ctypes.util.find_library("gif")
    if found:
        names.insert(0, found)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            P = ctypes.POINTER(_GifFileType)
            lib.DGifOpenFileName.restype = P
            lib.DGifOpenFileName.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
            lib.DGifSlurp.restype = ctypes.c_int
            lib.DGifSlurp.argtypes = [P]
            lib.DGifCloseFile.restype = ctypes.c_int
            lib.DGifCloseFile.argtypes = [
                P, ctypes.POINTER(ctypes.c_int)]
            lib.EGifOpenFileName.restype = P
            lib.EGifOpenFileName.argtypes = [
                ctypes.c_char_p, ctypes.c_bool,
                ctypes.POINTER(ctypes.c_int)]
            lib.EGifPutScreenDesc.restype = ctypes.c_int
            lib.EGifPutScreenDesc.argtypes = [
                P, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(_ColorMapObject)]
            lib.EGifPutImageDesc.restype = ctypes.c_int
            lib.EGifPutImageDesc.argtypes = [
                P, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_bool, ctypes.POINTER(_ColorMapObject)]
            lib.EGifPutLine.restype = ctypes.c_int
            lib.EGifPutLine.argtypes = [
                P, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
            lib.EGifCloseFile.restype = ctypes.c_int
            lib.EGifCloseFile.argtypes = [
                P, ctypes.POINTER(ctypes.c_int)]
            lib.GifMakeMapObject.restype = ctypes.POINTER(_ColorMapObject)
            lib.GifMakeMapObject.argtypes = [
                ctypes.c_int, ctypes.POINTER(_GifColorType)]
            lib.GifFreeMapObject.restype = None
            lib.GifFreeMapObject.argtypes = [
                ctypes.POINTER(_ColorMapObject)]
        except AttributeError:
            continue
        if _selfcheck(lib):
            _LIB = lib
            return _LIB
    return None


def _selfcheck(lib) -> bool:
    """Decode a tiny hand-assembled 2x1 GIF and confirm the struct
    layout yields the right dims/pixels — guards against a gif_lib.h
    layout drift silently corrupting every read."""
    import struct as _s

    # 2x1, 2-color global table, pixels [1, 0]
    data = (b"GIF87a" + _s.pack("<HHBBB", 2, 1, 0x80, 0, 0)
            + bytes([0, 0, 0, 255, 255, 255])
            + b"\x2c" + _s.pack("<HHHHB", 0, 0, 2, 1, 0)
            + bytes([2, 2, 0x0C, 0x0A])  # min=2; codes: clear,1,0,eoi
            + b"\x00\x3b")
    fd, path = tempfile.mkstemp(suffix=".gif")
    try:
        os.write(fd, data)
        os.close(fd)
        err = ctypes.c_int(0)
        f = lib.DGifOpenFileName(path.encode(), ctypes.byref(err))
        if not f:
            return False
        try:
            if lib.DGifSlurp(f) != 1:
                return False
            g = f.contents
            if (g.SWidth, g.SHeight, g.ImageCount) != (2, 1, 1):
                return False
            img = g.SavedImages[0]
            if (img.ImageDesc.Width, img.ImageDesc.Height) != (2, 1):
                return False
            px = bytes(img.RasterBits[0:2])
            return px == b"\x01\x00"
        finally:
            lib.DGifCloseFile(f, ctypes.byref(err))
    finally:
        os.unlink(path)


def available() -> bool:
    return _load() is not None


def version_selfchecked() -> bool:
    """True when the loaded giflib passed the layout self-check (always
    the case when available() — kept separate for test clarity)."""
    return available()


def _prewalk_frames(data: bytes) -> tuple[int, int, int, int]:
    """Header-level walk of the GIF block structure — NO LZW decode,
    no allocation beyond the input bytes: returns (frame_count,
    screen_w, screen_h, pixel_charge).  Sub-blocks are skipped by
    their length bytes, so a many-tiny-frames bomb is counted in
    O(stream bytes) BEFORE DGifSlurp allocates every frame in C memory
    (ADVICE r7: the post-slurp check bounded only the numpy
    compositing).  pixel_charge accumulates per-frame
    max(local_w*local_h, screen_w*screen_h) — DGifSlurp mallocs each
    frame at its LOCAL descriptor size, so a 1x1 screen with 65535^2
    local frames must charge the local size (ADVICE r8), while the
    compositing loop allocates at screen size, hence the max.
    Malformed block bytes raise ValueError; giflib itself remains the
    authority on whether the stream decodes."""
    if len(data) < 13 or data[:4] != b"GIF8":
        raise ValueError("giflib: not a GIF stream")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    frames = 0
    charge = 0
    screen_px = max(sw * sh, 1)
    n = len(data)
    while pos < n:
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-blocks
            pos += 2
            while pos < n and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > n:
                raise ValueError("giflib: truncated image descriptor")
            lw = int.from_bytes(data[pos + 5:pos + 7], "little")
            lh = int.from_bytes(data[pos + 7:pos + 9], "little")
            charge += max(lw * lh, screen_px)
            lflags = data[pos + 9]
            pos += 10
            if lflags & 0x80:  # local color table
                pos += 3 * (2 << (lflags & 0x07))
            pos += 1  # LZW minimum code size
            while pos < n and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            frames += 1
        else:
            raise ValueError(
                f"giflib: unknown block 0x{block:02x} in pre-walk"
            )
    return frames, sw, sh, charge


def decode(gif_bytes: bytes, max_pixels: int = 1 << 24):
    """GIF bytes -> (frames, palette) via REAL giflib: list of HxW
    uint8 index arrays (frames composited at their offsets; interlaced
    rasters arrive already de-interlaced because DGifSlurp walks
    InterlacedOffset/Jumps internally) and the global palette Nx3.

    max_pixels caps the TOTAL output (frames x logical screen),
    mirroring gif_codec.decode_gif's cumulative rail — the screen
    descriptor alone can't bound an unbounded frame run.  The charge
    is applied TWICE: header-level (_prewalk_frames counts image
    descriptors before DGifSlurp, so the bomb never reaches giflib's
    per-frame C allocation — ADVICE r7) and again post-slurp against
    giflib's own ImageCount (defense in depth: the authority's count
    is what the compositing loop actually allocates from)."""
    lib = _load()
    if lib is None:
        raise GiflibUnavailable("no system giflib")
    frames_declared, pre_w, pre_h, pre_charge = _prewalk_frames(gif_bytes)
    if pre_charge > max_pixels:
        raise ValueError(
            f"giflib: {frames_declared} declared frames charging "
            f"{pre_charge} px (per-frame max of local descriptor and "
            f"{pre_w}x{pre_h} screen) exceeds max_pixels={max_pixels} "
            "(decompression-bomb rail, header-level pre-walk)"
        )
    fd, path = tempfile.mkstemp(suffix=".gif")
    try:
        os.write(fd, gif_bytes)
        os.close(fd)
        err = ctypes.c_int(0)
        f = lib.DGifOpenFileName(path.encode(), ctypes.byref(err))
        if not f:
            raise ValueError(f"giflib: open failed (error {err.value})")
        try:
            if lib.DGifSlurp(f) != 1:
                raise ValueError(
                    f"giflib: slurp failed (error {f.contents.Error})")
            g = f.contents
            sw, sh = g.SWidth, g.SHeight
            # Post-slurp defense in depth against the authority's own
            # counts: charge each frame at max(its ImageDesc size, the
            # screen) — the compositing loop below allocates at screen
            # size, the raw raster at ImageDesc size (ADVICE r8).
            slurp_charge = 0
            for i in range(g.ImageCount):
                d = g.SavedImages[i].ImageDesc
                slurp_charge += max(d.Width * d.Height, max(sw * sh, 1))
            if slurp_charge > max_pixels:
                raise ValueError(
                    f"giflib: {g.ImageCount} frames charging "
                    f"{slurp_charge} px (per-frame max of ImageDesc and "
                    f"{sw}x{sh} screen) exceeds max_pixels={max_pixels} "
                    "(decompression-bomb rail)"
                )
            pal = None
            if g.SColorMap:
                cm = g.SColorMap.contents
                pal = np.array(
                    [(cm.Colors[i].Red, cm.Colors[i].Green,
                      cm.Colors[i].Blue) for i in range(cm.ColorCount)],
                    dtype=np.uint8)
            frames = []
            for i in range(g.ImageCount):
                si = g.SavedImages[i]
                d = si.ImageDesc
                n = d.Width * d.Height
                raw = np.ctypeslib.as_array(si.RasterBits, shape=(n,))
                img = raw.reshape(d.Height, d.Width).copy()
                # DGifSlurp de-interlaces internally (giflib 5.x walks
                # InterlacedOffset/Jumps), so RasterBits is already in
                # display order — verified empirically in test_gif.py.
                if d.Left or d.Top or (d.Width, d.Height) != (sw, sh):
                    full = np.zeros((sh, sw), dtype=np.uint8)
                    full[d.Top:d.Top + d.Height,
                         d.Left:d.Left + d.Width] = img
                    img = full
                frames.append(img)
            return frames, pal
        finally:
            lib.DGifCloseFile(f, ctypes.byref(err))
    finally:
        os.unlink(path)


def encode(frames, palette: np.ndarray) -> bytes:
    """Index frames + Nx3 palette -> GIF bytes written by REAL giflib
    (EGifPutScreenDesc/ImageDesc/PutLine; non-interlaced)."""
    lib = _load()
    if lib is None:
        raise GiflibUnavailable("no system giflib")
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    pal = np.asarray(palette, dtype=np.uint8)
    n_colors = pal.shape[0]
    size = 2
    while size < n_colors:
        size *= 2
    colors = (_GifColorType * size)()
    for i in range(n_colors):
        colors[i].Red, colors[i].Green, colors[i].Blue = (
            int(pal[i, 0]), int(pal[i, 1]), int(pal[i, 2]))
    cmap = lib.GifMakeMapObject(size, colors)
    if not cmap:
        raise ValueError("giflib: GifMakeMapObject failed")
    h, w = frames[0].shape
    fd, path = tempfile.mkstemp(suffix=".gif")
    os.close(fd)
    try:
        err = ctypes.c_int(0)
        f = lib.EGifOpenFileName(path.encode(), False, ctypes.byref(err))
        if not f:
            lib.GifFreeMapObject(cmap)
            raise ValueError(f"giflib: encode open failed ({err.value})")
        ok = lib.EGifPutScreenDesc(f, w, h, 8, 0, cmap) == 1
        for fr in frames:
            ok = ok and lib.EGifPutImageDesc(
                f, 0, 0, w, h, False, None) == 1
            for y in range(h):
                row = fr[y]
                ptr = row.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
                ok = ok and lib.EGifPutLine(f, ptr, w) == 1
        closed = lib.EGifCloseFile(f, ctypes.byref(err)) == 1
        lib.GifFreeMapObject(cmap)
        if not (ok and closed):
            raise ValueError("giflib: encode failed")
        with open(path, "rb") as fh:
            return fh.read()
    finally:
        os.unlink(path)
