"""WebP-lossless (VP8L) pixel codec for the SIMPLE-PREFIX-CODE subset,
stdlib + numpy only — the follow-up to functions/jpeg_codec.py that
shrinks the multimodal pixel-decode stub further.

VP8L (the lossless WebP bitstream, public container/bitstream spec
published by the WebP project) entropy-codes ARGB pixels with five
prefix codes (green+length+cache, red, blue, alpha, distance) over an
LSB-first bitstream.  A prefix code may be stored in the SIMPLE form:
one or two symbols, written literally — one symbol costs zero bits
per use, two symbols cost one bit per use.  Images whose channels
each take at most two distinct values (solid fills, two-tone
checkers, masks, chart backgrounds — a real slice of web imagery)
therefore round-trip through GENUINE spec-layout bitstreams with no
Huffman table machinery at all.

Honest envelope (everything else raises, never mis-decodes):

- transforms (predictor/color/subtract-green/palette): NotImplemented
- color cache, meta prefix images (multiple groups): NotImplemented
- normal (code-length-coded) prefix codes: NotImplemented
- LZ77 backward references (green symbol >= 256): NotImplemented
- lossy VP8 chunks: NotImplemented (needs a boolean-arithmetic codec)

Like the JPEG codec (and the G7 GEOS-parity note), bit-parity against
an external reference decoder is container-blocked — no WebP library
is installed — so verification is: spec-layout construction on the
encode side, exact round-trip on the decode side, and closed-form
oracle checks over the emitted pixel statistics (m_webp_pixels).

Container framing (RIFF) matches functions/webp.py's walker, so
shell-encoded metadata fixtures and these pixel fixtures are parsed
by one header path.
"""

from __future__ import annotations

import struct

import numpy as np

from map2db_spark.functions.webp import WebpError


class _BitWriter:
    """LSB-first bit packing (VP8L bit order)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, nbits: int) -> int:
        while self.nbits < nbits:
            if self.pos >= len(self.buf):
                raise WebpError("truncated VP8L bitstream")
            self.acc |= self.buf[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << nbits) - 1)
        self.acc >>= nbits
        self.nbits -= nbits
        return v


def _write_simple_code(w: _BitWriter, symbols: list[int]) -> None:
    """Simple prefix-code form: 1-bit flag, count-1, width flag,
    then the literal symbol(s).  Symbol order defines the codes
    (first symbol <- bit 0)."""
    if not 1 <= len(symbols) <= 2:
        raise WebpError("simple code needs 1 or 2 symbols")
    w.write(1, 1)  # simple form
    w.write(len(symbols) - 1, 1)
    first_8bit = 1 if symbols[0] > 1 else 0
    w.write(first_8bit, 1)
    w.write(symbols[0], 8 if first_8bit else 1)
    if len(symbols) == 2:
        w.write(symbols[1], 8)


def _read_simple_code(r: _BitReader) -> list[int]:
    if r.read(1) != 1:
        raise NotImplementedError(
            "normal (code-length-coded) VP8L prefix codes not supported — "
            "simple-code subset only"
        )
    n = r.read(1) + 1
    first_8bit = r.read(1)
    syms = [r.read(8 if first_8bit else 1)]
    if n == 2:
        syms.append(r.read(8))
    return syms


def _channel_symbols(plane: np.ndarray) -> list[int]:
    vals = sorted(int(v) for v in np.unique(plane))
    if len(vals) > 2:
        raise WebpError(
            f"simple-code VP8L encoder needs <= 2 distinct values per "
            f"channel, got {len(vals)}"
        )
    return vals


def encode_vp8l_simple(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w, 4) RGBA uint8 image whose
    channels each hold at most two distinct values as a real VP8L
    WebP file (RIFF + VP8L chunk, spec bit layout)."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise WebpError(f"expected (h, w, 3|4) image, got {img.shape}")
    h, wd = img.shape[:2]
    if not (0 < wd <= (1 << 14) and 0 < h <= (1 << 14)):
        raise WebpError(f"dims out of 14-bit range: {wd}x{h}")
    if img.shape[2] == 3:
        rgba = np.concatenate(
            [img, np.full((h, wd, 1), 255, dtype=np.uint8)], axis=2
        )
    else:
        rgba = img
    planes = {c: rgba[:, :, i] for i, c in enumerate("rgba")}
    syms = {c: _channel_symbols(p) for c, p in planes.items()}

    w = _BitWriter()
    w.write(wd - 1, 14)
    w.write(h - 1, 14)
    w.write(0, 1)  # alpha-used hint (informational)
    w.write(0, 3)  # version
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no color cache
    w.write(0, 1)  # no meta prefix image (single code group)
    # five prefix codes: green(+len+cache), red, blue, alpha, distance
    _write_simple_code(w, syms["g"])
    _write_simple_code(w, syms["r"])
    _write_simple_code(w, syms["b"])
    _write_simple_code(w, syms["a"])
    _write_simple_code(w, [0])  # distance code: defined but never used
    # pixels, row-major: green, red, blue, alpha per pixel — a
    # 1-symbol code costs zero bits, a 2-symbol code one bit
    idx = {
        c: {v: i for i, v in enumerate(vals)} for c, vals in syms.items()
    }
    for y in range(h):
        for x in range(wd):
            for c in "grba":
                vals = syms[c]
                if len(vals) == 2:
                    w.write(idx[c][int(planes[c][y, x])], 1)
    body = bytes([0x2F]) + w.flush()

    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_vp8l_simple(buf: bytes) -> np.ndarray:
    """Decode a VP8L WebP file within the simple-code subset to an
    (h, w, 4) RGBA uint8 array.  Raises WebpError on malformed input
    and NotImplementedError outside the subset (transforms, color
    cache, meta prefix images, normal codes, LZ77, lossy VP8)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise WebpError("bad magic: not a WebP container")
    pos = 12
    payload = None
    while pos + 8 <= len(buf):
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            payload = body
            break
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 pixel decode not supported (needs a "
                "boolean-arithmetic codec)"
            )
        pos += 8 + size + (size % 2)
    if payload is None:
        raise WebpError("no VP8L chunk")
    if not payload or payload[0] != 0x2F:
        raise WebpError("bad VP8L signature")
    r = _BitReader(payload[1:])
    wd = r.read(14) + 1
    h = r.read(14) + 1
    r.read(1)  # alpha hint
    if r.read(3) != 0:
        raise WebpError("unknown VP8L version")
    if r.read(1) != 0:
        raise NotImplementedError("VP8L transforms not supported")
    if r.read(1) != 0:
        raise NotImplementedError("VP8L color cache not supported")
    if r.read(1) != 0:
        raise NotImplementedError("VP8L meta prefix images not supported")
    green = _read_simple_code(r)
    red = _read_simple_code(r)
    blue = _read_simple_code(r)
    alpha = _read_simple_code(r)
    _read_simple_code(r)  # distance code (unused in literal streams)
    if any(s >= 256 for s in green):
        raise NotImplementedError(
            "VP8L LZ77/color-cache symbols not supported — literal subset"
        )

    def read_sym(vals: list[int]) -> int:
        return vals[r.read(1)] if len(vals) == 2 else vals[0]

    out = np.empty((h, wd, 4), dtype=np.uint8)
    for y in range(h):
        for x in range(wd):
            g = read_sym(green)
            out[y, x, 1] = g
            out[y, x, 0] = read_sym(red)
            out[y, x, 2] = read_sym(blue)
            out[y, x, 3] = read_sym(alpha)
    return out
