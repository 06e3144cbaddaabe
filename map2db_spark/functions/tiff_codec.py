"""TIFF baseline PIXEL codec — encoder + decoder from scratch,
stdlib + numpy only, for the multimodal binary-column family.

TIFF 6.0 (the 1992 Adobe spec, public) is the last major raster
container the engine lacked: a tag-directory format (IFDs) over
strip-organized sample data with per-strip compression.  Implemented
end to end here:

- container: classic TIFF, BOTH byte orders on decode ("II"
  little-endian and "MM" big-endian, magic 42), IFD entry walk with
  inline-vs-offset value resolution for BYTE/SHORT/LONG counts;
  encode emits little-endian with a single IFD;
- baseline tags: ImageWidth/ImageLength (256/257), BitsPerSample
  (258), Compression (259), PhotometricInterpretation (262),
  StripOffsets (273), SamplesPerPixel (277), RowsPerStrip (278),
  StripByteCounts (279), PlanarConfiguration (284), Predictor (317),
  ExtraSamples (338);
- pixel envelope: 8-bit samples, 1 (grayscale), 3 (RGB) or 4 (RGBA
  via ExtraSamples) samples per pixel, chunky planar config,
  multi-strip images (RowsPerStrip any value; last strip short);
- compression: none (1), TIFF-LZW (5) with the spec's MSB-first
  variable-width codes, early-change width bumps (next free code ==
  2^n, one before mathematically necessary), Clear (256) / EOI (257)
  handling and table rebuild — the encoder's streams are BYTE-
  IDENTICAL to libtiff 4.5.0's across width bumps and table resets —
  and PackBits (32773) with per-row packing on encode (spec: "pack
  each row separately");
- Predictor 2 (horizontal differencing per row per channel) under
  LZW, on both sides.

Everything outside that envelope raises typed errors, never
mis-decodes: tiled images, planar (separate) configuration, palette
color, bit depths other than 8, fill order 2, and other compressions
(CCITT, JPEG-in-TIFF, Deflate) raise NotImplementedError; malformed
containers raise TiffError.

Verification: exact self round-trip across the envelope matrix, AND
external bit-parity in BOTH directions against the system libtiff
4.5.0 (functions/libtiff_oracle.py, ctypes — same upgrade path round
6 established for libwebp): our streams read back scanline-exact
under libtiff, and libtiff-written files (all three compressions,
multi-strip, predictor) decode byte-identically under this decoder
(tests/test_tiff.py).  Driver rows: m_tiff_pixels (closed-form pixel
oracle), m_tiff_libtiff_parity (both-direction external parity).

Reference parity note: the reference pipeline (map2db.py) contains no
raster codecs; this module extends the multimodal family exactly as
functions/png.py, jpeg_codec.py and webp_vp8l.py do.
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    """Malformed or inconsistent TIFF container/stream."""


# IFD entry field types (TIFF 6.0 table): size in bytes per value
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_FILL_ORDER = 266
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_COLOR_MAP = 320
_TAG_EXTRA_SAMPLES = 338

_COMP_NONE = 1
_COMP_LZW = 5
_COMP_PACKBITS = 32773

_LZW_CLEAR = 256
_LZW_EOI = 257


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 section 9)
# ---------------------------------------------------------------------------


def _packbits_encode_row(row: bytes) -> bytes:
    """Pack one row: literal runs as (n-1, bytes), repeats of length
    >= 2 as (257-n, byte).  The spec's recommendation is followed:
    2-byte repeats interrupt a literal run only when 3+ long, which
    keeps worst-case expansion at 1/128."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append(257 - run)
            out.append(row[i])
            i = j
            continue
        # literal: extend until a 3+ repeat starts (or 128 cap)
        lit_start = i
        i += 1
        while i < n and i - lit_start < 128:
            # a 3+ repeat ends the literal; 2-byte repeats stay inside
            if i + 2 < n and row[i] == row[i + 1] == row[i + 2]:
                break
            i += 1
        out.append(i - lit_start - 1)
        out.extend(row[lit_start:i])
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Unpack a PackBits stream to exactly ``expected`` bytes."""
    out = bytearray()
    i = 0
    n = len(data)
    while len(out) < expected:
        if i >= n:
            raise TiffError("PackBits stream truncated")
        ctrl = data[i]
        i += 1
        if ctrl < 128:  # literal of ctrl+1 bytes
            if i + ctrl + 1 > n:
                raise TiffError("PackBits literal overruns stream")
            out.extend(data[i : i + ctrl + 1])
            i += ctrl + 1
        elif ctrl == 128:  # no-op
            continue
        else:  # repeat next byte 257-ctrl times
            if i >= n:
                raise TiffError("PackBits repeat overruns stream")
            out.extend(bytes([data[i]]) * (257 - ctrl))
            i += 1
    if len(out) != expected:
        raise TiffError(
            f"PackBits decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF-LZW (TIFF 6.0 section 13): MSB-first variable-width codes with
# the spec's early-change width bumps
# ---------------------------------------------------------------------------


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW: emit ClearCode, string table grows from 258,
    code width bumps 9->10->11->12 when the NEXT code to be assigned
    reaches 2^w (the spec's off-by-one "early change" — one step
    before mathematically necessary), table reset via ClearCode at
    4094, EOI terminator.  Byte-identical to libtiff 4.5.0's encoder
    output across width bumps and table resets (verified in
    tests/test_tiff.py)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_LZW_CLEAR, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # the spec's "early change": width grows when the next free
        # code reaches 2^width — one step before it is mathematically
        # necessary (emitted values still fit; GIF bumps at 2^w + 1).
        # Verified byte-identical against libtiff 4.5.0 streams.
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # table nearly full: reset
            emit(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(_LZW_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """Inverse of _lzw_encode, tolerant of streams that omit the
    trailing EOI (libtiff always writes it; the decode loop also stops
    at the expected byte count so a corrupt length cannot balloon)."""
    out = bytearray()
    pos = 0  # bit position
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise TiffError("LZW stream truncated")
        byte0 = pos >> 3
        bit0 = pos & 7
        val = 0
        need = width
        b = bit0
        i = byte0
        while need > 0:
            take = min(8 - b, need)
            val = (val << take) | ((data[i] >> (8 - b - take)) & ((1 << take) - 1))
            need -= take
            b += take
            if b == 8:
                b = 0
                i += 1
        pos += width
        return val

    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code > 255:
                raise TiffError(f"LZW first code {code} not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffError(f"LZW code {code} beyond table {len(table)}")
        out.extend(entry)
        prev = entry
        # early change, decoder side: the encoder assigns one entry per
        # emitted code (starting with its FIRST post-clear emit), while
        # this table lags one behind (nothing to append on the first
        # code), so the encoder's next_code == len(table) + 1 and its
        # bump at next_code == 2^w lands here at len == 2^w - 1.
        # Verified against libtiff 4.5.0 streams incl. table resets.
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expected:
        raise TiffError(f"LZW decoded {len(out)} bytes, expected {expected}")
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _read_ifd_value(buf: bytes, fmt: str, entry: bytes, count: int,
                    ftype: int) -> list[int]:
    """One IFD entry's values (BYTE/SHORT/LONG only): inline when they
    fit the 4-byte value slot, else at the pointed-to offset."""
    size = _TYPE_SIZES[ftype] * count
    if size <= 4:
        raw = entry[8:12][:size]
    else:
        (off,) = struct.unpack(fmt + "I", entry[8:12])
        if off + size > len(buf):
            raise TiffError("IFD value offset out of file")
        raw = buf[off : off + size]
    ch = {1: "B", 3: "H", 4: "I"}.get(ftype)
    if ch is None:
        raise TiffError(f"unsupported IFD field type {ftype}")
    return list(struct.unpack(f"{fmt}{count}{ch}", raw))


def decode_tiff(buf: bytes, max_pixels: int = 1 << 24) -> np.ndarray:
    """Decode a baseline TIFF (see module envelope) to an (h, w) or
    (h, w, spp) uint8 array.  Raises TiffError on malformed input and
    NotImplementedError outside the envelope.

    max_pixels is the decompression-bomb rail shared by the codec
    family (decode_vp8's convention): dims are capped per axis below,
    but a tiny file declaring e.g. one LZW strip of 2^20 x 2^20 x 4
    would otherwise drive a multi-TiB expansion attempt before any
    content-level check fires.  The cap is on total output samples
    (w*h*spp); raise it explicitly for trusted input."""
    if len(buf) < 8:
        raise TiffError("too short for a TIFF header")
    if buf[:2] == b"II":
        fmt = "<"
    elif buf[:2] == b"MM":
        fmt = ">"
    else:
        raise TiffError("bad byte-order mark: not a TIFF")
    (magic,) = struct.unpack_from(fmt + "H", buf, 2)
    if magic == 43:
        raise NotImplementedError("BigTIFF not supported")
    if magic != 42:
        raise TiffError(f"bad TIFF magic {magic}")
    (ifd_off,) = struct.unpack_from(fmt + "I", buf, 4)
    if ifd_off + 2 > len(buf):
        raise TiffError("first IFD offset out of file")
    (n_entries,) = struct.unpack_from(fmt + "H", buf, ifd_off)
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        if off + 12 > len(buf):
            raise TiffError("IFD entry overruns file")
        entry = buf[off : off + 12]
        tag, ftype = struct.unpack(fmt + "HH", entry[:4])
        (count,) = struct.unpack(fmt + "I", entry[4:8])
        if ftype not in _TYPE_SIZES:
            raise TiffError(f"IFD field type {ftype} invalid")
        if ftype in (1, 3, 4) and count and count < 1 << 24:
            tags[tag] = _read_ifd_value(buf, fmt, entry, count, ftype)

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise TiffError(f"required tag {tag} missing")
        return default

    if _TAG_TILE_WIDTH in tags:
        raise NotImplementedError("tiled TIFF not supported")
    if _TAG_COLOR_MAP in tags:
        raise NotImplementedError("palette-color TIFF not supported")
    if one(_TAG_FILL_ORDER, 1) != 1:
        raise NotImplementedError("FillOrder 2 not supported")
    w = one(_TAG_WIDTH)
    h = one(_TAG_HEIGHT)
    if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20):
        raise TiffError(f"dims out of range: {w}x{h}")
    spp = one(_TAG_SPP, 1)
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"SamplesPerPixel {spp} not supported")
    if w * h * spp > max_pixels:
        raise TiffError(
            f"declared raster {w}x{h}x{spp} exceeds max_pixels="
            f"{max_pixels} (decompression-bomb rail; raise the limit "
            "explicitly for trusted input)"
        )
    bits = tags.get(_TAG_BITS, [8] * spp)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"BitsPerSample {bits} not supported")
    if one(_TAG_PLANAR, 1) != 1:
        raise NotImplementedError("planar (separate) config not supported")
    comp = one(_TAG_COMPRESSION, 1)
    if comp not in (_COMP_NONE, _COMP_LZW, _COMP_PACKBITS):
        raise NotImplementedError(f"compression {comp} not supported")
    predictor = one(_TAG_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"predictor {predictor} not supported")
    if predictor == 2 and comp == _COMP_NONE:
        raise TiffError("predictor 2 with no compression is not baseline")
    rows_per_strip = one(_TAG_ROWS_PER_STRIP, h)
    if rows_per_strip < 1:
        raise TiffError("RowsPerStrip must be >= 1")
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("strip offsets/byte-counts missing or mismatched")
    n_strips = (h + rows_per_strip - 1) // rows_per_strip
    if len(offsets) != n_strips:
        raise TiffError(
            f"{len(offsets)} strips for {h} rows at {rows_per_strip}/strip"
        )

    row_bytes = w * spp
    out = bytearray()
    for s in range(n_strips):
        rows = min(rows_per_strip, h - s * rows_per_strip)
        expected = rows * row_bytes
        off, cnt = offsets[s], counts[s]
        if off + cnt > len(buf):
            raise TiffError(f"strip {s} overruns file")
        raw = buf[off : off + cnt]
        if comp == _COMP_NONE:
            if cnt < expected:
                raise TiffError(f"strip {s} short: {cnt} < {expected}")
            strip = raw[:expected]
        elif comp == _COMP_PACKBITS:
            strip = _packbits_decode(raw, expected)
        else:
            strip = _lzw_decode(raw, expected)
        out.extend(strip)

    img = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w * spp)
    if predictor == 2:
        # invert horizontal differencing per row per channel
        img = img.reshape(h, w, spp).astype(np.int64)
        img = np.cumsum(img, axis=1) % 256
        img = img.astype(np.uint8).reshape(h, w * spp)
    if spp == 1:
        return img.reshape(h, w).copy()
    return img.reshape(h, w, spp).copy()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode_tiff(
    img: np.ndarray,
    compression: str = "none",
    rows_per_strip: int | None = None,
    predictor: bool = False,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3|4) RGB(A) uint8 array as
    a classic little-endian baseline TIFF.  compression: "none",
    "packbits" or "lzw"; predictor=True applies horizontal
    differencing (tag 317 = 2, LZW only).  Emits a single IFD with the
    baseline tag set; strips of ``rows_per_strip`` rows (default: one
    strip)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise TiffError(f"expected uint8 image, got {img.dtype}")
    if img.ndim == 2:
        h, w = img.shape
        spp = 1
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        h, w, spp = img.shape
    else:
        raise TiffError(f"expected (h,w) or (h,w,3|4) image, got {img.shape}")
    if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20):
        raise TiffError(f"dims out of range: {w}x{h}")
    comp = {"none": _COMP_NONE, "packbits": _COMP_PACKBITS,
            "lzw": _COMP_LZW}.get(compression)
    if comp is None:
        raise TiffError(f"unknown compression {compression!r}")
    if predictor and comp != _COMP_LZW:
        raise TiffError("predictor requires lzw compression")
    rows_per_strip = rows_per_strip or h
    if rows_per_strip < 1:
        raise TiffError("rows_per_strip must be >= 1")

    flat = img.reshape(h, w * spp)
    if predictor:
        # horizontal differencing: first pixel carried as-is, the rest
        # as deltas from the previous pixel, per channel
        d = flat.reshape(h, w, spp).astype(np.int64)
        d = np.diff(d, axis=1, prepend=np.zeros((h, 1, spp), np.int64))
        flat = (d % 256).astype(np.uint8).reshape(h, w * spp)

    strips: list[bytes] = []
    for s0 in range(0, h, rows_per_strip):
        rows = flat[s0 : s0 + rows_per_strip]
        if comp == _COMP_NONE:
            strips.append(rows.tobytes())
        elif comp == _COMP_PACKBITS:
            # spec: pack each row separately
            strips.append(
                b"".join(_packbits_encode_row(r.tobytes()) for r in rows)
            )
        else:
            strips.append(_lzw_encode(rows.tobytes()))

    # layout: header(8) | IFD | [deferred value block] | strip data.
    # Entry values carry either an inline int or the raw bytes of a
    # > 4-byte value (deferred to the block after the IFD).
    entries: list[tuple[int, int, int, int | bytes | None]] = []

    def tag_short(tag: int, v: int) -> None:
        entries.append((tag, 3, 1, v))

    def tag_long(tag: int, v: int) -> None:
        entries.append((tag, 4, 1, v))

    tag_long(_TAG_WIDTH, w)
    tag_long(_TAG_HEIGHT, h)
    n_strips = len(strips)
    photometric = 1 if spp == 1 else 2
    ifd_off = 8
    if spp == 1:
        bits_entry = (_TAG_BITS, 3, 1, 8)
    else:
        bits_entry = (_TAG_BITS, 3, spp, b"".join(
            struct.pack("<H", 8) for _ in range(spp)
        ))

    entries.append(bits_entry)
    tag_short(_TAG_COMPRESSION, comp)
    tag_short(_TAG_PHOTOMETRIC, photometric)
    tag_short(_TAG_SPP, spp)
    tag_long(_TAG_ROWS_PER_STRIP, rows_per_strip)
    tag_short(_TAG_PLANAR, 1)
    if predictor:
        tag_short(_TAG_PREDICTOR, 2)
    if spp == 4:
        # ExtraSamples: 1 unassociated-alpha sample
        tag_short(_TAG_EXTRA_SAMPLES, 2)
    # strip tables appended after sizes are known
    strip_sizes = [len(s) for s in strips]
    if n_strips == 1:
        entries.append((_TAG_STRIP_OFFSETS, 4, 1, None))  # patched later
        entries.append((_TAG_STRIP_COUNTS, 4, 1, strip_sizes[0]))
    else:
        entries.append((_TAG_STRIP_OFFSETS, 4, n_strips, None))
        entries.append((_TAG_STRIP_COUNTS, 4, n_strips, b"".join(
            struct.pack("<I", c) for c in strip_sizes
        )))
    entries.sort(key=lambda e: e[0])  # spec: ascending tag order

    ifd_size = 2 + 12 * len(entries) + 4
    block_off = ifd_off + ifd_size

    # resolve deferred blocks: walk entries, assign offsets
    block = bytearray()
    resolved: list[tuple[int, int, int, int]] = []
    strip_table_off = None
    for tag, ftype, count, val in entries:
        if isinstance(val, bytes):
            off = block_off + len(block)
            block.extend(val)
            resolved.append((tag, ftype, count, off))
        elif val is None:  # strip offsets, patched after data layout
            if n_strips > 1:
                strip_table_off = block_off + len(block)
                block.extend(b"\x00" * (4 * n_strips))
                resolved.append((tag, ftype, count, strip_table_off))
            else:
                resolved.append((tag, ftype, count, -1))  # patch slot
        else:
            resolved.append((tag, ftype, count, val))

    data_off = block_off + len(block)
    offsets = []
    pos = data_off
    for sz in strip_sizes:
        offsets.append(pos)
        pos += sz
    if n_strips > 1:
        # patch the strip-offset table inside the block
        rel = strip_table_off - block_off
        block[rel : rel + 4 * n_strips] = b"".join(
            struct.pack("<I", o) for o in offsets
        )
    else:
        resolved = [
            (tag, ftype, count,
             offsets[0] if (tag == _TAG_STRIP_OFFSETS and val == -1) else val)
            for (tag, ftype, count, val) in resolved
        ]

    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", len(resolved))
    for tag, ftype, count, val in resolved:
        out += struct.pack("<HHI", tag, ftype, count)
        if ftype == 3 and count == 1:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # no next IFD
    out += block
    for s in strips:
        out += s
    return bytes(out)
