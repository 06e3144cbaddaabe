"""From-scratch GIF codec (GIF87a/89a): logical-screen + image
descriptors, global/local color tables, the GIF flavor of LZW
(LSB-first bit packing, variable code width from min_code_size+1 up
to 12 bits, Clear/EOI codes, deferred-clear decoding, 255-byte
sub-block framing), 4-pass interlacing, Graphic Control Extension
(delay/transparency) and multi-frame animations.

GIF-LZW vs TIFF-LZW (functions/tiff_codec.py): opposite bit order
(LSB-first here, MSB-first there), an explicit per-image minimum code
size, EOI termination, sub-block framing, and no early-change rule —
a genuinely different codec, not a re-skin.

External verification (tests/test_gif.py + m_gif_giflib_parity):
every file this encoder emits decodes pixel-exact under the REAL
system giflib 5.2 (ctypes, functions/giflib_oracle.py), and files
REAL giflib writes decode pixel-exact under this decoder.

No reference lineage: the reference (map2db.py) never touches GIF;
beyond-reference envelope built from the GIF89a specification.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12


# ---------------------------------------------------------------------------
# LZW (GIF flavor)
# ---------------------------------------------------------------------------


def _lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW: codes packed LSB-first; width grows when next_code
    exceeds the current width's range; Clear resets the table."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    if indices:
        prefix = bytes([indices[0]])
        for b in indices[1:]:
            cand = prefix + bytes([b])
            if cand in table:
                prefix = cand
            else:
                emit(table[prefix], width)
                if next_code < (1 << _MAX_CODE_WIDTH):
                    table[cand] = next_code
                    next_code += 1
                    if next_code - 1 == (1 << width) and \
                            width < _MAX_CODE_WIDTH:
                        width += 1
                else:
                    # table full: emit Clear and restart
                    emit(clear, width)
                    table = {bytes([i]): i for i in range(clear)}
                    next_code = eoi + 1
                    width = min_code_size + 1
                prefix = bytes([b])
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int,
                    expect: int | None = None) -> bytes:
    """GIF LZW decode with the deferred-clear convention; stops at EOI
    or when `expect` pixels are produced."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def read() -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while True:
        code = read()
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"gif: first code {code} out of table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"gif: LZW code {code} beyond table")
        if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        out += entry
        prev = entry
        if expect is not None and len(out) >= expect:
            break
    if expect is not None and len(out) > expect:
        raise ValueError("gif: LZW produced more pixels than raster")
    return bytes(out)


# ---------------------------------------------------------------------------
# Interlace (4-pass row order)
# ---------------------------------------------------------------------------


def _interlace_order(h: int) -> list[int]:
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


# ---------------------------------------------------------------------------
# Containers
# ---------------------------------------------------------------------------


def _color_table_bits(n_colors: int) -> int:
    """Smallest b with 2^(b+1) >= n_colors, per the size field encoding."""
    for b in range(8):
        if (1 << (b + 1)) >= n_colors:
            return b
    raise ValueError(f"gif: palette too large ({n_colors})")


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(frames, palette: np.ndarray, *, interlace: bool = False,
               delays_cs=None, transparent_index: int | None = None,
               ) -> bytes:
    """Index frames (list of HxW uint8 arrays, or one array) + palette
    (Nx3 uint8) -> GIF bytes.  One frame emits GIF87a unless a GCE is
    needed; multiple frames (or delay/transparency) emit GIF89a with a
    GCE per frame and the Netscape loop extension."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("gif: palette must be Nx3")
    n_colors = pal.shape[0]
    bits = _color_table_bits(n_colors)
    table_size = 1 << (bits + 1)
    h, w = frames[0].shape
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("gif: frames must share one size")
        if int(f.max(initial=0)) >= n_colors:
            raise ValueError("gif: index beyond palette")
    animated = len(frames) > 1
    need_gce = animated or delays_cs is not None or \
        transparent_index is not None
    out = bytearray(b"GIF89a" if need_gce else b"GIF87a")
    # logical screen descriptor: global color table, 8 bits/primary
    out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | bits, 0, 0)
    full_pal = np.zeros((table_size, 3), dtype=np.uint8)
    full_pal[:n_colors] = pal
    out += full_pal.tobytes()
    if animated:
        out += b"\x21\xff\x0bNETSCAPE2.0" + _sub_blocks(b"\x01\x00\x00")[:-1]
        out += b"\x00"
    for i, f in enumerate(frames):
        if need_gce:
            delay = 0
            if delays_cs is not None:
                delay = int(delays_cs[i] if hasattr(delays_cs, "__len__")
                            else delays_cs)
            flags = 0
            tidx = 0
            if transparent_index is not None:
                flags |= 1
                tidx = transparent_index
            out += b"\x21\xf9\x04" + struct.pack("<BHB", flags, delay, tidx)
            out += b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x40 if interlace else 0)
        raster = f
        if interlace:
            raster = f[_interlace_order(h)]
        min_code = max(2, bits + 1)
        out.append(min_code)
        out += _sub_blocks(_lzw_compress(raster.tobytes(), min_code))
    out += b"\x3b"
    return bytes(out)


def decode_gif(buf: bytes, max_pixels: int = 1 << 24):
    """GIF bytes -> (frames, palette, meta).  frames is a list of HxW
    uint8 index arrays (de-interlaced, composited onto the logical
    screen at their left/top offsets), palette the global color table
    Nx3, meta a dict (version, n_frames, interlaced, delays_cs,
    transparent_index).  Raises ValueError on malformed/truncated
    input — never IndexError/struct.error (fuzz-pinned).

    max_pixels is the decompression-bomb rail shared by the codec
    family (decode_vp8's convention), charged against the TOTAL
    composited output (logical-screen pixels x frames): a 65535x65535
    screen descriptor, or an unbounded run of tiny frames each
    composited onto the full screen, would otherwise force the
    expansion before any content-level check fires.  Raise the limit
    explicitly for trusted input."""
    try:
        return _decode_impl(buf, max_pixels)
    except (struct.error, IndexError) as ex:
        raise ValueError(f"malformed GIF ({type(ex).__name__})") from ex


def _decode_impl(buf: bytes, max_pixels: int = 1 << 24):
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"gif: bad magic {buf[:6]!r}")
    version = buf[3:6].decode()
    if len(buf) < 13:
        raise ValueError("gif: truncated screen descriptor")
    w, h, flags, _bg, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    if w * h > max_pixels:
        raise ValueError(
            f"gif: logical screen {w}x{h} exceeds max_pixels="
            f"{max_pixels} (decompression-bomb rail)"
        )
    total_px = 0
    pos = 13
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        if pos + 3 * n > len(buf):
            raise ValueError("gif: truncated global color table")
        gpal = np.frombuffer(buf, np.uint8, 3 * n, pos).reshape(n, 3).copy()
        pos += 3 * n
    frames: list[np.ndarray] = []
    delays: list[int] = []
    interlaced = False
    transparent: int | None = None
    pending_delay = 0
    pending_transparent: int | None = None
    while True:
        if pos >= len(buf):
            raise ValueError("gif: missing trailer")
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(buf):
                raise ValueError("gif: truncated extension")
            label = buf[pos]
            pos += 1
            blocks = bytearray()
            while True:
                if pos >= len(buf):
                    raise ValueError("gif: truncated sub-blocks")
                n = buf[pos]
                pos += 1
                if n == 0:
                    break
                blocks += buf[pos:pos + n]
                pos += n
            if label == 0xF9 and len(blocks) >= 4:
                gflags, delay, tidx = struct.unpack_from("<BHB", blocks, 0)
                pending_delay = delay
                pending_transparent = tidx if gflags & 1 else None
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(buf):
                raise ValueError("gif: truncated image descriptor")
            left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", buf, pos)
            pos += 9
            # charge each frame at full composited (logical-screen)
            # size: every frame materializes an HxW array below
            total_px += max(iw * ih, w * h)
            if total_px > max_pixels:
                raise ValueError(
                    f"gif: cumulative frame output {total_px} exceeds "
                    f"max_pixels={max_pixels} (decompression-bomb rail)"
                )
            lpal = None
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                if pos + 3 * n > len(buf):
                    raise ValueError("gif: truncated local color table")
                lpal = np.frombuffer(
                    buf, np.uint8, 3 * n, pos).reshape(n, 3).copy()
                pos += 3 * n
            if pos >= len(buf):
                raise ValueError("gif: missing LZW min code size")
            min_code = buf[pos]
            pos += 1
            blocks = bytearray()
            while True:
                if pos >= len(buf):
                    raise ValueError("gif: truncated image data")
                n = buf[pos]
                pos += 1
                if n == 0:
                    break
                blocks += buf[pos:pos + n]
                pos += n
            idx = _lzw_decompress(bytes(blocks), min_code, expect=iw * ih)
            if len(idx) < iw * ih:
                raise ValueError("gif: raster shorter than image")
            img = np.frombuffer(idx, np.uint8, iw * ih).reshape(ih, iw)
            if iflags & 0x40:
                interlaced = True
                deinter = np.zeros_like(img)
                deinter[_interlace_order(ih)] = img
                img = deinter
            if left or top or (iw, ih) != (w, h):
                if left + iw > w or top + ih > h:
                    raise ValueError("gif: image outside logical screen")
                full = np.zeros((h, w), dtype=np.uint8)
                full[top:top + ih, left:left + iw] = img
                img = full
            frames.append(img)
            delays.append(pending_delay)
            if pending_transparent is not None:
                transparent = pending_transparent
            pending_delay = 0
            pending_transparent = None
            pal = lpal if lpal is not None else gpal
            if pal is None:
                raise ValueError("gif: image with no color table")
        else:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
    if not frames:
        raise ValueError("gif: no image data")
    return frames, gpal, {
        "version": version,
        "n_frames": len(frames),
        "interlaced": interlaced,
        "delays_cs": delays,
        "transparent_index": transparent,
    }
