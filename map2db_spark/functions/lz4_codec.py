"""From-scratch LZ4 block-format codec: token-packed sequences
(4-bit literal length + 4-bit match length nibbles with 255-byte
extension runs), little-endian 2-byte offsets, minimum match 4, and
the spec's end-of-block rules (last sequence is literals-only; the
last 5 bytes are always literals; a match must not start within the
last 12 bytes).  Encoder uses a hash-table greedy matcher (the same
strategy class as the reference lz4 fast path, reimplemented from the
published block-format spec).

External verification (tests/test_lz4.py + m_lz4_parity): every
block this encoder emits decodes byte-exactly under the REAL system
liblz4 1.9.4 (`LZ4_decompress_safe` via ctypes — flat API, no
structs), and every block REAL `LZ4_compress_default` emits decodes
byte-exactly under this decoder.

LZ4 is the analytics-stack workhorse codec (parquet pages, shuffle
compression, Kafka) — the from-scratch family (DEFLATE, TIFF-LZW,
GIF-LZW, VP8L-LZ77) gains its byte-oriented no-entropy-coder member.

No reference lineage: the reference (map2db.py) never touches LZ4.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_MIN_MATCH = 4
_LAST_LITERALS = 5
_MFLIMIT = 12  # matches must end >= 12 bytes before block end


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def lz4_decompress(data: bytes, max_output: int | None = None) -> bytes:
    """LZ4 block -> raw bytes.  Raises ValueError on malformed input
    (truncated sequence, offset beyond output, oversize) — never
    IndexError.  max_output is the zip-bomb rail."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("lz4: truncated literals")
        if max_output is not None and len(out) + lit_len > max_output:
            raise ValueError(f"lz4: output exceeds max_output={max_output}")
        out += data[pos:pos + lit_len]
        pos += lit_len
        if pos == n:
            break  # last sequence: literals only
        if pos + 2 > n:
            raise ValueError("lz4: truncated offset")
        offset = data[pos] | (data[pos + 1] << 8)
        pos += 2
        if offset == 0:
            raise ValueError("lz4: zero offset")
        if offset > len(out):
            raise ValueError("lz4: offset beyond output")
        match_len = (token & 0x0F) + _MIN_MATCH
        if token & 0x0F == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = data[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        if max_output is not None and len(out) + match_len > max_output:
            raise ValueError(f"lz4: output exceeds max_output={max_output}")
        if offset >= match_len:
            start = len(out) - offset
            out += out[start:start + match_len]
        else:
            for _ in range(match_len):
                out.append(out[-offset])
    return bytes(out)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _write_len(base: int, extra: int, out: bytearray) -> None:
    if base == 15:
        rem = extra
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)


def lz4_compress(data: bytes) -> bytes:
    """Raw bytes -> LZ4 block.  Greedy hash-table matcher (4-byte
    hashes, last-position table) honoring the spec's end rules."""
    n = len(data)
    out = bytearray()
    if n == 0:
        return b"\x00"  # one empty literals-only sequence

    def emit(lit_start: int, lit_end: int, match_len: int,
             offset: int) -> None:
        lit_len = lit_end - lit_start
        lit_nib = min(lit_len, 15)
        if match_len:
            m = match_len - _MIN_MATCH
            mat_nib = min(m, 15)
            out.append((lit_nib << 4) | mat_nib)
        else:
            out.append(lit_nib << 4)
        _write_len(lit_nib, lit_len - 15, out)
        out.extend(data[lit_start:lit_end])
        if match_len:
            out.append(offset & 0xFF)
            out.append(offset >> 8)
            _write_len(mat_nib, match_len - _MIN_MATCH - 15, out)

    if n < _MFLIMIT + 1:
        emit(0, n, 0, 0)
        return bytes(out)

    table: dict[int, int] = {}
    anchor = 0
    i = 0
    match_limit = n - _LAST_LITERALS
    # a match may not begin in the last MFLIMIT bytes
    search_end = n - _MFLIMIT
    while i <= search_end:
        key = data[i:i + _MIN_MATCH]
        h = key[0] | (key[1] << 8) | (key[2] << 16) | (key[3] << 24)
        cand = table.get(h)
        table[h] = i
        if cand is not None and i - cand <= 65535 and \
                data[cand:cand + _MIN_MATCH] == key:
            ln = _MIN_MATCH
            limit = match_limit - i
            while ln < limit and data[cand + ln] == data[i + ln]:
                ln += 1
            emit(anchor, i, ln, i - cand)
            i += ln
            anchor = i
        else:
            i += 1
    emit(anchor, n, 0, 0)
    return bytes(out)


# ---------------------------------------------------------------------------
# liblz4 external oracle (flat API, no structs)
# ---------------------------------------------------------------------------


class Lz4Unavailable(RuntimeError):
    """Raised by oracle calls when no system liblz4 could be loaded."""


_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = ["liblz4.so.1", "liblz4.so"]
    found = ctypes.util.find_library("lz4")
    if found:
        names.insert(0, found)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            lib.LZ4_compress_default.restype = ctypes.c_int
            lib.LZ4_compress_default.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
                ctypes.c_int]
            lib.LZ4_decompress_safe.restype = ctypes.c_int
            lib.LZ4_decompress_safe.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
                ctypes.c_int]
            lib.LZ4_compressBound.restype = ctypes.c_int
            lib.LZ4_compressBound.argtypes = [ctypes.c_int]
            _LIB = lib
            return _LIB
        except (OSError, AttributeError):
            continue
    return None


def available() -> bool:
    return _load() is not None


def ref_compress(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        raise Lz4Unavailable("no system liblz4")
    cap = lib.LZ4_compressBound(len(data))
    dst = ctypes.create_string_buffer(cap)
    n = lib.LZ4_compress_default(data, dst, len(data), cap)
    if n <= 0:
        raise ValueError("liblz4: compress failed")
    return dst.raw[:n]


def ref_decompress(data: bytes, raw_size: int) -> bytes:
    lib = _load()
    if lib is None:
        raise Lz4Unavailable("no system liblz4")
    dst = ctypes.create_string_buffer(max(1, raw_size))
    n = lib.LZ4_decompress_safe(data, dst, len(data), raw_size)
    if n < 0:
        raise ValueError(f"liblz4: decompress failed ({n})")
    return dst.raw[:n]
