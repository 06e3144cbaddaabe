"""From-scratch DEFLATE / zlib codec (RFC 1951 + RFC 1950), stdlib-free
on the algorithmic path: bit-level LSB-first stream I/O, all three
block types (stored, fixed-Huffman, dynamic-Huffman), a real LZ77
hash-chain matcher with lazy matching, canonical prefix-code
assignment with package-merge length limiting (15/7), the full
code-length alphabet (symbols 16/17/18 RLE) for dynamic headers, a
32 KiB sliding window shared across block boundaries, and our own
Adler-32 for the zlib container.

External verification (tests/test_deflate.py + the m_deflate_* query
rows): every stream this encoder emits decompresses byte-exactly
under the REAL stdlib zlib (which wraps the system libz), and every
stream zlib.compress emits at every level 0-9 — plus gzip members —
inflates byte-exactly under this decoder.  That is the same
both-directions external-parity standard as the libwebp/libtiff rows;
byte-identical compressed output is NOT claimed (matcher choice is
encoder freedom under RFC 1951).

This is an analytics-engine concern, not an aside: parquet pages,
PNG IDAT, and gzip'd text corpora all ride on DEFLATE, and the PNG
codec in functions/png.py can swap this in for stdlib zlib
(m_png_fromscratch pins that composition).

No reference lineage: the reference (map2db.py) never touches
DEFLATE; this is beyond-reference envelope, built from the RFCs.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Bit I/O — DEFLATE packs bits LSB-first into bytes; Huffman codes are
# written MSB-of-code-first, which in this bit order means the code's
# bits must be reversed before writing (RFC 1951 §3.1.1).
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("_buf", "_acc", "_n")

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        """Write nbits of value, LSB first."""
        self._acc |= (value & ((1 << nbits) - 1)) << self._n
        self._n += nbits
        while self._n >= 8:
            self._buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, nbits: int) -> None:
        """Write a Huffman code (codes go MSB-first in this bit order)."""
        rev = 0
        for _ in range(nbits):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.write(rev, nbits)

    def align_byte(self) -> None:
        if self._n:
            self._buf.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0

    def bytes(self) -> bytes:
        out = bytearray(self._buf)
        if self._n:
            out.append(self._acc & 0xFF)
        return bytes(out)


class _BitReader:
    __slots__ = ("_data", "_pos", "_acc", "_n")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._data = data
        self._pos = pos
        self._acc = 0
        self._n = 0

    def read(self, nbits: int) -> int:
        while self._n < nbits:
            if self._pos >= len(self._data):
                raise ValueError("deflate: truncated stream")
            self._acc |= self._data[self._pos] << self._n
            self._pos += 1
            self._n += 8
        v = self._acc & ((1 << nbits) - 1)
        self._acc >>= nbits
        self._n -= nbits
        return v

    def align_byte(self) -> None:
        self._acc = 0
        self._n = 0

    def byte_pos(self) -> int:
        """Position of the next unread byte (only valid when aligned)."""
        return self._pos


# ---------------------------------------------------------------------------
# Canonical prefix codes (RFC 1951 §3.2.2)
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> list[int]:
    """lengths[sym] -> code (unreversed).  Zero-length symbols get 0."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    codes = [0] * len(lengths)
    for sym, ln in enumerate(lengths):
        if ln:
            codes[sym] = next_code[ln]
            next_code[ln] += 1
    return codes


class _Decoder:
    """Table-free canonical decoder: walks the code bit by bit using the
    first-code/first-symbol-per-length arrays (fast enough for the
    fixture scales this engine decodes in kernels; O(len) per symbol)."""

    __slots__ = ("_counts", "_symbols", "_max_len")

    def __init__(self, lengths: list[int]) -> None:
        max_len = max(lengths, default=0)
        if max_len == 0:
            raise ValueError("deflate: empty prefix code")
        counts = [0] * (max_len + 1)
        for ln in lengths:
            if ln:
                counts[ln] += 1
        # over-subscribed / incomplete checks (RFC 1951 implies complete
        # codes except the special 1-symbol distance case handled by the
        # caller)
        left = 1
        for bits in range(1, max_len + 1):
            left = (left << 1) - counts[bits]
            if left < 0:
                raise ValueError("deflate: over-subscribed code lengths")
        symbols: list[int] = []
        for bits in range(1, max_len + 1):
            for sym, ln in enumerate(lengths):
                if ln == bits:
                    symbols.append(sym)
        self._counts = counts
        self._symbols = symbols
        self._max_len = max_len

    def read(self, r: _BitReader) -> int:
        code = 0
        first = 0
        index = 0
        for bits in range(1, self._max_len + 1):
            code |= r.read(1)
            count = self._counts[bits]
            if code - first < count:
                return self._symbols[index + (code - first)]
            index += count
            first = (first + count) << 1
            code <<= 1
        raise ValueError("deflate: invalid prefix code in stream")


# ---------------------------------------------------------------------------
# Package-merge length-limited Huffman (limit 15 for lit/dist, 7 for CL)
# ---------------------------------------------------------------------------


def _limited_lengths(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Optimal length-limited code lengths via package-merge."""
    syms = [s for s, f in freqs.items() if f > 0]
    if not syms:
        return {}
    if len(syms) == 1:
        return {syms[0]: 1}
    if len(syms) > (1 << limit):
        raise ValueError("deflate: alphabet larger than 2^limit")
    items = sorted((freqs[s], s) for s in syms)
    packages: list[list[tuple[int, list[int]]]] = []
    prev: list[tuple[int, list[int]]] = []
    for _ in range(limit):
        level = [(f, [s]) for f, s in items]
        for i in range(0, len(prev) - 1, 2):
            f = prev[i][0] + prev[i + 1][0]
            level.append((f, prev[i][1] + prev[i + 1][1]))
        level.sort(key=lambda t: t[0])
        packages.append(level)
        prev = level
    lengths = {s: 0 for s in syms}
    take = 2 * len(syms) - 2
    for _, bundle in prev[:take]:
        for s in bundle:
            lengths[s] += 1
    return lengths


# ---------------------------------------------------------------------------
# DEFLATE constant tables (RFC 1951 §3.2.5)
# ---------------------------------------------------------------------------

_LEN_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
             35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258]
_LEN_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
              3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0]
_DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
              257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
              8193, 12289, 16385, 24577]
_DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
               7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13]
_CL_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]

_WINDOW = 32768
_MAX_MATCH = 258
_MIN_MATCH = 3


def _fixed_lit_lengths() -> list[int]:
    # RFC 1951 §3.2.6
    return [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8


def _length_symbol(length: int) -> tuple[int, int, int]:
    """length -> (symbol 257..285, extra bits, extra value)."""
    for i in range(len(_LEN_BASE) - 1, -1, -1):
        if length >= _LEN_BASE[i]:
            return 257 + i, _LEN_EXTRA[i], length - _LEN_BASE[i]
    raise ValueError(f"deflate: bad match length {length}")


def _dist_symbol(dist: int) -> tuple[int, int, int]:
    for i in range(len(_DIST_BASE) - 1, -1, -1):
        if dist >= _DIST_BASE[i]:
            return i, _DIST_EXTRA[i], dist - _DIST_BASE[i]
    raise ValueError(f"deflate: bad match distance {dist}")


# ---------------------------------------------------------------------------
# Inflate
# ---------------------------------------------------------------------------


def inflate(data: bytes, start_bit_reader: _BitReader | None = None,
            max_output: int | None = None) -> bytes:
    """RFC 1951 decoder: stored + fixed + dynamic blocks, full
    code-length-alphabet header decode, 32 KiB back-reference window.

    max_output caps the inflated size (zip-bomb rail for untrusted
    corpus payloads — a 1 KB stream can legally inflate to ~1 GB;
    kernels processing crawl bytes should always set it)."""
    r = start_bit_reader if start_bit_reader is not None else _BitReader(data)

    def check_size(n: int) -> None:
        if max_output is not None and n > max_output:
            raise ValueError(
                f"deflate: output exceeds max_output={max_output}")
    out = bytearray()
    fixed_lit = _Decoder(_fixed_lit_lengths())
    fixed_dist = _Decoder([5] * 30)
    while True:
        bfinal = r.read(1)
        btype = r.read(2)
        if btype == 0:  # stored
            r.align_byte()
            p = r.byte_pos()
            if p + 4 > len(data):
                raise ValueError("deflate: truncated stored header")
            ln = data[p] | (data[p + 1] << 8)
            nlen = data[p + 2] | (data[p + 3] << 8)
            if ln ^ 0xFFFF != nlen:
                raise ValueError("deflate: stored LEN/NLEN mismatch")
            if p + 4 + ln > len(data):
                raise ValueError("deflate: truncated stored block")
            check_size(len(out) + ln)
            out += data[p + 4:p + 4 + ln]
            r._pos = p + 4 + ln
        elif btype in (1, 2):
            if btype == 1:
                lit_dec, dist_dec = fixed_lit, fixed_dist
            else:
                hlit = r.read(5) + 257
                hdist = r.read(5) + 1
                hclen = r.read(4) + 4
                cl_lengths = [0] * 19
                for i in range(hclen):
                    cl_lengths[_CL_ORDER[i]] = r.read(3)
                cl_dec = _Decoder(cl_lengths)
                lengths: list[int] = []
                while len(lengths) < hlit + hdist:
                    sym = cl_dec.read(r)
                    if sym < 16:
                        lengths.append(sym)
                    elif sym == 16:
                        if not lengths:
                            raise ValueError("deflate: repeat before first")
                        lengths += [lengths[-1]] * (3 + r.read(2))
                    elif sym == 17:
                        lengths += [0] * (3 + r.read(3))
                    else:
                        lengths += [0] * (11 + r.read(7))
                if len(lengths) != hlit + hdist:
                    raise ValueError("deflate: code-length overrun")
                lit_dec = _Decoder(lengths[:hlit])
                dlens = lengths[hlit:]
                if all(ln == 0 for ln in dlens):
                    dist_dec = None  # literal-only block
                else:
                    dist_dec = _Decoder(dlens)
            while True:
                sym = lit_dec.read(r)
                if sym < 256:
                    check_size(len(out) + 1)
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise ValueError(f"deflate: bad length symbol {sym}")
                    i = sym - 257
                    length = _LEN_BASE[i] + r.read(_LEN_EXTRA[i])
                    if dist_dec is None:
                        raise ValueError(
                            "deflate: match in literal-only block")
                    dsym = dist_dec.read(r)
                    if dsym > 29:
                        raise ValueError(f"deflate: bad dist symbol {dsym}")
                    dist = _DIST_BASE[dsym] + r.read(_DIST_EXTRA[dsym])
                    if dist > len(out):
                        raise ValueError("deflate: distance beyond output")
                    check_size(len(out) + length)
                    for _ in range(length):
                        out.append(out[-dist])
        else:
            raise ValueError("deflate: reserved block type 3")
        if bfinal:
            break
    return bytes(out)


# ---------------------------------------------------------------------------
# LZ77 hash-chain matcher with one-step lazy matching
# ---------------------------------------------------------------------------


def _lz77_tokens(data: bytes) -> list[tuple]:
    """Greedy-with-lazy matcher: ('lit', byte) | ('match', length, dist).
    3-byte hash heads + chains bounded to keep worst-case linear-ish."""
    n = len(data)
    head: dict[int, int] = {}
    chain: list[int] = [-1] * n
    tokens: list[tuple] = []
    max_chain = 128

    def find(pos: int) -> tuple[int, int]:
        if pos + _MIN_MATCH > n:
            return 0, 0
        h = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        cand = head.get(h, -1)
        best_len, best_dist = 0, 0
        tries = max_chain
        limit = min(n - pos, _MAX_MATCH)
        while cand >= 0 and tries > 0 and pos - cand <= _WINDOW:
            ln = 0
            while ln < limit and data[cand + ln] == data[pos + ln]:
                ln += 1
            if ln > best_len:
                best_len, best_dist = ln, pos - cand
                if ln >= limit:
                    break
            cand = chain[cand]
            tries -= 1
        return best_len, best_dist

    def insert(pos: int) -> None:
        if pos + _MIN_MATCH <= n:
            h = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
            chain[pos] = head.get(h, -1)
            head[h] = pos

    i = 0
    while i < n:
        ln, dist = find(i)
        if ln >= _MIN_MATCH:
            # lazy: would starting one later yield a longer match?
            insert(i)
            ln2, dist2 = find(i + 1) if i + 1 < n else (0, 0)
            if ln2 > ln:
                tokens.append(("lit", data[i]))
                i += 1
                continue
            tokens.append(("match", ln, dist))
            end = i + ln
            i += 1
            while i < end:
                insert(i)
                i += 1
        else:
            tokens.append(("lit", data[i]))
            insert(i)
            i += 1
    return tokens


# ---------------------------------------------------------------------------
# Deflate
# ---------------------------------------------------------------------------


def _emit_dynamic_header(w: _BitWriter, lit_lengths: list[int],
                         dist_lengths: list[int]) -> None:
    hlit = len(lit_lengths)
    hdist = len(dist_lengths)
    all_lengths = lit_lengths + dist_lengths
    # RLE the length vector into the code-length alphabet
    cl_syms: list[tuple[int, int, int]] = []  # (symbol, extra_bits, extra)
    i = 0
    while i < len(all_lengths):
        ln = all_lengths[i]
        run = 1
        while i + run < len(all_lengths) and all_lengths[i + run] == ln:
            run += 1
        if ln == 0:
            left = run
            while left >= 11:
                take = min(left, 138)
                cl_syms.append((18, 7, take - 11))
                left -= take
            while left >= 3:
                take = min(left, 10)
                cl_syms.append((17, 3, take - 3))
                left -= take
            for _ in range(left):
                cl_syms.append((0, 0, 0))
        else:
            cl_syms.append((ln, 0, 0))
            left = run - 1
            while left >= 3:
                take = min(left, 6)
                cl_syms.append((16, 2, take - 3))
                left -= take
            for _ in range(left):
                cl_syms.append((ln, 0, 0))
        i += run
    freqs: dict[int, int] = {}
    for s, _, _ in cl_syms:
        freqs[s] = freqs.get(s, 0) + 1
    cl_lengths_map = _limited_lengths(freqs, 7)
    cl_lengths = [cl_lengths_map.get(s, 0) for s in range(19)]
    hclen = 19
    while hclen > 4 and cl_lengths[_CL_ORDER[hclen - 1]] == 0:
        hclen -= 1
    w.write(hlit - 257, 5)
    w.write(hdist - 1, 5)
    w.write(hclen - 4, 4)
    for i in range(hclen):
        w.write(cl_lengths[_CL_ORDER[i]], 3)
    cl_codes = _canonical_codes(cl_lengths)
    for s, extra_bits, extra in cl_syms:
        w.write_code(cl_codes[s], cl_lengths[s])
        if extra_bits:
            w.write(extra, extra_bits)


def deflate(data: bytes, mode: str = "dynamic") -> bytes:
    """RFC 1951 encoder.  mode: 'stored' | 'fixed' | 'dynamic'.
    Emits a single block (plus stored-block splitting at 65535)."""
    w = _BitWriter()
    if mode == "stored":
        if not data:
            w.write(1, 1)
            w.write(0, 2)
            w.align_byte()
            buf = bytearray(w.bytes())
            buf += b"\x00\x00\xff\xff"
            return bytes(buf)
        buf = bytearray()
        pos = 0
        while pos < len(data):
            chunk = data[pos:pos + 65535]
            pos += len(chunk)
            final = 1 if pos >= len(data) else 0
            bw = _BitWriter()
            bw.write(final, 1)
            bw.write(0, 2)
            bw.align_byte()
            buf += bw.bytes()
            ln = len(chunk)
            buf += bytes((ln & 0xFF, ln >> 8, (ln ^ 0xFFFF) & 0xFF,
                          (ln ^ 0xFFFF) >> 8))
            buf += chunk
        return bytes(buf)

    tokens = _lz77_tokens(data)
    if mode == "fixed":
        lit_lengths = _fixed_lit_lengths()
        dist_lengths = [5] * 30
        w.write(1, 1)
        w.write(1, 2)
    elif mode == "dynamic":
        lit_freqs: dict[int, int] = {256: 1}
        dist_freqs: dict[int, int] = {}
        for t in tokens:
            if t[0] == "lit":
                lit_freqs[t[1]] = lit_freqs.get(t[1], 0) + 1
            else:
                sym, _, _ = _length_symbol(t[1])
                lit_freqs[sym] = lit_freqs.get(sym, 0) + 1
                dsym, _, _ = _dist_symbol(t[2])
                dist_freqs[dsym] = dist_freqs.get(dsym, 0) + 1
        lit_map = _limited_lengths(lit_freqs, 15)
        dist_map = _limited_lengths(dist_freqs, 15)
        hlit = max(257, max(lit_map, default=0) + 1)
        lit_lengths = [lit_map.get(s, 0) for s in range(hlit)]
        if not dist_map:
            dist_lengths = [0]
        elif len(dist_map) == 1:
            # RFC 1951: one distance code -> one code of length 1
            only = next(iter(dist_map))
            dist_lengths = [0] * (only + 1)
            dist_lengths[only] = 1
        else:
            hdist = max(dist_map) + 1
            dist_lengths = [dist_map.get(s, 0) for s in range(hdist)]
        w.write(1, 1)
        w.write(2, 2)
        _emit_dynamic_header(w, lit_lengths, dist_lengths)
    else:
        raise ValueError(f"deflate: unknown mode {mode!r}")

    lit_codes = _canonical_codes(lit_lengths)
    dist_codes = _canonical_codes(dist_lengths)
    for t in tokens:
        if t[0] == "lit":
            w.write_code(lit_codes[t[1]], lit_lengths[t[1]])
        else:
            sym, eb, ev = _length_symbol(t[1])
            w.write_code(lit_codes[sym], lit_lengths[sym])
            if eb:
                w.write(ev, eb)
            dsym, deb, dev = _dist_symbol(t[2])
            w.write_code(dist_codes[dsym], dist_lengths[dsym])
            if deb:
                w.write(dev, deb)
    w.write_code(lit_codes[256], lit_lengths[256])
    return w.bytes()


# ---------------------------------------------------------------------------
# zlib container (RFC 1950) with our own Adler-32
# ---------------------------------------------------------------------------

_ADLER_MOD = 65521


def adler32(data: bytes, start: int = 1) -> int:
    a = start & 0xFFFF
    b = (start >> 16) & 0xFFFF
    # 5552 is the largest n with 255*n*(n+1)/2 + (n+1)*(65520) < 2^32
    for i in range(0, len(data), 5552):
        for byte in data[i:i + 5552]:
            a += byte
            b += a
        a %= _ADLER_MOD
        b %= _ADLER_MOD
    return (b << 16) | a


def zlib_compress(data: bytes, mode: str = "dynamic") -> bytes:
    """RFC 1950 stream: CMF/FLG header (deflate, 32K window), DEFLATE
    body from our encoder, big-endian Adler-32 trailer."""
    cmf = 0x78  # CM=8 deflate, CINFO=7 (32K)
    flg = 0
    rem = (cmf * 256 + flg) % 31
    if rem:
        flg += 31 - rem
    body = deflate(data, mode)
    ad = adler32(data)
    return bytes((cmf, flg)) + body + ad.to_bytes(4, "big")


def zlib_decompress(data: bytes, max_output: int | None = None) -> bytes:
    """RFC 1950 parse + RFC 1951 inflate + Adler-32 verify."""
    if len(data) < 6:
        raise ValueError("zlib: stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError(f"zlib: unsupported method {cmf & 0x0F}")
    if ((cmf << 8) | flg) % 31 != 0:
        raise ValueError("zlib: FCHECK failed")
    if flg & 0x20:
        raise ValueError("zlib: preset dictionary unsupported")
    r = _BitReader(data, 2)
    out = inflate(data, r, max_output=max_output)
    r.align_byte()
    p = r.byte_pos()
    if p + 4 > len(data):
        raise ValueError("zlib: missing Adler-32 trailer")
    expect = int.from_bytes(data[p:p + 4], "big")
    got = adler32(out)
    if expect != got:
        raise ValueError(
            f"zlib: Adler-32 mismatch {expect:#x} != {got:#x}")
    return out


def gzip_decompress(data: bytes, max_output: int | None = None) -> bytes:
    """RFC 1952 member parse (FEXTRA/FNAME/FCOMMENT/FHCRC honored)
    + inflate + CRC32/ISIZE verify (CRC32 computed from scratch)."""
    if len(data) < 18 or data[0] != 0x1F or data[1] != 0x8B:
        raise ValueError("gzip: bad magic")
    if data[2] != 8:
        raise ValueError(f"gzip: unsupported method {data[2]}")
    flg = data[3]
    p = 10
    if flg & 0x04:  # FEXTRA
        xlen = data[p] | (data[p + 1] << 8)
        p += 2 + xlen
    if flg & 0x08:  # FNAME
        p = data.index(b"\x00", p) + 1
    if flg & 0x10:  # FCOMMENT
        p = data.index(b"\x00", p) + 1
    if flg & 0x02:  # FHCRC
        p += 2
    r = _BitReader(data, p)
    out = inflate(data, r, max_output=max_output)
    r.align_byte()
    q = r.byte_pos()
    if q + 8 > len(data):
        raise ValueError("gzip: missing trailer")
    crc_expect = int.from_bytes(data[q:q + 4], "little")
    isize = int.from_bytes(data[q + 4:q + 8], "little")
    if isize != len(out) % (1 << 32):
        raise ValueError("gzip: ISIZE mismatch")
    if crc_expect != crc32(out):
        raise ValueError("gzip: CRC32 mismatch")
    return out


_CRC_TABLE: list[int] | None = None


def crc32(data: bytes) -> int:
    """CRC-32 (IEEE 802.3, reflected 0xEDB88320) from scratch."""
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tbl = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
            tbl.append(c)
        _CRC_TABLE = tbl
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF
