"""From-scratch bzip2 codec: the full pipeline in both directions —
initial run-length encoding (RLE1), the Burrows-Wheeler transform
over cyclic rotations (numpy prefix-doubling rotation sort on
encode, counting-sort T-vector walk on decode), move-to-front,
RUNA/RUNB bijective-base-2 zero-run coding (RLE2), multi-table
canonical Huffman sections with 50-symbol group selectors (selectors
themselves MTF-coded), the sparse used-byte bitmap, bzip2's
MSB-first non-reflected CRC-32 per block plus the rotating combined
stream CRC, and the MSB-first bit-level container ("BZh" + level,
48-bit block/stream magics).

External verification (tests/test_bzip2.py + m_bzip2_parity): every
stream this encoder emits decompresses byte-exactly under the REAL
stdlib bz2 (libbz2), and every stream bz2.compress emits at every
level 1-9 decodes byte-exactly under this decoder.

This is the deepest member of the from-scratch compression family
(DEFLATE, LZ4, TIFF-LZW, GIF-LZW): a block-sorting compressor whose
correctness hinges on four chained reversible transforms agreeing
bit-for-bit with an independent implementation.

No reference lineage: the reference (map2db.py) never touches bzip2;
built from the published bzip2 format documentation.
"""

from __future__ import annotations

import numpy as np

_GSIZE = 50          # symbols per Huffman selector group
_MAX_GROUPS = 6
_MAX_CODE_LEN = 20   # decoder tolerance (spec); encoder emits <= 17
_BLOCK_MAGIC = 0x314159265359
_EOS_MAGIC = 0x177245385090
_MAX_BLOCK_RAW = 700_000  # pre-RLE1 chunk; RLE1 worst case 1.25x < 900k


# ---------------------------------------------------------------------------
# MSB-first bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("_buf", "_acc", "_n")

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._buf.append((self._acc >> (self._n - 8)) & 0xFF)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def bytes(self) -> bytes:
        out = bytearray(self._buf)
        if self._n:
            out.append((self._acc << (8 - self._n)) & 0xFF)
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
                raise ValueError("bzip2: truncated stream")
            self._acc = (self._acc << 8) | self._data[self._pos]
            self._pos += 1
            self._n += 8
        v = (self._acc >> (self._n - nbits)) & ((1 << nbits) - 1)
        self._n -= nbits
        self._acc &= (1 << self._n) - 1
        return v


# ---------------------------------------------------------------------------
# bzip2 CRC-32 (poly 0x04C11DB7, MSB-first, NON-reflected)
# ---------------------------------------------------------------------------

_CRC_TABLE: list[int] | None = None


def bz_crc32(data: bytes) -> int:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tbl = []
        for n in range(256):
            c = n << 24
            for _ in range(8):
                c = ((c << 1) ^ 0x04C11DB7) if c & 0x80000000 else c << 1
                c &= 0xFFFFFFFF
            tbl.append(c)
        _CRC_TABLE = tbl
    crc = 0xFFFFFFFF
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[(crc >> 24) ^ b]
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# RLE1 (initial run-length encoding): runs of 4-255 -> 4 bytes + count
# ---------------------------------------------------------------------------


def _rle1_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        run = 1
        while i + run < n and run < 255 and data[i + run] == b:
            run += 1
        if run >= 4:
            out += bytes([b, b, b, b, run - 4])
            i += run
        else:
            out += data[i:i + run]
            i += run
    return bytes(out)


def _rle1_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    run = 0
    prev = -1
    while i < n:
        b = data[i]
        i += 1
        if run == 4:
            # this byte is a count of extra repeats of prev
            out += bytes([prev]) * b
            run = 0
            prev = -1
            continue
        if b == prev:
            run += 1
        else:
            run = 1
            prev = b
        out.append(b)
    if run == 4:
        raise ValueError("bzip2: RLE1 run missing count byte")
    return bytes(out)


# ---------------------------------------------------------------------------
# BWT over cyclic rotations (prefix doubling, numpy)
# ---------------------------------------------------------------------------


def _bwt_encode(data: bytes) -> tuple[bytes, int]:
    n = len(data)
    if n == 0:
        raise ValueError("bzip2: empty BWT block")
    arr = np.frombuffer(data, np.uint8).astype(np.int64)
    if n == 1:
        return data, 0
    rank = arr.copy()
    idx = np.arange(n)
    k = 1
    while k < n:
        key2 = rank[(idx + k) % n]
        order = np.lexsort((key2, rank))
        r_s, k_s = rank[order], key2[order]
        neq = np.empty(n, dtype=bool)
        neq[0] = False
        neq[1:] = (r_s[1:] != r_s[:-1]) | (k_s[1:] != k_s[:-1])
        new_rank = np.empty(n, np.int64)
        new_rank[order] = np.cumsum(neq)
        rank = new_rank
        if rank[order[-1]] == n - 1:
            break
        k *= 2
    order = np.argsort(rank, kind="stable")
    last = arr[(order - 1) % n].astype(np.uint8)
    orig_ptr = int(np.nonzero(order == 0)[0][0])
    return last.tobytes(), orig_ptr


def _bwt_decode(last: bytes, orig_ptr: int) -> bytes:
    n = len(last)
    if not 0 <= orig_ptr < n:
        raise ValueError("bzip2: origPtr outside block")
    arr = np.frombuffer(last, np.uint8)
    # T-vector: stable order of positions sorted by byte value
    order = np.argsort(arr, kind="stable").astype(np.int64)
    out = np.empty(n, np.uint8)
    p = order[orig_ptr]
    for i in range(n):
        out[i] = arr[p]
        p = order[p]
    return out.tobytes()


# ---------------------------------------------------------------------------
# MTF + RLE2 (RUNA/RUNB)
# ---------------------------------------------------------------------------


def _mtf_rle2_encode(data: bytes, used: list[int]) -> list[int]:
    """BWT output -> MTF symbol stream with RUNA(0)/RUNB(1) zero runs;
    values v>=1 emit symbol v+1; EOB (alpha-1) appended by caller."""
    stack = list(used)
    pos = {b: i for i, b in enumerate(stack)}
    out: list[int] = []
    zrun = 0

    def flush() -> None:
        nonlocal zrun
        r = zrun
        while r > 0:
            if r & 1:
                out.append(0)  # RUNA
                r = (r - 1) >> 1
            else:
                out.append(1)  # RUNB
                r = (r - 2) >> 1
        zrun = 0

    for b in data:
        i = pos[b]
        if i == 0:
            zrun += 1
            continue
        flush()
        # move to front
        sym = stack.pop(i)
        stack.insert(0, sym)
        for j in range(i + 1):
            pos[stack[j]] = j
        out.append(i + 1)
    flush()
    return out


def _mtf_rle2_decode(symbols, used: list[int], max_block: int) -> bytes:
    """MTF/RLE2 symbol iterator (EOB excluded) -> BWT bytes."""
    stack = list(used)
    out = bytearray()
    zrun = 0
    zbit = 0
    for s in symbols:
        if s <= 1:
            zrun += (s + 1) << zbit
            zbit += 1
            if zrun > max_block:
                raise ValueError("bzip2: zero run exceeds block size")
            continue
        if zrun:
            out += bytes([stack[0]]) * zrun
            zrun = 0
            zbit = 0
        i = s - 1
        if i >= len(stack):
            raise ValueError("bzip2: MTF index beyond alphabet")
        b = stack.pop(i)
        stack.insert(0, b)
        out.append(b)
        if len(out) > max_block:
            raise ValueError("bzip2: block overruns declared size")
    if zrun:
        out += bytes([stack[0]]) * zrun
    if len(out) > max_block:
        raise ValueError("bzip2: block overruns declared size")
    return bytes(out)


# ---------------------------------------------------------------------------
# Canonical Huffman (bzip2 style: lengths -> codes by (length, symbol))
# ---------------------------------------------------------------------------


def _assign_codes(lengths: list[int]) -> list[int]:
    codes = [0] * len(lengths)
    code = 0
    for ln in range(min(lengths), max(lengths) + 1):
        for s, l2 in enumerate(lengths):
            if l2 == ln:
                codes[s] = code
                code += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """bzip2's limit/base/perm decode tables."""

    __slots__ = ("_limit", "_base", "_perm", "_min_len", "_max_len")

    def __init__(self, lengths: list[int]) -> None:
        min_len, max_len = min(lengths), max(lengths)
        if not 1 <= min_len and max_len <= _MAX_CODE_LEN:
            raise ValueError("bzip2: code length out of range")
        perm = [s for ln in range(min_len, max_len + 1)
                for s, l2 in enumerate(lengths) if l2 == ln]
        count = [0] * (max_len + 2)
        for l2 in lengths:
            count[l2] += 1
        limit = [0] * (max_len + 2)
        base = [0] * (max_len + 2)
        code = 0
        total = 0
        for ln in range(min_len, max_len + 1):
            code += count[ln]
            limit[ln] = code - 1
            code <<= 1
            total += count[ln]
            base[ln + 1] = code - total
        self._limit = limit
        self._base = base
        self._perm = perm
        self._min_len = min_len
        self._max_len = max_len

    def read(self, r: _BitReader) -> int:
        ln = self._min_len
        code = r.read(ln)
        while True:
            if ln > self._max_len:
                raise ValueError("bzip2: invalid Huffman code")
            if code <= self._limit[ln]:
                idx = code - self._base[ln]
                if idx < 0 or idx >= len(self._perm):
                    raise ValueError("bzip2: Huffman index out of range")
                return self._perm[idx]
            code = (code << 1) | r.read(1)
            ln += 1


def _limited_lengths(freqs: list[int], limit: int) -> list[int]:
    """Package-merge over the full alphabet (all freqs >= 1)."""
    n = len(freqs)
    if n == 1:
        return [1]
    items = sorted((f, s) for s, f in enumerate(freqs))
    prev: list[tuple[int, list[int]]] = []
    for _ in range(limit):
        level = [(f, [s]) for f, s in items]
        for i in range(0, len(prev) - 1, 2):
            level.append((prev[i][0] + prev[i + 1][0],
                          prev[i][1] + prev[i + 1][1]))
        level.sort(key=lambda t: t[0])
        prev = level
    lengths = [0] * n
    for _, bundle in prev[:2 * n - 2]:
        for s in bundle:
            lengths[s] += 1
    return lengths


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def bzip2_compress(data: bytes, level: int = 9) -> bytes:
    """Raw bytes -> complete .bz2 stream (readable by stdlib bz2)."""
    if not 1 <= level <= 9:
        raise ValueError(f"bzip2: bad level {level}")
    w = _BitWriter()
    w.write(ord("B"), 8)
    w.write(ord("Z"), 8)
    w.write(ord("h"), 8)
    w.write(ord("0") + level, 8)
    combined = 0
    limit_raw = min(_MAX_BLOCK_RAW, level * 100_000 * 4 // 5)
    for off in range(0, len(data), limit_raw) if data else []:
        chunk = data[off:off + limit_raw]
        combined = (((combined << 1) | (combined >> 31)) & 0xFFFFFFFF) \
            ^ _encode_block(w, chunk)
    w.write(_EOS_MAGIC >> 24, 24)
    w.write(_EOS_MAGIC & 0xFFFFFF, 24)
    w.write(combined, 32)
    return w.bytes()


def _encode_block(w: _BitWriter, chunk: bytes) -> int:
    crc = bz_crc32(chunk)
    rle1 = _rle1_encode(chunk)
    bwt, orig_ptr = _bwt_encode(rle1)
    used = sorted(set(bwt))
    mtf = _mtf_rle2_encode(bwt, used)
    alpha = len(used) + 2
    eob = alpha - 1
    mtf.append(eob)

    w.write(_BLOCK_MAGIC >> 24, 24)
    w.write(_BLOCK_MAGIC & 0xFFFFFF, 24)
    w.write(crc, 32)
    w.write(0, 1)  # randomized: never
    w.write(orig_ptr, 24)
    # used-byte bitmaps
    groups16 = [0] * 16
    for b in used:
        groups16[b >> 4] |= 1
    for g in range(16):
        w.write(groups16[g], 1)
    for g in range(16):
        if groups16[g]:
            bits = 0
            for j in range(16):
                if (g << 4) | j in set(used):
                    bits |= 1 << (15 - j)
            w.write(bits, 16)
    # two Huffman tables (identical lengths), all selectors 0
    n_groups = 2
    n_selectors = (len(mtf) + _GSIZE - 1) // _GSIZE
    w.write(n_groups, 3)
    w.write(n_selectors, 15)
    for _ in range(n_selectors):
        w.write(0, 1)  # MTF-coded selector 0 = terminating zero bit
    freqs = [0] * alpha
    for s in mtf:
        freqs[s] += 1
    freqs = [max(1, f) for f in freqs]
    lengths = _limited_lengths(freqs, 17)
    codes = _assign_codes(lengths)
    for _ in range(n_groups):
        cur = lengths[0]
        w.write(cur, 5)
        for l2 in lengths:
            while cur < l2:
                w.write(0b10, 2)
                cur += 1
            while cur > l2:
                w.write(0b11, 2)
                cur -= 1
            w.write(0, 1)
    for s in mtf:
        w.write(codes[s], lengths[s])
    return crc


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def bzip2_decompress(data: bytes, max_output: int | None = None) -> bytes:
    """Complete .bz2 stream -> raw bytes; verifies block and combined
    CRCs.  Raises ValueError on malformed input (never IndexError /
    struct.error); max_output is the zip-bomb rail."""
    if len(data) < 10:
        raise ValueError("bzip2: stream too short")
    if data[:3] != b"BZh":
        raise ValueError(f"bzip2: bad magic {data[:3]!r}")
    level = data[3] - ord("0")
    if not 1 <= level <= 9:
        raise ValueError(f"bzip2: bad level byte {data[3]!r}")
    max_block = level * 100_000
    r = _BitReader(data, 4)
    out = bytearray()
    combined = 0
    while True:
        magic = (r.read(24) << 24) | r.read(24)
        if magic == _EOS_MAGIC:
            break
        if magic != _BLOCK_MAGIC:
            raise ValueError(f"bzip2: bad block magic {magic:#x}")
        crc_expect = r.read(32)
        if r.read(1):
            raise ValueError("bzip2: randomized blocks unsupported "
                             "(deprecated in the format)")
        orig_ptr = r.read(24)
        groups16 = [r.read(1) for _ in range(16)]
        used: list[int] = []
        for g in range(16):
            if groups16[g]:
                bits = r.read(16)
                for j in range(16):
                    if bits & (1 << (15 - j)):
                        used.append((g << 4) | j)
        if not used:
            raise ValueError("bzip2: empty used-byte map")
        alpha = len(used) + 2
        n_groups = r.read(3)
        if not 2 <= n_groups <= _MAX_GROUPS:
            raise ValueError(f"bzip2: bad group count {n_groups}")
        n_selectors = r.read(15)
        if n_selectors == 0:
            raise ValueError("bzip2: zero selectors")
        sel_mtf = []
        for _ in range(n_selectors):
            j = 0
            while r.read(1):
                j += 1
                if j >= n_groups:
                    raise ValueError("bzip2: selector beyond groups")
            sel_mtf.append(j)
        # un-MTF the selectors
        stack = list(range(n_groups))
        selectors = []
        for j in sel_mtf:
            g = stack.pop(j)
            stack.insert(0, g)
            selectors.append(g)
        decoders = []
        for _ in range(n_groups):
            cur = r.read(5)
            lengths = []
            for _ in range(alpha):
                while True:
                    if not 1 <= cur <= _MAX_CODE_LEN:
                        raise ValueError(
                            f"bzip2: code length {cur} out of range")
                    if r.read(1) == 0:
                        break
                    cur += 1 if r.read(1) == 0 else -1
                lengths.append(cur)
            decoders.append(_HuffDecoder(lengths))
        eob = alpha - 1

        def symbol_stream():
            g_idx = 0
            count = 0
            dec = None
            while True:
                if count == 0:
                    if g_idx >= len(selectors):
                        raise ValueError("bzip2: ran out of selectors")
                    dec = decoders[selectors[g_idx]]
                    g_idx += 1
                    count = _GSIZE
                s = dec.read(r)
                count -= 1
                if s == eob:
                    return
                yield s

        bwt = _mtf_rle2_decode(symbol_stream(), used, max_block)
        rle1 = _bwt_decode(bwt, orig_ptr)
        chunk = _rle1_decode(rle1)
        crc_got = bz_crc32(chunk)
        if crc_got != crc_expect:
            raise ValueError(
                f"bzip2: block CRC mismatch {crc_got:#x} != "
                f"{crc_expect:#x}")
        if max_output is not None and len(out) + len(chunk) > max_output:
            raise ValueError(
                f"bzip2: output exceeds max_output={max_output}")
        out += chunk
        combined = (((combined << 1) | (combined >> 31)) & 0xFFFFFFFF) \
            ^ crc_expect
    stream_crc = r.read(32)
    if stream_crc != combined:
        raise ValueError(
            f"bzip2: combined CRC mismatch {combined:#x} != "
            f"{stream_crc:#x}")
    return bytes(out)
