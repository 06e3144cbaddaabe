"""From-scratch LZMA1 codec (.lzma "alone" format): the full binary
range decoder (11-bit adaptive probabilities, 2^24 normalization),
the 12-state literal/match state machine, context-modeled literals
(lc/lp/pb with the matched-literal path after matches), match and
rep-match length coders (choice/low/mid/high bit trees), position
slot trees with SpecPos reverse bit-trees and Align bits, the four
rep-distance history, and the end-of-stream marker (the
0xFFFFFFFF-distance match).  Plus an encoding-side range coder
(shift-low carry propagation) driving a literal-only LZMA encoder —
a legal stream any conforming decoder accepts (the honest encoder
envelope: no match search; the decoder is complete).

External verification (tests/test_lzma.py + m_lzma_parity): every
stream stdlib lzma emits (FORMAT_ALONE, all presets 0-9, custom
lc/lp/pb filter specs) decodes byte-exactly under this decoder, and
every stream our encoder emits decompresses byte-exactly under
stdlib lzma (liblzma).  Completes the from-scratch counterpart set
for ALL THREE stdlib compression modules: zlib (deflate_codec), bz2
(bzip2_codec), lzma (this).

No reference lineage: the reference (map2db.py) never touches LZMA;
built from the published LZMA specification (7-zip lzma.txt /
LZMA SDK documentation).
"""

from __future__ import annotations

_KNUM_STATES = 12
_KNUM_POS_SLOT_BITS = 6
_KNUM_ALIGN_BITS = 4
_KEND_POS_MODEL = 14
_KNUM_FULL_DISTANCES = 1 << (_KEND_POS_MODEL >> 1)
_KMATCH_MIN_LEN = 2
_PROB_INIT = 1024  # 2048 / 2


# ---------------------------------------------------------------------------
# Range decoder
# ---------------------------------------------------------------------------


class _RangeDecoder:
    __slots__ = ("_data", "_pos", "code", "range")

    def __init__(self, data: bytes, pos: int) -> None:
        if pos + 5 > len(data):
            raise ValueError("lzma: truncated range-coder init")
        if data[pos] != 0:
            raise ValueError("lzma: first range byte must be zero")
        self.code = int.from_bytes(data[pos + 1:pos + 5], "big")
        self.range = 0xFFFFFFFF
        self._data = data
        self._pos = pos + 5

    def _normalize(self) -> None:
        while self.range < (1 << 24):
            self.range = (self.range << 8) & 0xFFFFFFFF
            nxt = self._data[self._pos] if self._pos < len(self._data) \
                else 0
            if self._pos >= len(self._data) + 4:
                raise ValueError("lzma: range coder ran past input")
            self._pos += 1
            self.code = ((self.code << 8) | nxt) & 0xFFFFFFFF

    def bit(self, probs: list[int], i: int) -> int:
        p = probs[i]
        bound = (self.range >> 11) * p
        if self.code < bound:
            self.range = bound
            probs[i] = p + ((2048 - p) >> 5)
            b = 0
        else:
            self.range -= bound
            self.code -= bound
            probs[i] = p - (p >> 5)
            b = 1
        self._normalize()
        return b

    def direct_bits(self, n: int) -> int:
        out = 0
        for _ in range(n):
            self.range >>= 1
            if self.code >= self.range:
                self.code -= self.range
                bit = 1
            else:
                bit = 0
            if self.code == self.range:
                raise ValueError("lzma: range coder corruption")
            self._normalize()
            out = (out << 1) | bit
        return out

    def bittree(self, probs: list[int], nbits: int) -> int:
        m = 1
        for _ in range(nbits):
            m = (m << 1) | self.bit(probs, m)
        return m - (1 << nbits)

    def bittree_rev(self, probs: list[int], nbits: int) -> int:
        m = 1
        out = 0
        for i in range(nbits):
            b = self.bit(probs, m)
            m = (m << 1) | b
            out |= b << i
        return out

    def finished(self) -> bool:
        return self.code == 0


def _new_probs(n: int) -> list[int]:
    return [_PROB_INIT] * n


class _LenDecoder:
    def __init__(self) -> None:
        self.choice = _new_probs(2)
        self.low = [_new_probs(8) for _ in range(16)]
        self.mid = [_new_probs(8) for _ in range(16)]
        self.high = _new_probs(256)

    def decode(self, rc: _RangeDecoder, pos_state: int) -> int:
        if rc.bit(self.choice, 0) == 0:
            return rc.bittree(self.low[pos_state], 3)
        if rc.bit(self.choice, 1) == 0:
            return 8 + rc.bittree(self.mid[pos_state], 3)
        return 16 + rc.bittree(self.high, 8)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def lzma_decompress(data: bytes, max_output: int | None = None) -> bytes:
    """.lzma (FORMAT_ALONE) stream -> raw bytes.  Handles both
    known-size headers and the 0xFF..FF unknown-size + end-marker
    convention.  Raises ValueError on malformed input; max_output is
    the zip-bomb rail (applied on top of the declared size)."""
    if len(data) < 13:
        raise ValueError("lzma: header too short")
    props = data[0]
    if props >= 9 * 5 * 5:
        raise ValueError(f"lzma: invalid properties byte {props}")
    lc = props % 9
    lp = (props // 9) % 5
    pb = props // 45
    # dict size (data[1:5]) only bounds window memory; the python-side
    # history is the output buffer itself
    size = int.from_bytes(data[5:13], "little")
    unknown_size = size == 0xFFFFFFFFFFFFFFFF
    if not unknown_size and max_output is not None and size > max_output:
        raise ValueError(f"lzma: declared size exceeds "
                         f"max_output={max_output}")
    rc = _RangeDecoder(data, 13)

    is_match = [_new_probs(16) for _ in range(_KNUM_STATES)]
    is_rep = _new_probs(_KNUM_STATES)
    is_rep_g0 = _new_probs(_KNUM_STATES)
    is_rep_g1 = _new_probs(_KNUM_STATES)
    is_rep_g2 = _new_probs(_KNUM_STATES)
    is_rep0_long = [_new_probs(16) for _ in range(_KNUM_STATES)]
    pos_slot = [_new_probs(1 << _KNUM_POS_SLOT_BITS) for _ in range(4)]
    spec_pos = _new_probs(_KNUM_FULL_DISTANCES - _KEND_POS_MODEL)
    align_probs = _new_probs(1 << _KNUM_ALIGN_BITS)
    len_dec = _LenDecoder()
    rep_len_dec = _LenDecoder()
    literal = [_new_probs(0x300) for _ in range(1 << (lc + lp))]

    out = bytearray()
    state = 0
    rep0 = rep1 = rep2 = rep3 = 0
    pb_mask = (1 << pb) - 1
    lp_mask = (1 << lp) - 1

    def lit_state() -> int:
        prev = out[-1] if out else 0
        return ((len(out) & lp_mask) << lc) + (prev >> (8 - lc))

    while True:
        if not unknown_size and len(out) >= size:
            break
        if max_output is not None and len(out) > max_output:
            raise ValueError(f"lzma: output exceeds "
                             f"max_output={max_output}")
        pos_state = len(out) & pb_mask
        if rc.bit(is_match[state], pos_state) == 0:
            probs = literal[lit_state()]
            if state >= 7:  # matched literal
                match_byte = out[-rep0 - 1] if rep0 < len(out) else 0
                if rep0 >= len(out):
                    raise ValueError("lzma: match byte before start")
                sym = 1
                while sym < 0x100:
                    match_bit = (match_byte >> 7) & 1
                    match_byte = (match_byte << 1) & 0xFF
                    b = rc.bit(probs,
                               ((1 + match_bit) << 8) + sym)
                    sym = (sym << 1) | b
                    if match_bit != b:
                        while sym < 0x100:
                            sym = (sym << 1) | rc.bit(probs, sym)
                        break
            else:
                sym = 1
                while sym < 0x100:
                    sym = (sym << 1) | rc.bit(probs, sym)
            out.append(sym & 0xFF)
            state = 0 if state < 4 else (state - 3 if state < 10
                                         else state - 6)
            continue
        # match
        if rc.bit(is_rep, state) == 1:
            if not out:
                raise ValueError("lzma: rep match at stream start")
            if rc.bit(is_rep_g0, state) == 0:
                if rc.bit(is_rep0_long[state], pos_state) == 0:
                    # short rep: 1 byte at rep0
                    state = 9 if state < 7 else 11
                    if rep0 >= len(out):
                        raise ValueError("lzma: rep0 beyond history")
                    out.append(out[-rep0 - 1])
                    continue
            else:
                if rc.bit(is_rep_g1, state) == 0:
                    dist = rep1
                    rep1 = rep0
                    rep0 = dist
                elif rc.bit(is_rep_g2, state) == 0:
                    dist = rep2
                    rep2 = rep1
                    rep1 = rep0
                    rep0 = dist
                else:
                    dist = rep3
                    rep3 = rep2
                    rep2 = rep1
                    rep1 = rep0
                    rep0 = dist
            length = rep_len_dec.decode(rc, pos_state) + _KMATCH_MIN_LEN
            state = 8 if state < 7 else 11
        else:
            rep3, rep2, rep1 = rep2, rep1, rep0
            length = len_dec.decode(rc, pos_state) + _KMATCH_MIN_LEN
            state = 7 if state < 7 else 10
            slot_ctx = min(length - _KMATCH_MIN_LEN, 3)
            slot = rc.bittree(pos_slot[slot_ctx], _KNUM_POS_SLOT_BITS)
            if slot < 4:
                rep0 = slot
            else:
                nd = (slot >> 1) - 1
                rep0 = (2 | (slot & 1)) << nd
                if slot < _KEND_POS_MODEL:
                    # SpecPos reverse tree rooted at rep0 - slot
                    base = rep0 - slot - 1
                    m = 1
                    val = 0
                    for i in range(nd):
                        b = rc.bit(spec_pos, base + m)
                        m = (m << 1) | b
                        val |= b << i
                    rep0 += val
                else:
                    rep0 += rc.direct_bits(nd - _KNUM_ALIGN_BITS) \
                        << _KNUM_ALIGN_BITS
                    rep0 += rc.bittree_rev(align_probs,
                                           _KNUM_ALIGN_BITS)
            if rep0 == 0xFFFFFFFF:
                # end-of-stream marker
                if not unknown_size and len(out) != size:
                    raise ValueError("lzma: early end marker")
                break
        if rep0 >= len(out):
            raise ValueError("lzma: match distance beyond history")
        if max_output is not None and len(out) + length > max_output:
            raise ValueError(f"lzma: output exceeds "
                             f"max_output={max_output}")
        dist = rep0 + 1
        if dist >= length:
            start = len(out) - dist
            out += out[start:start + length]
        else:
            for _ in range(length):
                out.append(out[-dist])
    if not unknown_size and len(out) != size:
        raise ValueError(
            f"lzma: output size {len(out)} != declared {size}")
    return bytes(out)


# ---------------------------------------------------------------------------
# Range encoder + literal-only LZMA encoder
# ---------------------------------------------------------------------------


class _RangeEncoder:
    __slots__ = ("low", "range", "cache", "cache_size", "out")

    def __init__(self) -> None:
        self.low = 0
        self.range = 0xFFFFFFFF
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def _shift_low(self) -> None:
        if self.low < 0xFF000000 or self.low > 0xFFFFFFFF:
            carry = self.low >> 32
            self.out.append((self.cache + carry) & 0xFF)
            for _ in range(self.cache_size - 1):
                self.out.append((0xFF + carry) & 0xFF)
            self.cache = (self.low >> 24) & 0xFF
            self.cache_size = 0
        self.cache_size += 1
        self.low = (self.low << 8) & 0xFFFFFFFF

    def bit(self, probs: list[int], i: int, b: int) -> None:
        p = probs[i]
        bound = (self.range >> 11) * p
        if b == 0:
            self.range = bound
            probs[i] = p + ((2048 - p) >> 5)
        else:
            self.low += bound
            self.range -= bound
            probs[i] = p - (p >> 5)
        while self.range < (1 << 24):
            self.range = (self.range << 8) & 0xFFFFFFFF
            self._shift_low()

    def flush(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


def lzma_compress_literal(data: bytes, lc: int = 3, lp: int = 0,
                          pb: int = 2) -> bytes:
    """Raw bytes -> a legal .lzma (FORMAT_ALONE) stream using literals
    only (no match search — the honest encoder envelope), with the
    exact uncompressed size in the header.  Readable by any
    conforming decoder including stdlib lzma."""
    if not (0 <= lc <= 8 and 0 <= lp <= 4 and 0 <= pb <= 4):
        raise ValueError("lzma: bad lc/lp/pb")
    props = (pb * 5 + lp) * 9 + lc
    header = bytes([props]) + (1 << 24).to_bytes(4, "little") \
        + len(data).to_bytes(8, "little")
    enc = _RangeEncoder()
    is_match = [_new_probs(16) for _ in range(_KNUM_STATES)]
    literal = [_new_probs(0x300) for _ in range(1 << (lc + lp))]
    state = 0
    pb_mask = (1 << pb) - 1
    lp_mask = (1 << lp) - 1
    for pos, byte in enumerate(data):
        enc.bit(is_match[state], pos & pb_mask, 0)
        prev = data[pos - 1] if pos else 0
        ctx = ((pos & lp_mask) << lc) + (prev >> (8 - lc))
        probs = literal[ctx]
        sym = 1
        for k in range(7, -1, -1):
            b = (byte >> k) & 1
            enc.bit(probs, sym, b)
            sym = (sym << 1) | b
        state = 0 if state < 4 else (state - 3 if state < 10
                                     else state - 6)
    return header + enc.flush()
