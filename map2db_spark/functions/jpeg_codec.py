"""Baseline-sequential JPEG codec — encode AND decode — with stdlib +
numpy only (ITU-T T.81: §A.3.3 FDCT/IDCT, §B.2 marker syntax, §F.1.2
Huffman entropy coding, §F.1.2.1.1 DC difference categories, Annex C
canonical Huffman table construction).

Scope (honest contract): baseline DCT, 8-bit precision, grayscale or
3-component JFIF YCbCr, integer-ratio chroma subsampling on decode
(4:4:4 / 4:2:0 / 4:2:2 / 4:4:0 / 4:1:1 — the general MCU interleave
with hi x vi blocks per component, T.81 A.2.3; single-component scans
take the non-interleaved walk, A.2.2; upsampling is nearest/sample
replication, which the spec leaves to the decoder) and 4:4:4 / 4:2:0
/ 4:2:2 on encode (box-filter chroma prefilter).  PROGRESSIVE mode
(SOF2, T.81 G.1.2) is COMPLETE on both sides: spectral selection
(interleaved DC first passes, single-component AC band scans with
EOBn end-of-band runs) AND successive approximation (point-shifted
first passes, per-bit DC/AC refinement scans with correction-bit
buffering, G.1.2.3).  RESTART markers (DRI/RSTn, B.2.1.2) encode and
decode in both modes: byte-aligned, cyclic-order-checked, DC
predictions and EOB runs reset.  Still out of envelope (honest
NotImplementedError): arithmetic coding, differential/hierarchical
modes, 12-bit precision, 16-bit quant tables, non-integer sampling
ratios.  Inputs outside the envelope raise
NotImplementedError/JpegError — the multimodal pipeline routes them
to the quarantine path instead of mis-decoding.  This converts the
former blanket "JPEG pixel decode needs a library" stub
(functions/multimodal.py) into a working kernel for every
Huffman-coded JPEG layout real corpora contain.

Verification strategy: lossless round-trip fixtures.  A block whose
64 samples are CONSTANT has only a DC coefficient (the AC float
residue is ~1e-13 and quantizes to zero), and with a DC quantizer of
8 the pipeline value -> x8 DCT gain -> /8 quantize -> x8 dequantize
-> /8 IDCT is exact integer arithmetic in float64 — so constant-per-
block images round-trip BIT-EXACTLY through the real entropy coder,
giving the m_jpeg_pixels query a closed-form SQL oracle over real
Huffman-coded streams.  Arbitrary-content round-trips are bounded by
quantization error and covered in pytest; like G7's GEOS-parity note,
bit-parity against an external codec is container-blocked (none is
installed) and documented in COVERAGE.md.
"""

from __future__ import annotations

import struct

import numpy as np

from map2db_spark.functions.jpeg import (
    DHT,
    DQT,
    EOI,
    SOI,
    SOS,
    JpegError,
)

# zigzag scan order (T.81 Figure A.6): ZIGZAG[i] = raster index of the
# i-th coefficient in zigzag order
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 2-D DCT basis: coeff = _DCT @ block @ _DCT.T (forward),
# block = _DCT.T @ coeff @ _DCT (inverse) — T.81 A.3.3 with the 1/2
# C(u) normalization folded into the matrix
_DCT = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _DCT[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# fixture quantization table: DC quantizer 8 makes constant blocks
# round-trip exactly (see module docstring); AC quantizers are
# plausible mid-quality values (they never touch constant blocks)
FIXTURE_QTABLE = np.full(64, 16, dtype=np.int64)
FIXTURE_QTABLE[0] = 8

# simple valid Huffman tables (JPEG permits any tables; the DHT
# segment carries them, and the decoder builds whatever it reads):
# DC: 12 category symbols at 4 bits; AC: the 162 standard run/size
# symbols at 9 bits.  Suboptimal but canonical and prefix-free.
_DC_SYMBOLS = list(range(12))
_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_COUNTS = [0] * 16
_AC_COUNTS[8] = len(_AC_SYMBOLS)  # all at code length 9


def build_huffman(counts, symbols):
    """Canonical Huffman code assignment (T.81 Annex C): returns
    {symbol: (code, length)}.  counts[i] = number of codes of length
    i+1, in DHT order."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.buf.append(0x00)
        # Keep only the undrained low bits: otherwise the int accumulator
        # grows with the whole scan and every shift is O(scan length).
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (B.1.1.5)

    def restart_marker(self, n: int) -> None:
        """Byte-align and emit RSTn (B.2.1.2) — raw marker bytes, not
        subject to stuffing."""
        self.pad_to_byte()
        self.buf.append(0xFF)
        self.buf.append(0xD0 + (n & 7))

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise JpegError("truncated entropy-coded segment")
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.buf):
                raise JpegError("truncated entropy-coded segment")
            nxt = self.buf[self.pos]
            if nxt == 0x00:
                self.pos += 1  # unstuff
            else:
                raise JpegError(f"unexpected marker 0xFF{nxt:02X} in scan")
        # Mask to the live window so the accumulator stays bounded (a
        # whole-scan int makes each fill/shift O(scan length) -> O(n^2)).
        self.acc = ((self.acc << 8) | b) & ((1 << (self.nbits + 8)) - 1)
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> int:
        """Byte-align (discard the current byte's padding bits) and
        consume an RSTn marker (B.2.1.2); returns n.  The entropy
        segment before a restart is always padded to a byte boundary,
        so any buffered bits belong to already-consumed bytes."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 1 >= len(self.buf):
            raise JpegError("truncated scan: expected restart marker")
        b0, b1 = self.buf[self.pos], self.buf[self.pos + 1]
        if b0 != 0xFF or not (0xD0 <= b1 <= 0xD7):
            raise JpegError(
                f"expected restart marker, found {b0:02X}{b1:02X}"
            )
        self.pos += 2
        return b1 - 0xD0


def _category(v: int) -> int:
    """DC/AC magnitude category: bit length of |v| (T.81 F.1.2.1.1)."""
    return int(abs(v)).bit_length()


def _value_bits(v: int, size: int) -> int:
    """Additional bits encoding: v if positive, else v - 1 + 2^size."""
    return v if v >= 0 else v - 1 + (1 << size)


def _extend(bits: int, size: int) -> int:
    """Inverse of _value_bits (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _box_downsample(plane: np.ndarray, sh: int, sw: int) -> np.ndarray:
    """sh x sw box-filter downsample (the conventional JPEG chroma
    prefilter; edge rows/cols replicate when dims are odd)."""
    h, w = plane.shape
    ph, pw = -(-h // sh) * sh, -(-w // sw) * sw
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // sh, sh, pw // sw, sw).mean(axis=(1, 3))


def _component_blocks(plane: np.ndarray):
    """Pad a component plane to 8x8 multiples by edge replication and
    yield (by, bx, block) in raster block order."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    for by in range(ph // 8):
        for bx in range(pw // 8):
            yield padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]


def encode_jpeg_baseline(
    img: np.ndarray, qtable: np.ndarray | None = None,
    subsampling: str = "444", restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 image — (h, w) grayscale or (h, w, 3) RGB — as a
    real baseline-sequential JPEG: FDCT, quantization, zigzag, DC
    prediction, run/size AC coding, canonical Huffman, byte stuffing.
    subsampling picks the chroma layout for 3-component images:
    '444' (1x1 everywhere), '420' (Y at 2x2, chroma box-filtered 2x2 —
    the dominant layout in real corpora) or '422' (Y at 2x1, chroma
    halved horizontally); MCUs interleave hi*vi Y blocks with one
    block per chroma component (T.81 A.2.3).  restart_interval > 0
    emits a DRI segment and an RSTn marker every that-many MCUs (the
    entropy stream byte-aligns and the DC predictions reset at each —
    the error-resilience / parallel-decode hook real encoders use).
    The output decodes in any standards-compliant JPEG decoder."""
    if qtable is None:
        qtable = FIXTURE_QTABLE
    q_raster = np.asarray(qtable, dtype=np.int64)[UNZIGZAG].reshape(8, 8)
    img = np.asarray(img)
    if subsampling not in ("444", "420", "422"):
        raise JpegError(f"unsupported subsampling {subsampling!r}")
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
        factors = [(1, 1)]
    elif img.ndim == 3 and img.shape[2] == 3:
        ycc = _rgb_to_ycbcr(img.astype(np.float64))
        y, cb, cr = (ycc[..., i] for i in range(3))
        if subsampling == "444":
            planes = [y, cb, cr]
            factors = [(1, 1), (1, 1), (1, 1)]
        else:
            sh, sw = (2, 2) if subsampling == "420" else (1, 2)
            planes = [y, _box_downsample(cb, sh, sw),
                      _box_downsample(cr, sh, sw)]
            factors = [(sw, sh), (1, 1), (1, 1)]
    else:
        raise JpegError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    ncomp = len(planes)
    if not (0 < w <= 0xFFFF and 0 < h <= 0xFFFF):
        raise JpegError(f"dims out of u16 range: {w}x{h}")
    hmax = max(hi for hi, _vi in factors)
    vmax = max(vi for _hi, vi in factors)

    dc_map = build_huffman(_DC_COUNTS, _DC_SYMBOLS)
    ac_map = build_huffman(_AC_COUNTS, _AC_SYMBOLS)
    writer = _BitWriter()
    pred = [0] * ncomp

    def write_block(block, ci):
        coeff = _DCT @ (block - 128.0) @ _DCT.T
        qz = np.round(coeff / q_raster).astype(np.int64)
        zz = qz.reshape(-1)[ZIGZAG]
        # DC: category + additional bits of the prediction diff
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size = _category(diff)
        code, length = dc_map[size]
        writer.write(code, length)
        if size:
            writer.write(_value_bits(diff, size), size)
        # AC: run/size with ZRL and EOB
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if k > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, length = ac_map[0xF0]
                writer.write(code, length)
                run -= 16
            size = _category(v)
            code, length = ac_map[(run << 4) | size]
            writer.write(code, length)
            writer.write(_value_bits(v, size), size)
            run = 0
        if last_nz < 63:
            code, length = ac_map[0x00]
            writer.write(code, length)

    # pad each component plane to whole MCUs of ITS grid so the
    # interleaved walk below never runs off an edge
    mcus_y = -(-h // (vmax * 8))
    mcus_x = -(-w // (hmax * 8))
    padded = []
    for (hi, vi), p in zip(factors, planes):
        ph, pw = mcus_y * vi * 8, mcus_x * hi * 8
        padded.append(np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        ))
    rst = 0
    for mi in range(mcus_y * mcus_x):
        if restart_interval and mi and mi % restart_interval == 0:
            writer.restart_marker(rst)
            rst = (rst + 1) & 7
            pred[:] = [0] * ncomp
        my, mx = divmod(mi, mcus_x)
        for ci in range(ncomp):
            hi, vi = factors[ci]
            for v in range(vi):
                for hh in range(hi):
                    by = (my * vi + v) * 8
                    bx = (mx * hi + hh) * 8
                    write_block(
                        padded[ci][by:by + 8, bx:bx + 8], ci
                    )
    scan = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = [struct.pack(">BB", 0xFF, SOI)]
    out.append(seg(0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 2, 0, 72, 72, 0, 0)))
    out.append(seg(DQT, bytes([0]) + bytes(int(v) for v in qtable)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        hi, vi = factors[c]
        sof += struct.pack(">BBB", c + 1, (hi << 4) | vi, 0)  # qtable 0
    out.append(seg(0xC0, sof))

    def dht_payload(tclass: int, tid: int, counts, symbols) -> bytes:
        return bytes([tclass << 4 | tid]) + bytes(counts) + bytes(symbols)

    out.append(seg(DHT, dht_payload(0, 0, _DC_COUNTS, _DC_SYMBOLS)))
    out.append(seg(DHT, dht_payload(1, 0, _AC_COUNTS, _AC_SYMBOLS)))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += struct.pack(">BB", c + 1, 0x00)  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out.append(seg(SOS, sos))
    out.append(scan)
    out.append(struct.pack(">BB", 0xFF, EOI))
    return b"".join(out)


# progressive AC table: AC band scans need the EOBn symbols
# (run << 4 | 0 for run 0..14, T.81 G.1.2.2) that baseline's table
# omits (baseline only uses 0x00 = EOB1 and 0xF0 = ZRL).  All 176
# valid progressive AC symbols at 9 bits: Kraft sum 176/512 < 1.
_AC_PROG_SYMBOLS = [run << 4 for run in range(16)] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_PROG_COUNTS = [0] * 16
_AC_PROG_COUNTS[8] = len(_AC_PROG_SYMBOLS)


def _quantized_zigzag_blocks(plane: np.ndarray, q_raster: np.ndarray):
    """FDCT + quantize + zigzag a component plane (edge-padded to 8x8
    multiples); returns an int64 array of shape (rows, cols, 64)."""
    h, w = plane.shape
    rows, cols = -(-h // 8), -(-w // 8)
    padded = np.pad(
        plane, ((0, rows * 8 - h), (0, cols * 8 - w)), mode="edge"
    )
    zz = np.zeros((rows, cols, 64), dtype=np.int64)
    for by in range(rows):
        for bx in range(cols):
            block = padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            coeff = _DCT @ (block - 128.0) @ _DCT.T
            qz = np.round(coeff / q_raster).astype(np.int64)
            zz[by, bx] = qz.reshape(-1)[ZIGZAG]
    return zz


def _write_ac_band_scan(writer, zz, ss, se, ac_map, al=0,
                        restart_interval=0):
    """Emit one progressive AC first-pass band scan (T.81 G.1.2.2):
    run/size coding within the band, ZRL for 16-zero runs, and EOBn
    end-of-band runs spanning all-zero blocks (the decoder applies an
    EOBn read in block i to blocks i..i+n-1, so a pending EOB merges
    with following empty blocks into one run).  al > 0 applies the AC
    point transform (magnitude shift, sign preserved — G.1.2.2, NOT an
    arithmetic shift).  In a non-interleaved scan each block is its
    own MCU, so restart_interval inserts RSTn every that-many blocks
    (EOB run flushed first, reader resyncs at the marker)."""
    eobrun = 0
    rst = 0

    def flush_eob():
        nonlocal eobrun
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        code, length = ac_map[r << 4]
        writer.write(code, length)
        if r:
            writer.write(eobrun - (1 << r), r)
        eobrun = 0

    rows, cols = zz.shape[:2]
    width = se - ss + 1
    for bi in range(rows * cols):
        if restart_interval and bi and bi % restart_interval == 0:
            flush_eob()
            writer.restart_marker(rst)
            rst = (rst + 1) & 7
        by, bx = divmod(bi, cols)
        raw = zz[by, bx, ss:se + 1]
        band = np.sign(raw) * (np.abs(raw) >> al) if al else raw
        nz = np.nonzero(band)[0]
        if nz.size == 0:
            eobrun += 1
            if eobrun == 0x7FFF:  # EOBn max (r=14 + 14 extra bits)
                flush_eob()
            continue
        flush_eob()
        last = int(nz[-1])
        run = 0
        for k in range(last + 1):
            v = int(band[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, length = ac_map[0xF0]
                writer.write(code, length)
                run -= 16
            size = _category(v)
            code, length = ac_map[(run << 4) | size]
            writer.write(code, length)
            writer.write(_value_bits(v, size), size)
            run = 0
        if last < width - 1:
            # trailing zeros: this block's EOB starts (or extends) a run
            eobrun += 1
    flush_eob()


def _write_ac_refine_scan(writer, zz, ss, se, al, ac_map,
                          restart_interval=0):
    """Emit one AC successive-approximation refinement scan (T.81
    G.1.2.3, mirroring _refine_ac_block): for each block, coefficients
    whose shifted magnitude is 1 are NEWLY nonzero (run/size symbol
    with size 1 + sign bit, runs counting only zero-history
    positions); magnitudes > 1 have history and contribute one
    buffered correction bit (the next-lower magnitude bit); trailing
    zeros fold into a cross-block EOBn run whose correction bits are
    buffered and emitted right after the EOBn symbol — the stream
    order the decoder's tail loop consumes."""
    eobrun = 0
    rst = 0
    eob_bits: list[int] = []  # correction bits owed to the pending EOB run

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, length = ac_map[r << 4]
            writer.write(code, length)
            if r:
                writer.write(eobrun - (1 << r), r)
            eobrun = 0
            for b in eob_bits:
                writer.write(b, 1)
            eob_bits.clear()

    rows, cols = zz.shape[:2]
    for bi in range(rows * cols):
        if restart_interval and bi and bi % restart_interval == 0:
            flush_eob()
            writer.restart_marker(rst)
            rst = (rst + 1) & 7
        by, bx = divmod(bi, cols)
        raw = zz[by, bx, ss:se + 1]
        absval = np.abs(raw) >> al
        nz1 = np.nonzero(absval == 1)[0]
        eob_idx = int(nz1[-1]) if nz1.size else -1
        run = 0
        block_bits: list[int] = []  # correction bits since last symbol
        for k in range(se - ss + 1):
            t = int(absval[k])
            if t == 0:
                run += 1
                continue
            while run > 15 and k <= eob_idx:
                flush_eob()
                code, length = ac_map[0xF0]
                writer.write(code, length)
                run -= 16
                for b in block_bits:
                    writer.write(b, 1)
                block_bits.clear()
            if t > 1:
                block_bits.append(t & 1)
                continue
            flush_eob()
            code, length = ac_map[(run << 4) | 1]
            writer.write(code, length)
            writer.write(1 if int(raw[k]) >= 0 else 0, 1)
            for b in block_bits:
                writer.write(b, 1)
            block_bits.clear()
            run = 0
        if run > 0 or block_bits:
            eobrun += 1
            eob_bits.extend(block_bits)
            if eobrun == 0x7FFF or len(eob_bits) > 900:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(
    img: np.ndarray, qtable: np.ndarray | None = None,
    bands: tuple = ((1, 5), (6, 63)), successive: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 image — (h, w) grayscale or (h, w, 3) RGB, 4:4:4
    — as a PROGRESSIVE JPEG (SOF2, T.81 G.1.2): one interleaved DC
    scan (Ss=0, Se=0) followed by per-component AC band scans (one SOS
    per component per band, EOBn-coded).  The coefficient math is
    identical to the baseline encoder, so the same constant-block
    fixtures round-trip BIT-EXACTLY (the m_jpeg_pixels oracle trick
    extends to m_jpeg_progressive); only the scan structure and
    entropy framing differ.

    successive > 0 adds SUCCESSIVE APPROXIMATION (G.1.2.3): the first
    passes transmit coefficients point-shifted by that many bits (DC
    arithmetic shift, AC magnitude shift), then per-bit refinement
    scans (Ah = Al + 1) restore full precision — DC refinements are
    one raw bit per block, AC refinements carry newly-nonzero size-1
    symbols plus buffered correction bits, exactly what
    _refine_ac_block consumes.  All `successive` bits are refined, so
    the stream still decodes to the same pixels as baseline.

    restart_interval > 0 emits a DRI segment and RSTn markers every
    that-many MCUs in every scan (non-interleaved scans: per block).

    bands partitions the AC spectrum; each (ss, se) needs
    1 <= ss <= se <= 63.  Coefficients outside every band are simply
    never transmitted (legal, lossy), so full coverage is the default.
    """
    if qtable is None:
        qtable = FIXTURE_QTABLE
    for ss, se in bands:
        if not (1 <= ss <= se <= 63):
            raise JpegError(f"invalid AC band {ss}..{se}")
    if not (0 <= successive <= 13):
        raise JpegError(f"invalid successive approximation {successive}")
    q_raster = np.asarray(qtable, dtype=np.int64)[UNZIGZAG].reshape(8, 8)
    img = np.asarray(img)
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        ycc = _rgb_to_ycbcr(img.astype(np.float64))
        planes = [ycc[..., i] for i in range(3)]
    else:
        raise JpegError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    if not (0 < w <= 0xFFFF and 0 < h <= 0xFFFF):
        raise JpegError(f"dims out of u16 range: {w}x{h}")
    ncomp = len(planes)
    comps_zz = [_quantized_zigzag_blocks(p, q_raster) for p in planes]

    dc_map = build_huffman(_DC_COUNTS, _DC_SYMBOLS)
    ac_map = build_huffman(_AC_PROG_COUNTS, _AC_PROG_SYMBOLS)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = [struct.pack(">BB", 0xFF, SOI)]
    out.append(seg(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 2, 0, 72, 72, 0, 0)
    ))
    out.append(seg(DQT, bytes([0]) + bytes(int(v) for v in qtable)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += struct.pack(">BBB", c + 1, 0x11, 0)  # 1x1 sampling, qtable 0
    out.append(seg(0xC2, sof))  # SOF2: progressive DCT, Huffman

    def dht_payload(tclass: int, tid: int, counts, symbols) -> bytes:
        return bytes([tclass << 4 | tid]) + bytes(counts) + bytes(symbols)

    out.append(seg(DHT, dht_payload(0, 0, _DC_COUNTS, _DC_SYMBOLS)))
    out.append(seg(DHT, dht_payload(1, 0, _AC_PROG_COUNTS, _AC_PROG_SYMBOLS)))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))

    rows, cols = comps_zz[0].shape[:2]

    def dc_sos(ah: int, al: int) -> bytes:
        sos = bytes([ncomp])
        for c in range(ncomp):
            sos += struct.pack(">BB", c + 1, 0x00)
        return seg(SOS, sos + bytes([0, 0, (ah << 4) | al]))

    # scan 1: DC first pass, all components interleaved (grayscale:
    # trivially the single component's own raster order — same walk
    # the decoder takes), point-shifted by `successive`
    writer = _BitWriter()
    pred = [0] * ncomp
    rst = 0
    for mi in range(rows * cols):
        if restart_interval and mi and mi % restart_interval == 0:
            writer.restart_marker(rst)
            rst = (rst + 1) & 7
            pred = [0] * ncomp
        my, mx = divmod(mi, cols)
        for ci in range(ncomp):
            dc = int(comps_zz[ci][my, mx, 0]) >> successive
            diff = dc - pred[ci]
            pred[ci] = dc
            size = _category(diff)
            code, length = dc_map[size]
            writer.write(code, length)
            if size:
                writer.write(_value_bits(diff, size), size)
    out.append(dc_sos(0, successive))
    out.append(writer.flush())

    # AC first passes: single-component per band (progressive AC scans
    # MUST be non-interleaved, T.81 G.1.1)
    for ci in range(ncomp):
        for ss, se in bands:
            writer = _BitWriter()
            _write_ac_band_scan(
                writer, comps_zz[ci], ss, se, ac_map, al=successive,
                restart_interval=restart_interval,
            )
            sos = bytes([1]) + struct.pack(">BB", ci + 1, 0x00)
            sos += bytes([ss, se, successive])
            out.append(seg(SOS, sos))
            out.append(writer.flush())

    # refinement passes: one magnitude bit per pass, DC then AC
    for a in range(successive, 0, -1):
        writer = _BitWriter()
        rst = 0
        for mi in range(rows * cols):
            if restart_interval and mi and mi % restart_interval == 0:
                writer.restart_marker(rst)
                rst = (rst + 1) & 7
            my, mx = divmod(mi, cols)
            for ci in range(ncomp):
                bit = (int(comps_zz[ci][my, mx, 0]) >> (a - 1)) & 1
                writer.write(bit, 1)
        out.append(dc_sos(a, a - 1))
        out.append(writer.flush())
        for ci in range(ncomp):
            for ss, se in bands:
                writer = _BitWriter()
                _write_ac_refine_scan(
                    writer, comps_zz[ci], ss, se, a - 1, ac_map,
                    restart_interval=restart_interval,
                )
                sos = bytes([1]) + struct.pack(">BB", ci + 1, 0x00)
                sos += bytes([ss, se, (a << 4) | (a - 1)])
                out.append(seg(SOS, sos))
                out.append(writer.flush())

    out.append(struct.pack(">BB", 0xFF, EOI))
    return b"".join(out)


def decode_jpeg_baseline(buf: bytes, max_pixels: int = 1 << 24) -> np.ndarray:
    """Decode a baseline-sequential 8-bit JPEG — any integer-ratio
    chroma subsampling (4:4:4/4:2:0/4:2:2/4:4:0/4:1:1) — to a uint8
    array: (h, w) for 1 component, (h, w, 3) RGB for 3 (JFIF YCbCr).
    Progressive streams (SOF2) decode fully — spectral selection AND
    successive-approximation refinement; coefficients accumulate
    across scans and reconstruct once at EOI.  Restart markers are
    honored in all modes.  Raises JpegError on malformed/truncated
    streams (never a raw IndexError/struct.error — fuzz-pinned in
    tests) and NotImplementedError for arithmetic-coded /
    differential / 12-bit / non-integer-ratio inputs (the honest
    envelope; see module docstring).

    max_pixels is the codec family's decompression-bomb rail: SOF
    dims are checked before any per-MCU allocation (a 200-byte shell
    can declare 65500x65500x3)."""
    try:
        return _decode_jpeg_impl(buf, max_pixels)
    except (IndexError, KeyError, struct.error) as ex:
        raise JpegError(
            f"malformed JPEG stream ({type(ex).__name__})"
        ) from ex


def _decode_jpeg_impl(buf: bytes, max_pixels: int = 1 << 24) -> np.ndarray:
    frame, coef, qtables = _decode_to_coefficients(buf, max_pixels)
    return _reconstruct(frame, coef, qtables)


def decode_jpeg_coefficients(buf: bytes, max_pixels: int = 1 << 24):
    """Decode ONLY the entropy+marker layer: quantized DCT
    coefficients, no dequantize/IDCT/upsample/color step.

    This is the engine-INDEPENDENT surface of JPEG decode — T.81
    mandates the Huffman/marker layer bit-exactly while leaving IDCT
    rounding, chroma upsampling, and color conversion to the decoder —
    so external parity against the real libjpeg compares HERE
    (functions/libjpeg_oracle.py; the same guaranteed-equal-surface
    split as lossy WebP's YUV-plane cross-check in multimodal.py).

    Returns (width, height, comps): comps is a list in frame order of
    dicts with cid / hi / vi / qtable (64 int64, NATURAL order) /
    blocks — an (hb, wb, 64) int64 array of quantized coefficients in
    NATURAL (raster-frequency) order, cropped to the component's true
    block dims (T.81 A.1.1: ceil of the scaled sample dims / 8), MCU
    padding removed — exactly the region libjpeg's
    jpeg_read_coefficients reports via width_in_blocks /
    height_in_blocks.  Works for any component count (the pixel path
    rejects ncomp not in {1, 3}; the coefficient surface has no such
    limit).  Raises JpegError / NotImplementedError on the same
    envelope as decode_jpeg_baseline."""
    try:
        frame, coef, qtables = _decode_to_coefficients(buf, max_pixels)
    except (IndexError, KeyError, struct.error) as ex:
        raise JpegError(
            f"malformed JPEG stream ({type(ex).__name__})"
        ) from ex
    h, w, comps = frame
    hmax = max(hi for _c, _t, hi, _v in comps)
    vmax = max(vi for _c, _t, _h, vi in comps)
    out = []
    for cid, tq, hi, vi in comps:
        if tq not in qtables:
            raise JpegError(f"missing quantization table {tq}")
        zz = coef[cid]
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG] = zz
        hb = -(-(-(-(h * vi) // vmax)) // 8)
        wb = -(-(-(-(w * hi) // hmax)) // 8)
        qt_nat = np.zeros(64, dtype=np.int64)
        qt_nat[ZIGZAG] = qtables[tq]
        out.append({
            "cid": cid, "hi": hi, "vi": vi,
            "qtable": qt_nat, "blocks": nat[:hb, :wb],
        })
    return w, h, out


def _decode_to_coefficients(buf: bytes, max_pixels: int = 1 << 24):
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != SOI:
        raise JpegError("bad magic: not a JPEG stream")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    coef: dict[int, np.ndarray] = {}
    grids: dict[int, tuple[int, int]] = {}
    # per-component "first pass seen" per zigzag position: refinement
    # before a first pass (or a duplicate first pass) is malformed
    # progressive (T.81 G.1.1.1.1) and must be a typed error, not a
    # bitstream desync
    seen: dict[int, np.ndarray] = {}
    saw_scan = False
    restart_interval = 0
    while pos < len(buf):
        while pos < len(buf) and buf[pos] == 0xFF:
            pos += 1
        if pos >= len(buf):
            break
        marker = buf[pos]
        pos += 1
        if marker == EOI:
            if not saw_scan:
                raise JpegError("EOI before scan data")
            break
        if marker in (0xC6, 0xCA, 0xCE):
            raise NotImplementedError(
                "differential/arithmetic JPEG not supported"
            )
        (length,) = struct.unpack_from(">H", buf, pos)
        payload = buf[pos + 2 : pos + length]
        if marker == DQT:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                if len(payload) < p + 64:
                    raise JpegError("truncated DQT segment")
                qtables[tq] = np.frombuffer(
                    payload[p : p + 64], dtype=np.uint8
                ).astype(np.int64)
                p += 64
        elif marker == DHT:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                counts = list(payload[p + 1 : p + 17])
                n = sum(counts)
                symbols = list(payload[p + 17 : p + 17 + n])
                enc = build_huffman(counts, symbols)
                # decode table: (length, code) -> symbol
                huff[(tc, th)] = {(ln, cd): s for s, (cd, ln) in enc.items()}
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):
            progressive = marker == 0xC2
            precision, h, w, ncomp = struct.unpack_from(">BHHB", payload)
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if not (h and w):
                raise JpegError("zero frame dimension")
            comps = []
            for c in range(ncomp):
                cid, sampling, tq = struct.unpack_from(">BBB", payload, 6 + 3 * c)
                hi, vi = sampling >> 4, sampling & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise JpegError(f"invalid sampling factors {hi}x{vi}")
                comps.append((cid, tq, hi, vi))
            if h * w * ncomp > max_pixels:
                raise JpegError(
                    f"declared frame {w}x{h}x{ncomp} exceeds max_pixels="
                    f"{max_pixels} (decompression-bomb rail; raise the "
                    "limit explicitly for trusted input)"
                )
            frame = (h, w, comps)
            hmax = max(hi for _c, _t, hi, _v in comps)
            vmax = max(vi for _c, _t, _h, vi in comps)
            mcus_y = -(-h // (vmax * 8))
            mcus_x = -(-w // (hmax * 8))
            for cid, _tq, hi, vi in comps:
                if hmax % hi or vmax % vi:
                    # integer upsampling ratios only (covers 4:4:4/
                    # 4:2:0/4:2:2/4:4:0/4:1:1 — every layout real
                    # encoders emit)
                    raise NotImplementedError(
                        f"non-integer sampling ratio {hi}x{vi} vs "
                        f"{hmax}x{vmax}"
                    )
                grids[cid] = (mcus_y * vi, mcus_x * hi)
                coef[cid] = np.zeros(
                    (mcus_y * vi, mcus_x * hi, 64), dtype=np.int64
                )
                seen[cid] = np.zeros(64, dtype=bool)
        elif marker == 0xDD:
            if len(payload) < 2:
                raise JpegError("truncated DRI segment")
            (restart_interval,) = struct.unpack_from(">H", payload)
        elif marker == SOS:
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = payload[0]
            if len(payload) < 1 + 2 * ns + 3:
                raise JpegError("truncated SOS segment")
            scan_comps = []
            for c in range(ns):
                cid, tables = payload[1 + 2 * c], payload[2 + 2 * c]
                scan_comps.append((cid, tables >> 4, tables & 0xF))
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            a = payload[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            pos = _decode_scan(
                buf, pos + length, frame, scan_comps, huff, coef,
                progressive, ss, se, ah, al, seen, restart_interval,
            )
            saw_scan = True
            continue
        pos += length
    if frame is None or not saw_scan:
        raise JpegError("no scan found")
    return frame, coef, qtables


def _refine_ac_block(zz, reader, read_symbol, ac_tab, ss, se, al, eobrun):
    """AC successive-approximation refinement for one block's band
    (T.81 G.1.2.3, the libjpeg-convention walk): newly-nonzero
    coefficients arrive as size-1 run/size symbols (sign as one raw
    bit), already-nonzero coefficients receive one correction bit each
    as the run advances past them, and EOBn runs carry correction bits
    for every nonzero coefficient of the blocks they span.  eobrun
    counts ADDITIONAL blocks beyond the one that decoded the EOBn
    symbol (the first-pass convention in _decode_scan); returns the
    updated count."""
    p1 = 1 << al
    k = ss
    in_eob_tail = eobrun > 0
    if not in_eob_tail:
        while k <= se:
            rs = read_symbol(ac_tab)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s:
                if s != 1:
                    raise JpegError(
                        f"AC refinement size category {s} (must be 1)"
                    )
                newval = p1 if reader.bit() else -p1
            elif r != 15:
                # EOBn: this block's remaining coefficients refine in
                # the tail loop below; r more whole blocks follow
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.bits(r)
                in_eob_tail = True
                break
            # advance over r zero-history coefficients, refining
            # nonzero-history ones along the way (they don't count
            # toward the run)
            while k <= se:
                v = int(zz[k])
                if v != 0:
                    if reader.bit() and (v & p1) == 0:
                        zz[k] = v + (p1 if v >= 0 else -p1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s:
                if k > se:
                    raise JpegError("AC refinement run overflows band")
                zz[k] = newval
            k += 1
    else:
        eobrun -= 1
    if in_eob_tail:
        # correction bits for every already-nonzero coefficient from k
        # to the band end (both the EOBn-deciding block's tail and
        # blocks wholly inside the run, where k starts at ss)
        while k <= se:
            v = int(zz[k])
            if v != 0 and reader.bit() and (v & p1) == 0:
                zz[k] = v + (p1 if v >= 0 else -p1)
            k += 1
    return eobrun


def _decode_scan(
    buf, pos, frame, scan_comps, huff, coef, progressive, ss, se, ah, al,
    seen=None, restart_interval=0,
):
    """Entropy-decode one scan into the coefficient store and return
    the byte position of the next marker.  Baseline scans carry whole
    blocks; progressive scans carry a spectral band (T.81 G.1.2) — DC
    scans may interleave, AC scans are single-component with EOBn
    end-of-band runs.  Successive-approximation refinement passes
    (Ah = Al + 1, T.81 G.1.2.3) add one magnitude bit per pass:
    DC refinement is one raw bit per block; AC refinement interleaves
    newly-nonzero (size-1) symbols with correction bits for
    already-nonzero coefficients, including inside EOB runs.  Restart
    markers (DRI interval, RSTn) byte-align the reader, reset the DC
    predictions and any EOB run, and must appear in cyclic order."""
    h, w, comps = frame
    samp_by_cid = {cid: (hi, vi) for cid, _tq, hi, vi in comps}
    hmax = max(hi for _c, _t, hi, _v in comps)
    vmax = max(vi for _c, _t, _h, vi in comps)
    if progressive:
        if al > 13 or ah > 13:
            raise JpegError(f"invalid approximation Ah={ah} Al={al}")
        if ah != 0 and ah != al + 1:
            raise JpegError(
                "successive approximation must refine exactly one bit "
                f"(Ah={ah}, Al={al})"
            )
        if ss == 0 and se != 0:
            raise JpegError("progressive DC scan must have Se = 0")
        if ss > 0 and len(scan_comps) != 1:
            raise JpegError("progressive AC scan must be single-component")
        if not (ss <= se <= 63):
            raise JpegError(f"invalid spectral band {ss}..{se}")
        # scan-ordering constraints (G.1.1.1.1): the DC first pass
        # precedes everything; a band's first pass precedes its
        # refinements and never repeats
        if seen is not None:
            for cid, _dc, _ac in scan_comps:
                if cid not in seen:
                    raise JpegError(f"scan component {cid} not in frame")
                band = seen[cid][ss:se + 1]
                if ah == 0 and band.any():
                    raise JpegError(
                        f"duplicate first pass for band {ss}..{se}"
                    )
                if ah != 0 and not band.all():
                    raise JpegError(
                        f"refinement before first pass for band {ss}..{se}"
                    )
                if ss > 0 and not seen[cid][0]:
                    raise JpegError("AC scan before the component's DC scan")
    refining = progressive and ah != 0
    reader = _BitReader(buf, pos)

    def read_symbol(tab):
        code, ln = 0, 0
        while True:
            code = (code << 1) | reader.bit()
            ln += 1
            if (ln, code) in tab:
                return tab[(ln, code)]
            if ln > 16:
                raise JpegError("invalid Huffman code in scan")

    for cid, _dc, _ac in scan_comps:
        if cid not in samp_by_cid:
            raise JpegError(f"scan component {cid} not in frame")

    # walk entries carry their MCU ordinal so restart intervals apply
    # uniformly: in a non-interleaved scan every data unit is its own
    # MCU (T.81 A.2.2)
    if len(scan_comps) == 1:
        cid0 = scan_comps[0][0]
        hi0, vi0 = samp_by_cid[cid0]
        ch = -(-(h * vi0) // vmax)
        cw = -(-(w * hi0) // hmax)
        units_y, units_x = -(-ch // 8), -(-cw // 8)
        walk = [(cid0, scan_comps[0][1], scan_comps[0][2], by, bx, 0,
                 by * units_x + bx)
                for by in range(units_y) for bx in range(units_x)]
    else:
        mcus_y = -(-h // (vmax * 8))
        mcus_x = -(-w // (hmax * 8))
        walk = []
        for mi in range(mcus_y * mcus_x):
            my, mx = divmod(mi, mcus_x)
            for ci, (cid, dc_id, ac_id) in enumerate(scan_comps):
                hi, vi = samp_by_cid[cid]
                for v in range(vi):
                    for hh in range(hi):
                        walk.append((cid, dc_id, ac_id,
                                     my * vi + v, mx * hi + hh, ci, mi))

    pred = {ci: 0 for ci in range(len(scan_comps))}
    eobrun = 0
    expected_rst = 0
    prev_m = 0
    for cid, dc_id, ac_id, by, bx, ci, m in walk:
        if restart_interval and m != prev_m:
            prev_m = m
            if m % restart_interval == 0:
                n = reader.restart()
                if n != expected_rst:
                    raise JpegError(
                        f"restart marker out of order: RST{n}, "
                        f"expected RST{expected_rst}"
                    )
                expected_rst = (expected_rst + 1) & 7
                pred = {c: 0 for c in range(len(scan_comps))}
                eobrun = 0
        zz = coef[cid][by, bx]
        if refining:
            if ss == 0:
                # DC refinement (G.1.2.1): one raw bit per block sets
                # the next-lower magnitude bit
                if reader.bit():
                    zz[0] = int(zz[0]) | (1 << al)
            else:
                eobrun = _refine_ac_block(
                    zz, reader, read_symbol, huff[(1, ac_id)],
                    ss, se, al, eobrun,
                )
        elif not progressive:
            dc_tab = huff[(0, dc_id)]
            ac_tab = huff[(1, ac_id)]
            size = read_symbol(dc_tab)
            if size > 11:
                # 8-bit baseline DC categories are 0..11 (T.81 table
                # F.1); a larger symbol only arises from a corrupt DHT
                # and would read an unbounded diff (int64 overflow)
                raise JpegError(f"invalid DC size category {size}")
            diff = _extend(reader.bits(size), size) if size else 0
            pred[ci] += diff
            zz[0] = pred[ci]
            k = 1
            while k < 64:
                rs = read_symbol(ac_tab)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = rs >> 4, rs & 0xF
                k += run
                if k > 63:
                    raise JpegError("AC run overflows block")
                zz[k] = _extend(reader.bits(size), size)
                k += 1
        elif ss == 0:
            # progressive DC first pass: baseline diff, point-shifted
            size = read_symbol(huff[(0, dc_id)])
            if size > 11:
                raise JpegError(f"invalid DC size category {size}")
            diff = _extend(reader.bits(size), size) if size else 0
            pred[ci] += diff
            zz[0] = pred[ci] << al
        else:
            # progressive AC first pass for the band ss..se (G.1.2.2)
            if eobrun > 0:
                eobrun -= 1
                continue
            ac_tab = huff[(1, ac_id)]
            k = ss
            while k <= se:
                rs = read_symbol(ac_tab)
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    # EOBn: 2^run - 1 + extra MORE blocks end here too
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += reader.bits(run)
                    break
                k += run
                if k > se:
                    raise JpegError("AC run overflows spectral band")
                zz[k] = _extend(reader.bits(size), size) << al
                k += 1
    if progressive and seen is not None and ah == 0:
        for cid, _dc, _ac in scan_comps:
            seen[cid][ss:se + 1] = True
    # resync: discard padding bits, find the next marker
    p = reader.pos
    while p < len(buf):
        if buf[p] == 0xFF and p + 1 < len(buf) and buf[p + 1] != 0x00:
            return p
        p += 1
    raise JpegError("scan data ran past end of stream")


def _reconstruct(frame, coef, qtables):
    """Dequantize + IDCT the coefficient store once, after ALL scans
    (baseline = 1 scan; progressive = several partial ones)."""
    h, w, comps = frame
    ncomp = len(comps)
    hmax = max(hi for _c, _t, hi, _v in comps)
    vmax = max(vi for _c, _t, _h, vi in comps)
    cropped = []
    for cid, tq, hi, vi in comps:
        if tq not in qtables:
            raise JpegError(f"missing quantization table {tq}")
        q = qtables[tq]
        blocks = coef[cid]
        rows, cols = blocks.shape[:2]
        plane = np.zeros((rows * 8, cols * 8))
        for by in range(rows):
            for bx in range(cols):
                raster = np.zeros(64)
                raster[ZIGZAG] = blocks[by, bx] * q
                plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                    _DCT.T @ raster.reshape(8, 8) @ _DCT + 128.0
                )
        ch = -(-(h * vi) // vmax)  # true component dims (T.81 A.1.1)
        cw = -(-(w * hi) // hmax)
        p = plane[:ch, :cw]
        if hi != hmax or vi != vmax:
            # upsample by sample replication (the spec leaves the
            # interpolation filter to the decoder; nearest is exact
            # for the constant-chroma fixtures the oracle certifies)
            p = np.repeat(np.repeat(p, vmax // vi, axis=0),
                          hmax // hi, axis=1)[:h, :w]
        cropped.append(p[:h, :w])
    if ncomp == 1:
        out = cropped[0]
    elif ncomp == 3:
        out = _ycbcr_to_rgb(np.stack(cropped, axis=-1))
    else:
        raise NotImplementedError(f"{ncomp}-component JPEG not supported")
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
