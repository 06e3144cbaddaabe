"""Lossy-WebP (VP8) keyframe-header codec — a real RFC 6386 boolean
(range) entropy coder, stdlib only: the follow-up that shrinks the
"lossy VP8: NotImplemented" slot from the whole format down to pixel
reconstruction.

VP8 (the lossy WebP bitstream; bitstream + reference decoder published
as RFC 6386) entropy-codes EVERYTHING after the uncompressed chunk
with a binary arithmetic coder ("boolean coder"): an 8-bit probability
p that the next bool is 0 splits the current range at
``1 + (((range - 1) * p) >> 8)``; the range renormalizes by doubling
until >= 128, one bit at a time, with carry propagation into
already-emitted bytes on the encode side.  Multi-bit header fields are
"literals": MSB-first bools at p = 128 — still genuine range coding
(odd split sizes, renormalization), not bit packing.

Implemented end to end (encoder + decoder, spec bit layout):

- the boolean coder itself, at arbitrary per-bool probabilities
  (``_BoolEncoder`` / ``_BoolDecoder``) — the engine every VP8 symbol
  rides on;
- the keyframe layout: 3-byte frame tag (keyframe bit, version,
  show_frame, 19-bit first-partition size), 9D 01 2A sync code,
  14-bit width/height with 2-bit upscale codes;
- the bool-coded keyframe header through its quantizer block:
  color_space, clamping_type, the full segmentation block (RFC 6386
  9.3: map/feature-data update flags, absolute-or-delta mode, four
  7-bit quantizer and four 6-bit loop-filter segment deltas, the
  3-probability segment-map tree — round 6), filter_type,
  loop_filter_level, sharpness_level, the loop-filter adjustment
  block (9.4: per-reference-frame and per-mode 6-bit deltas —
  round 6), DCT partition count, y_ac_qi and the five flagged+signed
  quantizer deltas, refresh_entropy_probs.

Scope split (round 6): this module owns the container walk, the
boolean coder and the header through refresh_entropy_probs; FULL
pixel reconstruction (token-probability updates, mode records,
coefficient decode, dequant, inverse WHT/DCT, intra prediction and
both loop filters) lives in functions/vp8_decode.py, driven off the
normative tables extracted into functions/vp8_tables.py — the
"pixel decode remains NotImplemented" slot is closed.
decode_vp8_header still stops at the refresh_entropy_probs boundary
by design: it is the cheap metadata path (m_vp8_header_params).

Verification (upgraded in round 6): the container ships libwebp.so.7,
so REAL lossy keyframes from the reference encoder now drive
decode_vp8_header in tests/test_libwebp_parity.py — including real
segmentation blocks, which libwebp enables at ordinary quality
settings — with decoded dims checked against WebPGetInfo and the
reference pixel buffer.  Encode-side verification remains spec-layout
construction + exact round-trip (probability-weighted bool sequences,
encoder carry propagation) and the closed-form m_vp8_header_params
oracle.  Container framing matches functions/webp.py's RIFF walker,
so both paths parse one header layout.

Reference parity note: the reference pipeline (map2db.py) contains no
raster codecs at all — this module extends the multimodal family the
same way png.py/jpeg_codec.py/webp_vp8l.py do.
"""

from __future__ import annotations

import struct

from map2db_spark.functions.webp import WebpError

_SYNC = b"\x9d\x01\x2a"


class _BoolEncoder:
    """RFC 6386 boolean encoder.  Same interval arithmetic as the
    reference flow (split = 1 + (((range-1)*prob) >> 8), doubling
    renormalization), but the low end of the interval is carried as an
    UNBOUNDED integer, so the classic carry-propagation machinery
    disappears: after s renormalization shifts the interval is
    [low, low+range) at scale 2^(8+s), the decoder consumes 16+s bits
    for the same symbols at scale 2^(16+s), and any codeword C with
    C in [low << 8, (low+range) << 8) decodes back exactly — flush
    emits C = low << 8, MSB-first, zero-padded to bytes (trailing
    zeros refine the fraction without leaving the interval)."""

    def __init__(self) -> None:
        self.range = 255
        self.low = 0
        self.shifts = 0

    def encode(self, bit: int, prob: int) -> None:
        """Encode one bool; ``prob`` (1..255) is P(bit == 0) * 256."""
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.shifts += 1

    def literal(self, value: int, nbits: int) -> None:
        """MSB-first n-bit literal at p = 128 (spec L(n))."""
        for b in range(nbits - 1, -1, -1):
            self.encode((value >> b) & 1, 128)

    def flagged_signed(self, value: int, nbits: int) -> None:
        """Spec quantizer-delta form: present flag, then magnitude
        L(nbits) + sign bool when nonzero."""
        if value == 0:
            self.encode(0, 128)
        else:
            self.encode(1, 128)
            self.literal(abs(value), nbits)
            self.encode(1 if value < 0 else 0, 128)

    def flush(self) -> bytes:
        total_bits = self.shifts + 16
        nbytes = (total_bits + 7) // 8
        c = (self.low << 8) << (nbytes * 8 - total_bits)
        return c.to_bytes(nbytes, "big")


class _BoolDecoder:
    """RFC 6386 boolean decoder (section 7.2's reference flow)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.range = 255
        self.value = 0
        self.bit_count = 0
        for _ in range(2):
            self.value = (self.value << 8) | self._next_byte()

    def _next_byte(self) -> int:
        if self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            return b
        # past-the-end reads decode as zero bits (spec: the stream is
        # padded conceptually); bounded by the caller's field count
        return 0

    def read(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            bit = 1
            self.range -= split
            self.value -= big
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value = (self.value << 1) & 0xFFFF | self._bit()
            self.range <<= 1
        return bit

    def _bit(self) -> int:
        if self.bit_count == 0:
            self.byte = self._next_byte()
            self.bit_count = 8
        self.bit_count -= 1
        return (self.byte >> self.bit_count) & 1

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read(128)
        return v

    def flagged_signed(self, nbits: int) -> int:
        if not self.read(128):
            return 0
        mag = self.literal(nbits)
        return -mag if self.read(128) else mag


# field widths of the five quantizer deltas (all 4-bit magnitudes)
_Q_DELTAS = ("y1_dc_delta", "y2_dc_delta", "y2_ac_delta",
             "uv_dc_delta", "uv_ac_delta")


def encode_vp8_keyframe_header(
    width: int,
    height: int,
    *,
    y_ac_qi: int = 24,
    q_deltas: dict[str, int] | None = None,
    loop_filter_level: int = 10,
    sharpness_level: int = 0,
    filter_type: int = 0,
    dct_partition_log2: int = 0,
    color_space: int = 0,
    clamping_type: int = 0,
    refresh_entropy_probs: int = 1,
    version: int = 0,
    segmentation: dict | None = None,
    lf_adjust: dict | None = None,
) -> bytes:
    """Encode a spec-layout lossy-WebP keyframe HEADER (RIFF + 'VP8 '
    chunk): uncompressed chunk (frame tag, sync, dims) + the boolean-
    coded first-partition header through the quantizer block.  The
    emitted first partition contains only the header fields this
    module decodes — a header fixture, not a displayable frame (the
    encode side has no pixel path; full pixel DECODE lives in
    functions/vp8_decode.py)."""
    # unlike VP8L's minus-one coding, VP8 stores dims directly in the
    # 14-bit fields, so 16384 is NOT representable (it would wrap to 0)
    if not (0 < width < (1 << 14) and 0 < height < (1 << 14)):
        raise WebpError(f"VP8 dims out of 14-bit range: {width}x{height}")
    if not 0 <= y_ac_qi <= 127:
        raise WebpError("y_ac_qi must be 0..127")
    if not 0 <= loop_filter_level <= 63:
        raise WebpError("loop_filter_level must be 0..63")
    if not 0 <= sharpness_level <= 7:
        raise WebpError("sharpness_level must be 0..7")
    if not 0 <= dct_partition_log2 <= 3:
        raise WebpError("dct_partition_log2 must be 0..3")
    q_deltas = dict(q_deltas or {})
    for k in q_deltas:
        if k not in _Q_DELTAS:
            raise WebpError(f"unknown quantizer delta {k!r}")
        if not -15 <= q_deltas[k] <= 15:
            raise WebpError(f"{k} must be -15..15")

    if segmentation is not None:
        for key, lim, count in (("q_deltas", 127, 4), ("lf_deltas", 63, 4)):
            vals = segmentation.get(key, [0] * count)
            if len(vals) != count or any(abs(v) > lim for v in vals):
                raise WebpError(f"segmentation {key}: 4 values in ±{lim}")
        probs = segmentation.get("tree_probs", [255] * 3)
        if len(probs) != 3 or any(not 0 <= p <= 255 for p in probs):
            raise WebpError("segmentation tree_probs: 3 values in 0..255")
    if lf_adjust is not None:
        for key in ("ref_deltas", "mode_deltas"):
            vals = lf_adjust.get(key, [0] * 4)
            if len(vals) != 4 or any(abs(v) > 63 for v in vals):
                raise WebpError(f"lf_adjust {key}: 4 values in ±63")

    e = _BoolEncoder()
    e.literal(color_space & 1, 1)
    e.literal(clamping_type & 1, 1)
    e.literal(1 if segmentation is not None else 0, 1)
    if segmentation is not None:
        # RFC 6386 9.3 layout mirrored by decode_vp8_header
        update_map = 1 if segmentation.get("update_map", True) else 0
        e.literal(update_map, 1)
        e.literal(1, 1)  # update_segment_feature_data
        e.literal(segmentation.get("feature_mode", 0) & 1, 1)
        for v in segmentation.get("q_deltas", [0] * 4):
            e.flagged_signed(v, 7)
        for v in segmentation.get("lf_deltas", [0] * 4):
            e.flagged_signed(v, 6)
        if update_map:
            for p in segmentation.get("tree_probs", [255] * 3):
                if p == 255:  # 255 = "keep default", coded as no-update
                    e.literal(0, 1)
                else:
                    e.literal(1, 1)
                    e.literal(p, 8)
    e.literal(filter_type & 1, 1)
    e.literal(loop_filter_level, 6)
    e.literal(sharpness_level, 3)
    e.literal(1 if lf_adjust is not None else 0, 1)
    if lf_adjust is not None:
        # RFC 6386 9.4 layout mirrored by decode_vp8_header
        e.literal(1, 1)  # mode_ref_lf_delta_update
        for v in lf_adjust.get("ref_deltas", [0] * 4):
            e.flagged_signed(v, 6)
        for v in lf_adjust.get("mode_deltas", [0] * 4):
            e.flagged_signed(v, 6)
    e.literal(dct_partition_log2, 2)
    e.literal(y_ac_qi, 7)
    for k in _Q_DELTAS:
        e.flagged_signed(q_deltas.get(k, 0), 4)
    e.literal(refresh_entropy_probs & 1, 1)
    part = e.flush()

    if len(part) >= (1 << 19):
        raise WebpError("first partition too large for the 19-bit size")
    # frame tag: bit 0 = frame type (0 = keyframe), bits 1-3 version,
    # bit 4 show_frame, bits 5-23 first partition size (LE 24-bit word)
    tag = (0) | ((version & 7) << 1) | (1 << 4) | (len(part) << 5)
    body = (
        struct.pack("<I", tag)[:3]
        + _SYNC
        + struct.pack("<H", width & 0x3FFF)
        + struct.pack("<H", height & 0x3FFF)
        + part
    )
    if len(body) % 2:
        padded = body + b"\x00"
    else:
        padded = body
    riff = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(padded))
        + b"WEBP"
        + b"VP8 "
        + struct.pack("<I", len(body))
        + padded
    )
    return riff


def decode_vp8_header(buf: bytes) -> dict:
    """Decode a lossy-WebP keyframe header through its quantizer block
    via the RFC 6386 boolean decoder: frame tag, dims, the
    segmentation block (9.3), filter params, the loop-filter
    adjustment block (9.4), DCT partition count, quantizer
    indices/deltas, refresh_entropy_probs.  Segmentation/adjustment
    keys appear in the result only when their enable bits are set
    (exactly mirroring which fields exist in the stream).  Raises
    WebpError on malformed input and NotImplementedError for the
    parts beyond the envelope (interframes; pixel reconstruction is
    never attempted)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise WebpError("bad magic: not a WebP container")
    pos = 12
    body = None
    while pos + 8 <= len(buf):
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        chunk = buf[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8 ":
            body = chunk
            break
        if fourcc == b"VP8L":
            raise WebpError("lossless VP8L chunk: use decode_vp8l")
        pos += 8 + size + (size % 2)
    if body is None:
        raise WebpError("no VP8 chunk")
    if len(body) < 10:
        raise WebpError("VP8 chunk too short for a keyframe header")
    tag = body[0] | (body[1] << 8) | (body[2] << 16)
    if tag & 1:
        raise NotImplementedError(
            "VP8 interframe: only keyframe headers are in envelope"
        )
    version = (tag >> 1) & 7
    show_frame = (tag >> 4) & 1
    part_size = tag >> 5
    if body[3:6] != _SYNC:
        raise WebpError("VP8 frame missing sync code")
    (w16,) = struct.unpack_from("<H", body, 6)
    (h16,) = struct.unpack_from("<H", body, 8)
    part = body[10 : 10 + part_size]
    if len(part) < part_size:
        raise WebpError("first partition truncated")

    d = _BoolDecoder(part)
    out = {
        "version": version,
        "show_frame": show_frame,
        "width": w16 & 0x3FFF,
        "width_scale": w16 >> 14,
        "height": h16 & 0x3FFF,
        "height_scale": h16 >> 14,
        "color_space": d.read(128),
        "clamping_type": d.read(128),
    }
    out["segmentation_enabled"] = d.read(128)
    if out["segmentation_enabled"]:
        # RFC 6386 9.3 update_segmentation(): two update flags, then
        # (optionally) per-segment quantizer/loop-filter feature
        # deltas in absolute-or-delta mode, then (optionally) the
        # 3-probability segment-map tree (255 = keep default)
        out["update_mb_segmentation_map"] = d.read(128)
        update_data = d.read(128)
        out["update_segment_feature_data"] = update_data
        if update_data:
            out["segment_feature_mode"] = d.read(128)
            out["segment_q_deltas"] = [d.flagged_signed(7) for _ in range(4)]
            out["segment_lf_deltas"] = [d.flagged_signed(6) for _ in range(4)]
        if out["update_mb_segmentation_map"]:
            out["segment_tree_probs"] = [
                d.literal(8) if d.read(128) else 255 for _ in range(3)
            ]
    out["filter_type"] = d.read(128)
    out["loop_filter_level"] = d.literal(6)
    out["sharpness_level"] = d.literal(3)
    out["loop_filter_adj_enable"] = d.read(128)
    if out["loop_filter_adj_enable"]:
        # RFC 6386 9.4 mb_lf_adjustments(): per-reference-frame and
        # per-prediction-mode loop-filter level deltas
        if d.read(128):  # mode_ref_lf_delta_update
            out["ref_lf_deltas"] = [d.flagged_signed(6) for _ in range(4)]
            out["mode_lf_deltas"] = [d.flagged_signed(6) for _ in range(4)]
    out["dct_partitions"] = 1 << d.literal(2)
    out["y_ac_qi"] = d.literal(7)
    for k in _Q_DELTAS:
        out[k] = d.flagged_signed(4)
    out["refresh_entropy_probs"] = d.read(128)
    return out
