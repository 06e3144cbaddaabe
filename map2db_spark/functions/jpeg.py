"""JPEG metadata decode with stdlib only: a marker-segment walker
that extracts frame geometry (width, height, components, precision)
without entropy-decoding pixels — the metadata pass a multimodal
pipeline runs over every image BEFORE deciding what to decode (size
filters, aspect filters, thumbnail routing all need dimensions only).

Full JPEG pixel decode genuinely needs a codec library (Huffman + DCT)
and keeps its NotImplementedError slot in functions/multimodal.py;
dimensions, however, live in plain marker segments (SOF0/SOF2) and
are parsed here exactly per ITU-T T.81 §B.2: every segment is
FF <marker> <u16 length> <payload>, entropy data follows SOS, fill
bytes (extra FFs) may pad before any marker.

The shell encoder fabricates structurally-valid JPEG streams
(SOI / APP0-JFIF / COM / DQT / SOF0 / DHT / SOS + entropy / EOI) so
fixtures exercise the walker against realistic segment layouts without
needing an encoder library.
"""

from __future__ import annotations

import struct

SOI = 0xD8
EOI = 0xD9
SOS = 0xDA
APP0 = 0xE0
COM = 0xFE
DQT = 0xDB
DHT = 0xC4

# Start-of-frame markers that carry geometry (baseline, extended,
# progressive, lossless, + differential/arithmetic variants).  C4/C8/CC
# are DHT/JPG/DAC and are excluded per T.81 Table B.1.
_SOF_MARKERS = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)


class JpegError(ValueError):
    pass


def encode_jpeg_shell(width: int, height: int, ncomp: int = 3) -> bytes:
    """Assemble a structurally-valid JPEG byte stream with the given
    frame geometry.  Entropy data is deterministic filler (no 0xFF
    bytes, so the walker's segment accounting is unambiguous); the
    result is a real marker layout, not a decodable photograph."""
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise JpegError(f"dims out of u16 range: {width}x{height}")
    if ncomp not in (1, 3, 4):
        raise JpegError(f"unsupported component count {ncomp}")

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = [struct.pack(">BB", 0xFF, SOI)]
    out.append(
        seg(APP0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 2, 0, 72, 72, 0, 0))
    )
    out.append(seg(COM, b"map2db_spark jpeg shell"))
    out.append(seg(DQT, bytes([0]) + bytes((i * 3 + 1) % 255 + 1 for i in range(64))))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        sof += struct.pack(">BBB", c + 1, 0x11, 0)
    out.append(seg(0xC0, sof))
    out.append(seg(DHT, bytes([0]) + bytes(16) + b""))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += struct.pack(">BB", c + 1, 0)
    sos += b"\x00\x3f\x00"
    out.append(seg(SOS, sos))
    # deterministic entropy filler derived from the geometry; 0xFF-free
    out.append(bytes((width * 31 + height * 17 + i * 7) % 255 for i in range(32)))
    out.append(struct.pack(">BB", 0xFF, EOI))
    return b"".join(out)


def parse_jpeg_header(buf: bytes) -> dict:
    """Walk marker segments and return frame geometry + layout stats:
    ``{"width", "height", "ncomp", "precision", "progressive",
    "n_segments"}``.  Raises JpegError on a malformed stream (bad
    magic, truncated segment, missing SOF before SOS) — corrupt
    payloads must surface as errors/reject rows, never as silent
    zero-dim rows."""
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != SOI:
        raise JpegError("bad magic: not a JPEG stream")
    pos = 2
    n_segments = 0
    result: dict | None = None
    while pos < len(buf):
        # fill bytes: any number of 0xFF may precede a marker (B.1.1.2)
        if buf[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        while pos < len(buf) and buf[pos] == 0xFF:
            pos += 1
        if pos >= len(buf):
            raise JpegError("truncated stream: dangling fill bytes")
        marker = buf[pos]
        pos += 1
        if marker == EOI:
            break
        if marker in range(0xD0, 0xD8) or marker == 0x01:  # RSTn / TEM
            n_segments += 1
            continue
        if pos + 2 > len(buf):
            raise JpegError("truncated segment length")
        (length,) = struct.unpack_from(">H", buf, pos)
        if length < 2 or pos + length > len(buf):
            raise JpegError(f"segment overruns buffer at offset {pos}")
        payload = buf[pos + 2 : pos + length]
        n_segments += 1
        if marker in _SOF_MARKERS:
            if len(payload) < 6:
                raise JpegError("SOF payload too short")
            precision, height, width, ncomp = struct.unpack_from(">BHHB", payload)
            result = {
                "width": width,
                "height": height,
                "ncomp": ncomp,
                "precision": precision,
                "progressive": marker == 0xC2,
            }
        pos += length
        if marker == SOS:
            # entropy-coded data follows; geometry must already be known
            break
    if result is None:
        raise JpegError("no SOF marker before SOS/EOI")
    result["n_segments"] = n_segments
    return result
