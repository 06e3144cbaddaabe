"""WebP metadata decode with stdlib only: RIFF chunk walk + frame
geometry extraction for all three container layouts — lossy (VP8 ),
lossless (VP8L) and extended (VP8X) — without entropy-decoding
pixels.  The multimodal sibling of functions/jpeg.py: the dimension /
layout-filter pass runs over every image, full pixel decode keeps its
honest NotImplementedError slot for pixels; keyframe-header fields
decode for real through functions/vp8.py's RFC 6386 boolean coder.

Layout per the public container spec (RFC-style layout published by
the WebP project):
- RIFF: 'RIFF' <u32le size> 'WEBP', then chunks of
  <fourcc> <u32le size> <payload, padded to even>.
- 'VP8 ': 3-byte frame tag, sync code 9D 01 2A, then u16le width and
  u16le height, each 14 bits + 2 scale bits.
- 'VP8L': signature byte 0x2F, then 28 bits LSB-first packing
  (width-1 in 14 bits, height-1 in 14 bits).
- 'VP8X': 4 bytes flags/reserved, then 24-bit-le canvas width-1 and
  height-1.

The shell encoder fabricates each layout with deterministic geometry
so fixtures exercise the walker without an encoder library.
"""

from __future__ import annotations

import struct


class WebpError(ValueError):
    pass


def encode_webp_shell(width: int, height: int, layout: str = "VP8 ") -> bytes:
    """Assemble a structurally-valid WebP container with the given
    frame geometry in one of the three layouts ('VP8 ', 'VP8L',
    'VP8X').  Pixel payload is deterministic filler."""
    if layout == "VP8 ":
        if not (0 < width < (1 << 14) and 0 < height < (1 << 14)):
            raise WebpError(f"VP8 dims out of 14-bit range: {width}x{height}")
        body = bytes([0x00, 0x00, 0x00])  # frame tag (keyframe bits unused here)
        body += bytes([0x9D, 0x01, 0x2A])
        body += struct.pack("<HH", width, height)
        body += bytes((width * 7 + height * 13 + i) % 251 for i in range(10))
    elif layout == "VP8L":
        if not (0 < width <= (1 << 14) and 0 < height <= (1 << 14)):
            raise WebpError(f"VP8L dims out of range: {width}x{height}")
        packed = (width - 1) | ((height - 1) << 14)
        body = bytes([0x2F]) + struct.pack("<I", packed)
        body += bytes((width * 3 + height * 11 + i) % 251 for i in range(10))
    elif layout == "VP8X":
        if not (0 < width <= (1 << 24) and 0 < height <= (1 << 24)):
            raise WebpError(f"VP8X dims out of range: {width}x{height}")
        body = bytes(4)  # flags + reserved
        body += struct.pack("<I", width - 1)[:3]
        body += struct.pack("<I", height - 1)[:3]
    else:
        raise WebpError(f"unknown layout {layout!r}")

    chunk = layout.encode("ascii") + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def parse_webp_header(buf: bytes) -> dict:
    """Walk the RIFF container and return
    ``{"width", "height", "layout", "n_chunks"}``.  Raises WebpError
    on malformed input (bad magic, truncated chunk, no frame chunk) —
    corrupt payloads surface as errors, never silent zero-dim rows."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise WebpError("bad magic: not a WebP (RIFF/WEBP) stream")
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    end = min(len(buf), 8 + riff_size)
    pos = 12
    n_chunks = 0
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        payload = buf[pos + 8 : pos + 8 + size]
        if len(payload) < size:
            raise WebpError(f"truncated chunk {fourcc!r} at offset {pos}")
        n_chunks += 1
        if fourcc == b"VP8 ":
            if len(payload) < 10 or payload[3:6] != b"\x9d\x01\x2a":
                raise WebpError("VP8 frame missing sync code")
            w, h = struct.unpack_from("<HH", payload, 6)
            return {
                "width": w & 0x3FFF,
                "height": h & 0x3FFF,
                "layout": "VP8 ",
                "n_chunks": n_chunks,
            }
        if fourcc == b"VP8L":
            if len(payload) < 5 or payload[0] != 0x2F:
                raise WebpError("VP8L missing signature byte")
            (packed,) = struct.unpack_from("<I", payload, 1)
            return {
                "width": (packed & 0x3FFF) + 1,
                "height": ((packed >> 14) & 0x3FFF) + 1,
                "layout": "VP8L",
                "n_chunks": n_chunks,
            }
        if fourcc == b"VP8X":
            if len(payload) < 10:
                raise WebpError("VP8X payload too short")
            w = int.from_bytes(payload[4:7], "little") + 1
            h = int.from_bytes(payload[7:10], "little") + 1
            return {
                "width": w,
                "height": h,
                "layout": "VP8X",
                "n_chunks": n_chunks,
            }
        pos += 8 + size + (size % 2)
    raise WebpError("no VP8 /VP8L/VP8X frame chunk found")
