"""MP4 / ISO-BMFF metadata decode with stdlib only: a box (atom)
walker that recovers container brand, movie timescale and duration
from ftyp/moov/mvhd — the video-duration/routing pass a multimodal
pipeline runs over every clip BEFORE deciding what to frame-sample
or transcode.  Completes the metadata triangle next to
functions/jpeg.py (images), functions/webp.py (images) and
functions/wav.py (audio); codec-level frame decode keeps its honest
NotImplementedError slot in functions/multimodal.py.

Layout per ISO/IEC 14496-12: a box is <u32be size> <4cc type>
<payload>; size includes the 8-byte header; size==1 switches to a
u64be largesize; container boxes (moov) nest boxes in their payload.
mvhd v0 carries u32be creation/modification/timescale/duration;
v1 widens the times to u64be.
"""

from __future__ import annotations

import struct


class Mp4Error(ValueError):
    pass


def encode_mp4_shell(
    timescale: int, duration: int, brand: bytes = b"isom", version: int = 0
) -> bytes:
    """Assemble a structurally-valid ISO-BMFF stream:
    ftyp + moov(mvhd) + mdat filler, with the given movie timescale
    and duration in the requested mvhd version (0 = u32 times,
    1 = u64 times)."""
    if not (0 < timescale < 1 << 32):
        raise Mp4Error(f"timescale out of u32 range: {timescale}")
    if version not in (0, 1):
        raise Mp4Error(f"mvhd version {version} not in (0, 1)")
    if version == 0 and duration >= 1 << 32:
        raise Mp4Error("v0 duration exceeds u32; use version=1")

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + typ + payload

    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    if version == 0:
        times = struct.pack(">IIII", 0, 0, timescale, duration)
    else:
        times = struct.pack(">QQIQ", 0, 0, timescale, duration)
    mvhd_payload = (
        bytes([version]) + b"\x00\x00\x00" + times
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)      # volume 1.0
        + bytes(10)                      # reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)                      # pre_defined
        + struct.pack(">I", 2)           # next_track_ID
    )
    moov = box(b"moov", box(b"mvhd", mvhd_payload))
    mdat = box(b"mdat", bytes((timescale + duration + i) % 251 for i in range(16)))
    return ftyp + moov + mdat


def parse_mp4_header(buf: bytes) -> dict:
    """Walk top-level boxes (recursing into moov) and return
    ``{"brand", "timescale", "duration", "duration_ms", "version",
    "n_boxes"}``.  duration_ms is the exact integer
    duration * 1000 // timescale.  Raises Mp4Error on malformed
    input (no ftyp first, truncated box, missing mvhd)."""
    if len(buf) < 8:
        raise Mp4Error("truncated stream: no box header")

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack_from(">I", buf, pos)
            typ = buf[pos + 4 : pos + 8]
            header = 8
            if size == 1:
                if pos + 16 > hi:
                    raise Mp4Error("truncated largesize box")
                (size,) = struct.unpack_from(">Q", buf, pos + 8)
                header = 16
            elif size == 0:  # box extends to end of enclosing scope
                size = hi - pos
            if size < header or pos + size > hi:
                raise Mp4Error(f"box {typ!r} overruns scope at offset {pos}")
            yield typ, pos + header, pos + size
            pos += size

    top = list(walk(0, len(buf)))
    if not top or top[0][0] != b"ftyp":
        raise Mp4Error("bad magic: first box is not ftyp")
    brand = buf[top[0][1] : top[0][1] + 4].decode("ascii", "replace")
    n_boxes = len(top)
    mvhd = None
    for typ, lo, hi in top:
        if typ == b"moov":
            for ityp, ilo, ihi in walk(lo, hi):
                n_boxes += 1
                if ityp == b"mvhd":
                    mvhd = (ilo, ihi)
    if mvhd is None:
        raise Mp4Error("no moov/mvhd box found")
    lo, hi = mvhd
    version = buf[lo]
    if version == 0:
        if hi - lo < 4 + 16:
            raise Mp4Error("mvhd v0 payload too short")
        _, _, timescale, duration = struct.unpack_from(">IIII", buf, lo + 4)
    elif version == 1:
        if hi - lo < 4 + 28:
            raise Mp4Error("mvhd v1 payload too short")
        _, _, timescale, duration = struct.unpack_from(">QQIQ", buf, lo + 4)
    else:
        raise Mp4Error(f"unknown mvhd version {version}")
    if timescale == 0:
        raise Mp4Error("zero timescale")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration": duration,
        "duration_ms": duration * 1000 // timescale,
        "version": version,
        "n_boxes": n_boxes,
    }
