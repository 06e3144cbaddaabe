"""EXIF metadata: encode/parse the APP1 "Exif" segment (a classic
TIFF IFD embedded in a JPEG marker — CIPA DC-008 / TIFF 6.0), plus
the 8-state orientation transform.

This is a METADATA layer, not a codec (the codec family is frozen per
VERDICT r6 #5): the parser is the same inline-value IFD walk the TIFF
container already uses, reading header bytes only.  Real pipelines
gate on these fields before any pixel decode — orientation-aware
resize, capture-time dedup, camera-source filtering — so the parse
must be header-cheap and the orientation transform exact.

Envelope (typed EXIF errors outside it): classic TIFF IFD (not
BigTIFF), IFD0 + optional Exif sub-IFD, value types BYTE/ASCII/SHORT/
LONG, values inline or offset WITHIN the APP1 segment.  MakerNotes
and GPS IFDs are skipped, not parsed.
"""

from __future__ import annotations

import struct

import numpy as np

TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4}


class ExifError(ValueError):
    """Malformed EXIF segment (never a raw struct/Index error)."""


def encode_exif_app1(
    *,
    orientation: int = 1,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    pixel_x: int | None = None,
    pixel_y: int | None = None,
    byte_order: str = "<",
) -> bytes:
    """Build the APP1 payload (starting "Exif\\0\\0") carrying the
    given fields: IFD0 holds Make/Model/Orientation/DateTime and, when
    pixel dims are given, an Exif sub-IFD with PixelXDimension /
    PixelYDimension — the layout real cameras emit."""
    if byte_order not in ("<", ">"):
        raise ExifError(f"bad byte order {byte_order!r}")
    fmt = byte_order

    def entry(tag: int, ftype: int, count: int, value_or_off: bytes) -> bytes:
        assert len(value_or_off) == 4
        return struct.pack(fmt + "HHI", tag, ftype, count) + value_or_off

    # IFD0 entries in ascending tag order (TIFF 6.0 requirement)
    ifd0: list[tuple[int, int, bytes]] = []  # (tag, ftype, raw value)
    if make is not None:
        ifd0.append((TAG_MAKE, 2, make.encode() + b"\0"))
    if model is not None:
        ifd0.append((TAG_MODEL, 2, model.encode() + b"\0"))
    if not 1 <= orientation <= 8:
        raise ExifError(f"orientation {orientation} outside 1..8")
    ifd0.append((TAG_ORIENTATION, 3, struct.pack(fmt + "H", orientation)))
    if datetime is not None:
        ifd0.append((TAG_DATETIME, 2, datetime.encode() + b"\0"))
    has_sub = pixel_x is not None and pixel_y is not None
    sub: list[tuple[int, int, bytes]] = []
    if has_sub:
        sub.append((TAG_PIXEL_X, 4, struct.pack(fmt + "I", pixel_x)))
        sub.append((TAG_PIXEL_Y, 4, struct.pack(fmt + "I", pixel_y)))

    def build_ifd(entries, base_off, overflow_extra=0):
        """Serialize one IFD at base_off; returns (ifd_bytes, tail)."""
        n = len(entries)
        tail = bytearray()
        tail_base = base_off + 2 + 12 * n + 4 + overflow_extra
        body = struct.pack(fmt + "H", n)
        for tag, ftype, raw in entries:
            count = len(raw) // _TYPE_SIZES[ftype]
            if len(raw) <= 4:
                body += entry(tag, ftype, count, raw.ljust(4, b"\0"))
            else:
                body += entry(
                    tag, ftype, count,
                    struct.pack(fmt + "I", tail_base + len(tail)),
                )
                tail += raw
        body += struct.pack(fmt + "I", 0)  # next-IFD pointer: none
        return body, bytes(tail)

    header = (b"II" if fmt == "<" else b"MM") + struct.pack(fmt + "H", 42)
    # IFD0 starts right after the 8-byte TIFF header
    entries0 = sorted(ifd0, key=lambda e: e[0])
    if has_sub:
        # reserve the sub-IFD pointer entry (tag order preserved)
        entries0 = sorted(
            entries0 + [(TAG_EXIF_IFD, 4, b"\0\0\0\0")], key=lambda e: e[0]
        )
    ifd0_bytes, tail0 = build_ifd(entries0, 8)
    sub_off = 8 + len(ifd0_bytes) + len(tail0)
    if has_sub:
        # patch the sub-IFD pointer now that its offset is known
        out = bytearray(ifd0_bytes)
        for k in range(len(entries0)):
            off = 2 + 12 * k
            (tag,) = struct.unpack_from(fmt + "H", out, off)
            if tag == TAG_EXIF_IFD:
                struct.pack_into(fmt + "I", out, off + 8, sub_off)
        ifd0_bytes = bytes(out)
        sub_bytes, tail_s = build_ifd(sorted(sub, key=lambda e: e[0]), sub_off)
    else:
        sub_bytes, tail_s = b"", b""
    tiff = header + struct.pack(fmt + "I", 8) + ifd0_bytes + tail0 \
        + sub_bytes + tail_s
    return b"Exif\0\0" + tiff


def encode_jpeg_with_exif(width: int, height: int, ncomp: int = 3,
                          **exif_fields) -> bytes:
    """A structurally-valid JPEG shell (functions/jpeg.py) with an
    EXIF APP1 segment inserted right after SOI — the real camera
    layout (APP1 precedes JFIF APP0 in practice; walkers must not
    assume APP0-first)."""
    from map2db_spark.functions.jpeg import encode_jpeg_shell

    shell = encode_jpeg_shell(width, height, ncomp)
    app1 = encode_exif_app1(**exif_fields)
    seg = struct.pack(">BBH", 0xFF, 0xE1, len(app1) + 2) + app1
    return shell[:2] + seg + shell[2:]


def _parse_ifd(tiff: bytes, fmt: str, off: int) -> dict[int, object]:
    if off + 2 > len(tiff):
        raise ExifError("IFD offset out of segment")
    (n,) = struct.unpack_from(fmt + "H", tiff, off)
    out: dict[int, object] = {}
    for k in range(n):
        eoff = off + 2 + 12 * k
        if eoff + 12 > len(tiff):
            raise ExifError("IFD entry overruns segment")
        tag, ftype = struct.unpack_from(fmt + "HH", tiff, eoff)
        (count,) = struct.unpack_from(fmt + "I", tiff, eoff + 4)
        if ftype not in _TYPE_SIZES:
            continue  # RATIONAL etc.: skipped, not parsed
        nbytes = _TYPE_SIZES[ftype] * count
        if nbytes > 1 << 16:
            raise ExifError(f"tag {tag} value absurdly long ({nbytes})")
        if nbytes <= 4:
            raw = tiff[eoff + 8 : eoff + 8 + nbytes]
        else:
            (voff,) = struct.unpack_from(fmt + "I", tiff, eoff + 8)
            if voff + nbytes > len(tiff):
                raise ExifError(f"tag {tag} value outside segment")
            raw = tiff[voff : voff + nbytes]
        if ftype == 2:
            out[tag] = raw.split(b"\0", 1)[0].decode("ascii", "replace")
        elif ftype == 1:
            out[tag] = list(raw) if count > 1 else raw[0]
        else:
            ch = "H" if ftype == 3 else "I"
            vals = list(struct.unpack(fmt + str(count) + ch, raw))
            out[tag] = vals if count > 1 else vals[0]
    return out


def parse_exif(payload: bytes) -> dict:
    """JPEG bytes -> EXIF fields from header bytes only (no pixel
    work): {"orientation", "make", "model", "datetime", "pixel_x",
    "pixel_y", "byte_order"}.  Absent fields are None; orientation
    defaults to 1 (the spec default).  Raises ExifError when the
    stream has no APP1 EXIF segment or the segment is malformed —
    never a raw IndexError/struct.error (fuzz-pinned)."""
    try:
        return _parse_exif_impl(payload)
    except (IndexError, struct.error) as ex:
        raise ExifError(f"malformed EXIF ({type(ex).__name__})") from ex


def _parse_exif_impl(payload: bytes) -> dict:
    if payload[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG stream")
    pos = 2
    tiff = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ExifError("marker desync in header walk")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\0\0":
            tiff = body[6:]
            break
        if marker == 0xDA:  # SOS: headers over
            break
        pos += 2 + seglen
    if tiff is None:
        raise ExifError("no EXIF APP1 segment")
    if tiff[:2] == b"II":
        fmt = "<"
    elif tiff[:2] == b"MM":
        fmt = ">"
    else:
        raise ExifError("bad TIFF byte-order mark in EXIF")
    (magic,) = struct.unpack_from(fmt + "H", tiff, 2)
    if magic != 42:
        raise ExifError(f"bad TIFF magic {magic} in EXIF")
    (ifd0_off,) = struct.unpack_from(fmt + "I", tiff, 4)
    ifd0 = _parse_ifd(tiff, fmt, ifd0_off)
    sub: dict[int, object] = {}
    if isinstance(ifd0.get(TAG_EXIF_IFD), int):
        sub = _parse_ifd(tiff, fmt, ifd0[TAG_EXIF_IFD])
    orientation = ifd0.get(TAG_ORIENTATION, 1)
    if not (isinstance(orientation, int) and 1 <= orientation <= 8):
        raise ExifError(f"orientation {orientation!r} outside 1..8")
    return {
        "orientation": orientation,
        "make": ifd0.get(TAG_MAKE),
        "model": ifd0.get(TAG_MODEL),
        "datetime": ifd0.get(TAG_DATETIME),
        "pixel_x": sub.get(TAG_PIXEL_X),
        "pixel_y": sub.get(TAG_PIXEL_Y),
        "byte_order": "II" if fmt == "<" else "MM",
    }


def apply_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Normalize pixels to orientation 1 (EXIF 2.32 table 5): the
    exact numpy transpose/flip for each of the 8 states — the step an
    ingest pipeline runs before any geometry-sensitive kernel.
    Orientations 5-8 swap width and height."""
    if not 1 <= orientation <= 8:
        raise ExifError(f"orientation {orientation} outside 1..8")
    if orientation == 1:
        return px
    if orientation == 2:  # mirrored horizontal
        return px[:, ::-1]
    if orientation == 3:  # rotated 180
        return px[::-1, ::-1]
    if orientation == 4:  # mirrored vertical
        return px[::-1, :]
    if orientation == 5:  # mirrored horizontal + rotated 270 CW
        return np.swapaxes(px, 0, 1)
    if orientation == 6:  # rotated 90 CW
        return np.swapaxes(px, 0, 1)[:, ::-1]
    if orientation == 7:  # mirrored horizontal + rotated 90 CW
        return np.swapaxes(px, 0, 1)[::-1, ::-1]
    return np.swapaxes(px, 0, 1)[::-1, :]  # 8: rotated 270 CW


def invert_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """The inverse transform: takes orientation-1 pixels back to how a
    camera storing this orientation tag would have laid them out.
    apply_orientation(invert_orientation(x, o), o) == x for all 8
    states (property-tested)."""
    if not 1 <= orientation <= 8:
        raise ExifError(f"orientation {orientation} outside 1..8")
    if orientation == 1:
        return px
    if orientation == 2:
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1, :]
    if orientation == 5:
        return np.swapaxes(px, 0, 1)
    if orientation == 6:
        return np.swapaxes(px[:, ::-1], 0, 1)
    if orientation == 7:
        return np.swapaxes(px[::-1, ::-1], 0, 1)
    return np.swapaxes(px[::-1, :], 0, 1)
