"""Minimal WKB codec for the three geometry kinds the engine emits:
MultiPoint, MultiLineString, MultiPolygon (2-D, little-endian), plus
their single-geometry forms for reading.

Wire format matches shapely's ``geom.wkb`` output (NDR byte order) so
databases written by this engine are byte-compatible with the
reference's (map2db.py:776, 852, 932, 1038).

Internal representation:
- MultiPoint:        list[(x, y)]
- MultiLineString:   list[list[(x, y)]]
- MultiPolygon:      list[list[list[(x, y)]]]   # polygon -> rings (shell first)
"""

from __future__ import annotations

import struct

POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6

_HDR = struct.Struct("<bI")
_D2 = struct.Struct("<2d")
_I = struct.Struct("<I")


def _pts(coords) -> bytes:
    return _I.pack(len(coords)) + b"".join(_D2.pack(x, y) for x, y in coords)


def encode_multipoint(points) -> bytes:
    out = _HDR.pack(1, MULTIPOINT) + _I.pack(len(points))
    for x, y in points:
        out += _HDR.pack(1, POINT) + _D2.pack(x, y)
    return out


def encode_multilinestring(lines) -> bytes:
    out = _HDR.pack(1, MULTILINESTRING) + _I.pack(len(lines))
    for line in lines:
        out += _HDR.pack(1, LINESTRING) + _pts(line)
    return out


def encode_multipolygon(polygons) -> bytes:
    out = _HDR.pack(1, MULTIPOLYGON) + _I.pack(len(polygons))
    for rings in polygons:
        out += _HDR.pack(1, POLYGON) + _I.pack(len(rings))
        for ring in rings:
            out += _pts(ring)
    return out


class _Reader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def header(self) -> int:
        order = self.buf[self.pos]
        if order != 1:
            raise ValueError("only NDR (little-endian) WKB supported")
        (gtype,) = _I.unpack_from(self.buf, self.pos + 1)
        self.pos += 5
        return gtype & 0xFF  # mask any SRID/Z flags

    def u32(self) -> int:
        (v,) = _I.unpack_from(self.buf, self.pos)
        self.pos += 4
        return v

    def coords(self):
        n = self.u32()
        out = []
        for _ in range(n):
            x, y = _D2.unpack_from(self.buf, self.pos)
            self.pos += 16
            out.append((x, y))
        return out


def decode(buf: bytes):
    """Decode WKB -> (kind, parts) where kind is 'multipoint' /
    'multilinestring' / 'multipolygon' (single geometries are promoted
    to their multi form).  Malformed/truncated input raises ValueError
    (never a raw struct.error/IndexError — fuzz-pinned; the engine
    normally decodes only its own encoder's output, but round-tripped
    SQLite geodatabases are an external surface)."""
    try:
        return _decode_impl(buf)
    except (struct.error, IndexError) as ex:
        raise ValueError(f"malformed WKB ({type(ex).__name__})") from ex


def _decode_impl(buf: bytes):
    r = _Reader(buf)
    gtype = r.header()
    if gtype == POINT:
        x, y = _D2.unpack_from(r.buf, r.pos)
        return "multipoint", [(x, y)]
    if gtype == LINESTRING:
        return "multilinestring", [r.coords()]
    if gtype == POLYGON:
        return "multipolygon", [[r.coords() for _ in range(r.u32())]]
    if gtype == MULTIPOINT:
        n = r.u32()
        pts = []
        for _ in range(n):
            if r.header() != POINT:
                raise ValueError("malformed MultiPoint")
            x, y = _D2.unpack_from(r.buf, r.pos)
            r.pos += 16
            pts.append((x, y))
        return "multipoint", pts
    if gtype == MULTILINESTRING:
        n = r.u32()
        lines = []
        for _ in range(n):
            if r.header() != LINESTRING:
                raise ValueError("malformed MultiLineString")
            lines.append(r.coords())
        return "multilinestring", lines
    if gtype == MULTIPOLYGON:
        n = r.u32()
        polys = []
        for _ in range(n):
            if r.header() != POLYGON:
                raise ValueError("malformed MultiPolygon")
            polys.append([r.coords() for _ in range(r.u32())])
        return "multipolygon", polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")
