"""shapely.wkb shim: loads() via the engine's WKB reader."""

from __future__ import annotations

import struct

from map2db_spark.geometry import wkb as _gwkb

from .geometry import LineString, MultiLineString, MultiPoint, MultiPolygon


def loads(buf: bytes):
    geom_type = struct.unpack_from("<I", buf, 1)[0]
    if geom_type == 2:  # LineString (written back by the merge pass)
        n = struct.unpack_from("<I", buf, 5)[0]
        coords = [
            struct.unpack_from("<dd", buf, 9 + 16 * i) for i in range(n)
        ]
        return LineString(coords)
    kind, parts = _gwkb.decode(buf)
    if kind == "multipoint":
        return MultiPoint(parts)
    if kind == "multilinestring":
        return MultiLineString(parts)
    return MultiPolygon([(rings[0], rings[1:]) for rings in parts])
