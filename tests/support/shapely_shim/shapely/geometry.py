"""Geometry classes for the shim: thin wrappers over coordinate lists
that delegate every geometric decision to map2db_spark.geometry.*"""

from __future__ import annotations

import struct

from map2db_spark.geometry import clip as _clip
from map2db_spark.geometry import normalize as _norm
from map2db_spark.geometry import repair as _repair
from map2db_spark.geometry import union as _union
from map2db_spark.geometry import wkb as _gwkb


def _wkt_coords(pts):
    return ", ".join(f"{x} {y}" for x, y in pts)


class _Base:
    geom_type = "Geometry"

    @property
    def is_empty(self):
        raise NotImplementedError

    @property
    def wkt(self) -> str:  # used by the reference only for logging
        return f"{self.geom_type.upper()} <shim>"


class Point(_Base):
    geom_type = "Point"

    def __init__(self, x, y):
        self.x, self.y = float(x), float(y)

    @property
    def coords(self):
        return [(self.x, self.y)]

    @property
    def is_empty(self):
        return False


class LineString(_Base):
    geom_type = "LineString"

    def __init__(self, coords):
        self._coords = [(float(x), float(y)) for x, y in coords]

    @property
    def coords(self):
        return list(self._coords)

    @property
    def is_empty(self):
        return len(self._coords) == 0

    def normalize(self):
        return LineString(_norm.normalize_line(list(self._coords)))

    @property
    def wkb(self) -> bytes:
        out = [struct.pack("<BI", 1, 2), struct.pack("<I", len(self._coords))]
        for x, y in self._coords:
            out.append(struct.pack("<dd", x, y))
        return b"".join(out)


class Polygon(_Base):
    geom_type = "Polygon"

    def __init__(self, shell, holes=None):
        def ring(r):
            return [(float(x), float(y)) for x, y in r]

        self.rings = [ring(shell)] + [ring(h) for h in (holes or [])]

    @property
    def is_empty(self):
        return not self.rings


class MultiPoint(_Base):
    geom_type = "MultiPoint"

    def __init__(self, points):
        self.points = [
            (p.x, p.y) if isinstance(p, Point) else (float(p[0]), float(p[1]))
            for p in points
        ]

    @property
    def geoms(self):
        return [Point(x, y) for x, y in self.points]

    @property
    def is_empty(self):
        return not self.points

    def normalize(self):
        return MultiPoint(_norm.normalize_multipoint(self.points))

    def union(self, other):
        return MultiPoint(_union.union_points([self.points, other.points]))

    @property
    def wkb(self) -> bytes:
        return _gwkb.encode_multipoint(self.points)


class MultiLineString(_Base):
    geom_type = "MultiLineString"

    def __init__(self, lines):
        self.lines = [
            list(ln.coords) if isinstance(ln, LineString)
            else [(float(x), float(y)) for x, y in ln]
            for ln in lines
        ]

    @property
    def geoms(self):
        return [LineString(ln) for ln in self.lines]

    @property
    def is_empty(self):
        return not self.lines

    def normalize(self):
        return MultiLineString(_norm.normalize_multilinestring(self.lines))

    def union(self, other):
        return MultiLineString(_union.union_lines([self.lines, other.lines]))

    @property
    def wkb(self) -> bytes:
        return _gwkb.encode_multilinestring(self.lines)


class MultiPolygon(_Base):
    geom_type = "MultiPolygon"

    def __init__(self, polys, _forced_invalid: bool = False):
        out = []
        for p in polys:
            if isinstance(p, Polygon):
                out.append([list(r) for r in p.rings])
            else:  # (shell, holes) pair, as the reference builds them
                shell, holes = p
                out.append(
                    [[(float(x), float(y)) for x, y in shell]]
                    + [[(float(x), float(y)) for x, y in h] for h in holes]
                )
        self.polys = out
        self._forced_invalid = _forced_invalid

    @property
    def geoms(self):
        return [Polygon(rings[0], rings[1:]) for rings in self.polys]

    @property
    def is_empty(self):
        return not self.polys

    @property
    def is_valid(self):
        if self._forced_invalid:
            return False
        return _repair.polygons_valid(self.polys)

    def normalize(self):
        return MultiPolygon(
            [(rings[0], rings[1:]) for rings in _norm.normalize_multipolygon(self.polys)]
        )

    def union(self, other):
        return MultiPolygon(
            [
                (rings[0], rings[1:])
                for rings in _union.union_polygons([self.polys, other.polys])
            ]
        )

    @property
    def wkb(self) -> bytes:
        return _gwkb.encode_multipolygon(self.polys)


class _Box(Polygon):
    """tile_box: the only geometry the reference calls covers() and
    intersection() on.  Dispatches to the engine's clip kernel."""

    def __init__(self, x0, y0, x1, y1):
        self.bounds_tuple = (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))
        b = self.bounds_tuple
        super().__init__(
            [(b[0], b[1]), (b[2], b[1]), (b[2], b[3]), (b[0], b[3]), (b[0], b[1])]
        )

    def covers(self, geom) -> bool:
        if isinstance(geom, MultiPoint):
            coords = geom.points
        elif isinstance(geom, MultiLineString):
            coords = [p for ln in geom.lines for p in ln]
        else:
            coords = [p for rings in geom.polys for r in rings for p in r]
        return _clip.covers_points(coords, self.bounds_tuple)

    def intersection(self, geom, grid_size=None):
        b = self.bounds_tuple
        if isinstance(geom, MultiPoint):
            return MultiPoint(_clip.clip_points(geom.points, b))
        if isinstance(geom, MultiLineString):
            return MultiLineString(_clip.clip_lines(geom.lines, b))
        return MultiPolygon(
            [(rings[0], rings[1:]) for rings in _clip.clip_polygons(geom.polys, b)]
        )


def box(minx, miny, maxx, maxy) -> _Box:
    return _Box(minx, miny, maxx, maxy)
