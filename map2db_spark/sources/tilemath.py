"""Web-Mercator tile <-> EPSG:4326 transforms (slippy-map tile math).

Matches the reference's P1 transforms (map2db.py:322-347): note the
reference uses a half-tile-shifted variant (2**(z-1) scale) of the
standard slippy formulas; we reproduce it exactly since tile grid
extents and tile origins must agree bit-for-bit.
"""

from __future__ import annotations

import math


def x_from_lon(z: int, lon: float) -> float:
    return 2 ** (z - 1) * (lon / 180.0 + 1.0)


def y_from_lat(z: int, lat: float) -> float:
    return (2 ** (z - 1)) * (
        2 - (math.log(math.tan((0.25 + lat / 360.0) * math.pi)) / math.pi + 1.0)
    )


def lon_from_x(z: int, x: float) -> float:
    return (x / (2**z) * 2.0 - 1.0) * 180.0


def lat_from_y(z: int, y: float) -> float:
    return (
        math.atan(math.exp((((1 << z) - y) / (2 ** (z - 1)) - 1.0) * math.pi)) / math.pi
        - 0.25
    ) * 360.0


def tile_origin_microdeg(z: int, x: int, y: int) -> tuple[int, int]:
    """(lat, lon) in integer microdegrees of the tile's NW corner."""
    return (
        int(round(lat_from_y(z, y) * 1_000_000)),
        int(round(lon_from_x(z, x) * 1_000_000)),
    )


def tile_bounds_deg(z: int, x: int, y: int) -> tuple[float, float, float, float]:
    """(minlon, minlat, maxlon, maxlat) of the tile, rounded to 6 dp
    (the microdegree grid), matching G1 tile-box construction
    (map2db.py:828-833)."""
    return (
        round(lon_from_x(z, x), 6),
        round(lat_from_y(z, y + 1), 6),
        round(lon_from_x(z, x + 1), 6),
        round(lat_from_y(z, y), 6),
    )
