"""Shared fixture maps for golden tests and the registered mapsforge
queries.  Deterministic: same bytes every build.

Geography: bbox (0.1..2.0)° lat/lon.  At zoom 8 that spans tiles
x=128..129, y=126..127 (2x2); the y=127 row covers lat 0..~1.4069 and
x=128 covers lon 0..1.40625, which is where all features live.  At
zoom 6 the whole bbox is the single tile (32, 31).
"""

from __future__ import annotations

from map2db_spark.sources.fixture import MapWriter, Poi, Way
from map2db_spark.sources.tilemath import tile_bounds_deg

LICENSE = "ODbL v1.0 test license statement"

BBOX = (0.1, 0.1, 2.0, 2.0)  # minlat, minlon, maxlat, maxlon

# main z8 tile and its neighbor across the lon=1.40625 boundary
T_MAIN = (128, 127)
T_EAST = (129, 127)
T_Z6 = (32, 31)


def dbl_map() -> MapWriter:
    """A dbl map exercising: two subfiles (z6 / z8), multi-zoom counts,
    cross-tile ways, multi-level duplicate features, all vtag types,
    name/house/ref/elevation fields, double-delta, multi data blocks,
    polygon with hole, empty tiles, water bit."""
    w = MapWriter(
        BBOX,
        [(6, 0, 7), (8, 8, 11)],
        dbl_license=LICENSE,
        comment="fixture comment",
        createdby="map2db_spark fixture encoder",
    )
    b = tile_bounds_deg(8, *T_MAIN)
    cx = round((b[0] + b[2]) / 2, 6)
    cy = round((b[1] + b[3]) / 2, 6)

    # P1: simple POI with every optional field + all vtag types
    w.add_poi(
        1, *T_MAIN,
        Poi(
            lat=cy, lon=cx, zoom=9, layer=2,
            tags=("amenity=cafe",),
            vtags={"population": 1234, "width": 2.5, "note": "hi"},
            name="Cafe One", house_num="12b", elevation=345, pnum=1,
        ),
    )
    # P2: POI appearing at both levels (multi-level duplicate)
    w.add_poi(1, *T_MAIN, Poi(lat=cy, lon=cx, zoom=8, tags=("place=town",), pnum=2))
    w.add_poi(0, *T_Z6, Poi(lat=cy, lon=cx, zoom=6, tags=("place=town",), pnum=2))
    # P3: POI in the edge buffer (outside its tile) -> clipped away
    w.add_poi(1, *T_EAST, Poi(lat=cy, lon=cx, zoom=9, pnum=3))

    # L1: line crossing the lon=1.40625 boundary between tiles 128/129
    cross = [(1.2, 0.5), (1.6, 0.5)]
    w.add_way(1, *T_MAIN, Way(blocks=[[cross]], zoom=9, lnum=1,
                              tags=("highway=primary",), name="Cross Road"))
    w.add_way(1, *T_EAST, Way(blocks=[[cross]], zoom=9, lnum=1,
                              tags=("highway=primary",), name="Cross Road"))
    # L2: double-delta encoded wiggly line fully inside the main tile
    wiggle = [(0.2, 0.2), (0.3, 0.25), (0.35, 0.4), (0.5, 0.45), (0.55, 0.6)]
    w.add_way(1, *T_MAIN, Way(blocks=[[wiggle]], zoom=10, lnum=2,
                              double_delta=True, reference="R2",
                              vtags={"lanes": 2}))
    # L3: two separate parts (multi data block) + label position
    w.add_way(
        1, *T_MAIN,
        Way(
            blocks=[[[(0.1, 0.8), (0.3, 0.8)]], [[(0.4, 0.9), (0.6, 0.9)]]],
            zoom=9, lnum=3, label_offset=(1000, 2000),
        ),
    )
    # L4: closed square ring split into two arcs + one isolated segment
    # -> linemerge stitches the ring but the residual is still
    # multi-part and contains a loop (exercises the loop counter,
    # map2db.py:1148-1160)
    arc1 = [(0.7, 0.1), (0.8, 0.1), (0.8, 0.2)]
    arc2 = [(0.8, 0.2), (0.7, 0.2), (0.7, 0.1)]
    stray = [(0.95, 0.05), (0.99, 0.05)]
    w.add_way(
        1, *T_MAIN,
        Way(blocks=[[arc1], [arc2], [stray]], zoom=9, lnum=4),
    )

    # A1: polygon with a hole, fully inside the main tile
    shell = [(0.2, 0.95), (0.8, 0.95), (0.8, 1.35), (0.2, 1.35), (0.2, 0.95)]
    hole = [(0.4, 1.05), (0.6, 1.05), (0.6, 1.25), (0.4, 1.25), (0.4, 1.05)]
    w.add_way(1, *T_MAIN, Way(blocks=[[shell, hole]], zoom=8, anum=1,
                              tags=("landuse=park",), name="Hole Park"))
    # A2: square spanning the lon boundary, encoded into both tiles
    # (zoom 8 here + zoom 7 at the z6 subfile = continuous zoom range)
    big = [(1.3, 0.2), (1.5, 0.2), (1.5, 0.4), (1.3, 0.4), (1.3, 0.2)]
    w.add_way(1, *T_MAIN, Way(blocks=[[big]], zoom=8, anum=2))
    w.add_way(1, *T_EAST, Way(blocks=[[big]], zoom=8, anum=2))
    # A2 also at level 6 (simplified duplicate)
    w.add_way(0, *T_Z6, Way(blocks=[[big]], zoom=7, anum=2))

    # P4: deliberate zoom-range discontinuity (minz 9 at level 8 but
    # the level-6 subfile tops out at 7) -> consolidation must surface
    # a violation instead of crashing (reference raises ValueError)
    w.add_poi(1, *T_MAIN, Poi(lat=0.31, lon=0.31, zoom=9, pnum=4))
    w.add_poi(0, *T_Z6, Poi(lat=0.31, lon=0.31, zoom=6, pnum=4))

    # water tile marker on an empty tile
    w.mark_water(1, 129, 126)
    return w


def large_map(
    feats_per_tile: int = 30,
    bbox: tuple[float, float, float, float] = (0.1, 0.1, 5.5, 5.5),
) -> MapWriter:
    """Throughput-bench map: a z10 grid (~256 tiles at the default
    bbox; pass a wider bbox for the 10^3-tile regime) filled with
    deterministic features — grids of POIs, multi-part lines (so the
    merge stage has work), and small polygons.  ~7.7k features at the
    defaults."""
    w = MapWriter(bbox, [(10, 9, 13)], dbl_license=LICENSE)
    from map2db_spark.sources.tilemath import x_from_lon, y_from_lat

    minx = int(x_from_lon(10, bbox[1]))
    maxx = int(x_from_lon(10, bbox[3]))
    miny = int(y_from_lat(10, bbox[2]))
    maxy = int(y_from_lat(10, bbox[0]))
    fid = 0
    n_pois = feats_per_tile - 10
    for ty in range(miny, maxy + 1):
        for tx in range(minx, maxx + 1):
            b = tile_bounds_deg(10, tx, ty)
            dx = (b[2] - b[0]) / 12
            dy = (b[3] - b[1]) / 12
            x0 = round(b[0] + dx, 6)
            y0 = round(b[1] + dy, 6)
            for i in range(n_pois):
                w.add_poi(
                    0, tx, ty,
                    Poi(
                        lat=round(y0 + (i % 5) * dy, 6),
                        lon=round(x0 + (i // 5) * dx, 6),
                        zoom=9 + (i % 5),
                        tags=(f"kind=k{i % 7}",),
                        vtags={"rank": i},
                        name=f"poi{fid + i}",
                        pnum=fid + i,
                    ),
                )
            fid += n_pois
            for i in range(5):
                y = round(y0 + i * dy, 6)
                seg1 = [(x0, y), (round(x0 + 2 * dx, 6), y)]
                seg2 = [(round(x0 + 2 * dx, 6), y), (round(x0 + 4 * dx, 6), y)]
                w.add_way(
                    0, tx, ty,
                    Way(blocks=[[seg1], [seg2]], zoom=10, lnum=fid + i,
                        tags=("highway=x",)),
                )
            fid += 5
            for i in range(5):
                cx = round(x0 + 6 * dx, 6)
                cy = round(y0 + i * dy * 1.5, 6)
                ring = [
                    (cx, cy),
                    (round(cx + dx, 6), cy),
                    (round(cx + dx, 6), round(cy + dy, 6)),
                    (cx, round(cy + dy, 6)),
                    (cx, cy),
                ]
                w.add_way(0, tx, ty, Way(blocks=[[ring]], zoom=11, anum=fid + i))
            fid += 5
    return w


def nondbl_map() -> MapWriter:
    """Non-dbl map: no feature ids; ring heuristic classifies ways."""
    w = MapWriter(BBOX, [(8, 6, 12)], dbl_license=None)
    b = tile_bounds_deg(8, *T_MAIN)
    cx = round((b[0] + b[2]) / 2, 6)
    cy = round((b[1] + b[3]) / 2, 6)
    w.add_poi(0, *T_MAIN, Poi(lat=cy, lon=cx, zoom=8, tags=("amenity=pub",)))
    # closed ring >= 4 points -> area
    ring = [(0.2, 0.2), (0.5, 0.2), (0.5, 0.5), (0.2, 0.5), (0.2, 0.2)]
    w.add_way(0, *T_MAIN, Way(blocks=[[ring]], zoom=9))
    # nearly-closed ring (1 µdeg off, float diff <= 1e-6 for these
    # literals — the closure tolerance is float-sensitive, exactly as
    # in the reference) -> snapped closed -> area
    near = [(1.0, 0.6), (1.3, 0.6), (1.3, 0.9), (1.0, 0.9), (1.000001, 0.6)]
    w.add_way(0, *T_MAIN, Way(blocks=[[near]], zoom=9))
    # open polyline -> line
    w.add_way(0, *T_MAIN, Way(blocks=[[[(1.0, 1.0), (1.1, 1.1), (1.2, 1.0)]]], zoom=9))
    return w


def invalid_map() -> MapWriter:
    """A dbl map whose area geometries exercise the F7/G4 validity
    repair (reference map2db.py:979-1011): a bowtie (self-crossing), a
    self-touching pocket, an unreparable zero-area sliver, and a valid
    control square."""
    w = MapWriter(BBOX, [(8, 8, 11)], dbl_license=LICENSE)
    cx, cy = 0.7, 0.7
    d = 0.01
    bowtie = [(cx, cy), (cx + d, cy + d), (cx + d, cy), (cx, cy + d), (cx, cy)]
    w.add_way(0, *T_MAIN, Way(blocks=[[bowtie]], zoom=8, anum=91))
    sliver = [(cx - d, cy), (cx - d / 2, cy), (cx - d / 4, cy), (cx - d, cy)]
    w.add_way(0, *T_MAIN, Way(blocks=[[sliver]], zoom=8, anum=92))
    pocket = [
        (0.2, 0.2), (0.6, 0.2), (0.4, 0.4), (0.5, 0.4), (0.4, 0.5),
        (0.4, 0.4), (0.6, 0.201), (0.6, 0.6), (0.2, 0.6), (0.2, 0.2),
    ]
    w.add_way(0, *T_MAIN, Way(blocks=[[pocket]], zoom=8, anum=93))
    square = [(1.0, 1.0), (1.1, 1.0), (1.1, 1.1), (1.0, 1.1), (1.0, 1.0)]
    w.add_way(0, *T_MAIN, Way(blocks=[[square]], zoom=8, anum=94))
    return w


def parity_dbl_map() -> MapWriter:
    """dbl fixture the UNMODIFIED reference can process for golden
    parity: like dbl_map but without the label-offset way (the
    reference's label path crashes on its dlat/dlon vs lat/lon key
    bug, map2db.py:557-627) and without the deliberate P4 zoom
    discontinuity (the reference raises mid-run where this engine
    surfaces a violation row)."""
    w = MapWriter(
        BBOX,
        [(6, 0, 7), (8, 8, 11)],
        dbl_license=LICENSE,
        comment="fixture comment",
        createdby="map2db_spark fixture encoder",
    )
    b = tile_bounds_deg(8, *T_MAIN)
    cx = round((b[0] + b[2]) / 2, 6)
    cy = round((b[1] + b[3]) / 2, 6)
    w.add_poi(
        1, *T_MAIN,
        Poi(
            lat=cy, lon=cx, zoom=9, layer=2,
            tags=("amenity=cafe",),
            vtags={"population": 1234, "width": 2.5, "note": "hi"},
            name="Cafe One", house_num="12b", elevation=345, pnum=1,
        ),
    )
    w.add_poi(1, *T_MAIN, Poi(lat=cy, lon=cx, zoom=8, tags=("place=town",), pnum=2))
    w.add_poi(0, *T_Z6, Poi(lat=cy, lon=cx, zoom=6, tags=("place=town",), pnum=2))
    w.add_poi(1, *T_EAST, Poi(lat=cy, lon=cx, zoom=9, pnum=3))

    cross = [(1.2, 0.5), (1.6, 0.5)]
    w.add_way(1, *T_MAIN, Way(blocks=[[cross]], zoom=9, lnum=1,
                              tags=("highway=primary",), name="Cross Road"))
    w.add_way(1, *T_EAST, Way(blocks=[[cross]], zoom=9, lnum=1,
                              tags=("highway=primary",), name="Cross Road"))
    wiggle = [(0.2, 0.2), (0.3, 0.25), (0.35, 0.4), (0.5, 0.45), (0.55, 0.6)]
    w.add_way(1, *T_MAIN, Way(blocks=[[wiggle]], zoom=10, lnum=2,
                              double_delta=True, reference="R2",
                              vtags={"lanes": 2}))
    arc1 = [(0.7, 0.1), (0.8, 0.1), (0.8, 0.2)]
    arc2 = [(0.8, 0.2), (0.7, 0.2), (0.7, 0.1)]
    stray = [(0.95, 0.05), (0.99, 0.05)]
    w.add_way(1, *T_MAIN, Way(blocks=[[arc1], [arc2], [stray]], zoom=9, lnum=4))

    shell = [(0.2, 0.95), (0.8, 0.95), (0.8, 1.35), (0.2, 1.35), (0.2, 0.95)]
    hole = [(0.4, 1.05), (0.6, 1.05), (0.6, 1.25), (0.4, 1.25), (0.4, 1.05)]
    w.add_way(1, *T_MAIN, Way(blocks=[[shell, hole]], zoom=8, anum=1,
                              tags=("landuse=park",), name="Hole Park"))
    big = [(1.3, 0.2), (1.5, 0.2), (1.5, 0.4), (1.3, 0.4), (1.3, 0.2)]
    w.add_way(1, *T_MAIN, Way(blocks=[[big]], zoom=8, anum=2))
    w.add_way(1, *T_EAST, Way(blocks=[[big]], zoom=8, anum=2))
    w.add_way(0, *T_Z6, Way(blocks=[[big]], zoom=7, anum=2))

    w.mark_water(1, 129, 126)
    return w


def parity_nondbl_map() -> MapWriter:
    """non-dbl fixture for golden parity.  Ways carry tags: the
    reference unconditionally reads fileheader['wtags'][-1]
    (map2db.py:1363), so an empty way-tag dictionary crashes it."""
    w = MapWriter(BBOX, [(8, 6, 12)], dbl_license=None)
    b = tile_bounds_deg(8, *T_MAIN)
    cx = round((b[0] + b[2]) / 2, 6)
    cy = round((b[1] + b[3]) / 2, 6)
    w.add_poi(0, *T_MAIN, Poi(lat=cy, lon=cx, zoom=8, tags=("amenity=pub",)))
    ring = [(0.2, 0.2), (0.5, 0.2), (0.5, 0.5), (0.2, 0.5), (0.2, 0.2)]
    w.add_way(0, *T_MAIN, Way(blocks=[[ring]], zoom=9, tags=("landuse=farm",)))
    near = [(1.0, 0.6), (1.3, 0.6), (1.3, 0.9), (1.0, 0.9), (1.000001, 0.6)]
    w.add_way(0, *T_MAIN, Way(blocks=[[near]], zoom=9, tags=("natural=water",)))
    w.add_way(0, *T_MAIN, Way(blocks=[[[(1.0, 1.0), (1.1, 1.1), (1.2, 1.0)]]],
                              zoom=9, tags=("highway=track",)))
    return w
