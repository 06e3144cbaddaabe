"""Golden tests: fixture encoder -> header parse -> tile decode, pure
Python (no Spark session needed) — SURVEY §5 items 2/4."""

from __future__ import annotations

import pytest

from map2db_spark.geometry import wkb as gwkb
from map2db_spark.operators.decode import tile_feature_rows
from map2db_spark.sources.fixture import MapWriter, Poi, Way
from map2db_spark.sources.header import parse_header, read_header
from map2db_spark.sources.tilemath import tile_bounds_deg
from map2db_spark.sources.sample_maps import BBOX, LICENSE, T_EAST, T_MAIN, T_Z6, dbl_map, nondbl_map


@pytest.fixture(scope="module")
def dbl_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("maps") / "dbl.map"
    dbl_map().write(str(p))
    return str(p)


@pytest.fixture(scope="module")
def header(dbl_path):
    return read_header(dbl_path)


def test_header_fields(header):
    assert header.is_dbl and header.dbl_license == LICENSE
    assert header.minlat == 0.1 and header.maxlon == 2.0
    assert header.comment == "fixture comment"
    assert len(header.subfiles) == 2
    assert header.levels == [6, 8]
    sf8 = header.subfiles[1]
    assert (sf8.minzoom, sf8.maxzoom) == (8, 11)
    assert sf8.minx == 128 and sf8.maxx == 129
    assert sf8.miny == 126 and sf8.maxy == 127
    assert sf8.tile_count == 4


def test_magic_rejected():
    with pytest.raises(ValueError, match="Wrong header bytes"):
        parse_header(b"not a mapsforge file....." + b"\x00" * 64)


def _decode_tile(path, header, sf_idx, x, y, dbl=True):
    sf = header.subfiles[sf_idx]
    from map2db_spark.sources.header import _manifest_chunk_rows

    man = _manifest_chunk_rows(path, sf_idx, sf, header.debuginfo, 0, sf.tile_count)
    row = man[(man.tile_x == x) & (man.tile_y == y)].iloc[0]
    if row.offset == row.end_offset:
        return []
    with open(path, "rb") as f:
        f.seek(row.offset)
        buf = f.read(row.end_offset - row.offset)
    return tile_feature_rows(
        buf, sf.level, sf.minzoom, sf.maxzoom, x, y,
        header.ptags, header.wtags, header.debuginfo, dbl,
    )


def test_tile_128_126_contents(dbl_path, header):
    rows = _decode_tile(dbl_path, header, 1, *T_MAIN)
    by_key = {(r[0], r[1]): r for r in rows}

    # P1: every optional field + all vtag value types
    p1 = by_key[("point", 1)]
    assert p1[3] == 9 and p1[4] == 11  # minz within subfile, maxz
    assert p1[5] == 2  # layer
    assert p1[6] == ["amenity=cafe"]
    v = p1[7]
    assert v["population"] == "1234"
    assert v["width"] == "2.5"
    assert v["note"] == "hi"
    assert v["m2db_name"] == "Cafe One"
    assert v["m2db_house_num"] == "12b"
    assert v["m2db_elevation"] == "345"
    kind, pts = gwkb.decode(p1[8])
    assert kind == "multipoint" and len(pts) == 1

    # L1 cross-boundary line is clipped to the tile box
    l1 = by_key[("line", 1)]
    kind, lines = gwkb.decode(l1[8])
    assert kind == "multilinestring"
    box = tile_bounds_deg(8, *T_MAIN)
    for ln in lines:
        for lon, lat in ln:
            assert box[0] <= lon <= box[2] and box[1] <= lat <= box[3]
    # clipped at the tile edge, so it ends exactly on maxx
    assert any(abs(pt[0] - box[2]) < 1e-9 for ln in lines for pt in ln)

    # L2 double-delta round-trips exactly
    l2 = by_key[("line", 2)]
    _, lines = gwkb.decode(l2[8])
    assert [(0.2, 0.2), (0.3, 0.25), (0.35, 0.4), (0.5, 0.45), (0.55, 0.6)] in [
        ln for ln in lines
    ] or [(0.55, 0.6), (0.5, 0.45), (0.35, 0.4), (0.3, 0.25), (0.2, 0.2)] in [
        ln for ln in lines
    ]
    assert l2[7]["lanes"] == "2"
    assert l2[7]["m2db_reference"] == "R2"

    # L3: two parts + label position = first node + delta
    l3 = by_key[("line", 3)]
    _, lines = gwkb.decode(l3[8])
    assert len(lines) == 2
    assert l3[7]["m2db_label_lat"] == str(round(0.8 + 0.001, 6))
    assert l3[7]["m2db_label_lon"] == str(round(0.1 + 0.002, 6))

    # A1 polygon with hole survives intact (fully inside)
    a1 = by_key[("area", 1)]
    kind, polys = gwkb.decode(a1[8])
    assert kind == "multipolygon"
    assert len(polys) == 1 and len(polys[0]) == 2  # shell + hole

    # A2 fragment clipped at the boundary
    a2 = by_key[("area", 2)]
    _, polys = gwkb.decode(a2[8])
    for rings in polys:
        for ring in rings:
            for lon, lat in ring:
                assert lon <= box[2] + 1e-9


def test_edge_buffer_point_dropped(dbl_path, header):
    # P3 was placed in tile 129's payload but lies inside tile 128
    rows = _decode_tile(dbl_path, header, 1, *T_EAST)
    assert ("point", 3) not in {(r[0], r[1]) for r in rows}


def test_multilevel_duplicate_present_at_both_levels(dbl_path, header):
    z8 = _decode_tile(dbl_path, header, 1, *T_MAIN)
    z6 = _decode_tile(dbl_path, header, 0, *T_Z6)
    assert ("point", 2) in {(r[0], r[1]) for r in z8}
    assert ("point", 2) in {(r[0], r[1]) for r in z6}
    assert ("area", 2) in {(r[0], r[1]) for r in z6}


def test_empty_and_water_tiles(dbl_path, header):
    sf = header.subfiles[1]
    from map2db_spark.sources.header import _manifest_chunk_rows

    man = _manifest_chunk_rows(dbl_path, 1, sf, header.debuginfo, 0, sf.tile_count)
    # water-marked empty tile decodes as empty range (water bit masked)
    r = man[(man.tile_x == 129) & (man.tile_y == 126)].iloc[0]
    assert r.offset == r.end_offset


def test_debuginfo_markers_roundtrip(tmp_path):
    w = MapWriter(BBOX, [(8, 8, 11)], dbl_license=LICENSE, debuginfo=True)
    b = tile_bounds_deg(8, *T_MAIN)
    w.add_poi(0, *T_MAIN, Poi(lat=round((b[1] + b[3]) / 2, 6),
                               lon=round((b[0] + b[2]) / 2, 6), zoom=8, pnum=7))
    w.add_way(0, *T_MAIN, Way(blocks=[[[(0.2, 0.2), (0.4, 0.4)]]], zoom=8, lnum=7))
    path = str(tmp_path / "dbg.map")
    w.write(path)
    h = read_header(path)
    assert h.debuginfo
    rows = _decode_tile(path, h, 0, *T_MAIN)
    assert {(r[0], r[1]) for r in rows} == {("point", 7), ("line", 7)}


def test_invalid_polygon_repaired_or_rejected(tmp_path):
    """F7/G4 parity: a bowtie area decodes to the make_valid result
    (two lobes, crossing point as a vertex) exactly as the reference's
    GEOS path keeps it; an unreparable zero-area ring lands on the
    rejects path instead of silently vanishing (map2db.py:979-1011)."""
    w = MapWriter(BBOX, [(8, 8, 11)], dbl_license=LICENSE)
    b = tile_bounds_deg(8, *T_MAIN)
    cx, cy = round((b[0] + b[2]) / 2, 4), round((b[1] + b[3]) / 2, 4)
    d = 0.01
    bowtie = [
        (cx, cy), (cx + d, cy + d), (cx + d, cy), (cx, cy + d), (cx, cy),
    ]
    sliver = [(cx - d, cy), (cx - d / 2, cy), (cx - d / 4, cy), (cx - d, cy)]
    w.add_way(0, *T_MAIN, Way(blocks=[[bowtie]], zoom=8, anum=91))
    w.add_way(0, *T_MAIN, Way(blocks=[[sliver]], zoom=8, anum=92))
    path = str(tmp_path / "invalid.map")
    w.write(path)
    h = read_header(path)
    rows = _decode_tile(path, h, 0, *T_MAIN)
    by_id = {(r[0], r[1]): r for r in rows}
    assert ("area", 91) in by_id and ("reject", 92) in by_id
    # bowtie became two one-ring polygons sharing the crossing vertex
    _, polys = gwkb.decode(by_id[("area", 91)][8])
    assert len(polys) == 2 and all(len(p) == 1 for p in polys)
    shared = set(map(tuple, polys[0][0])) & set(map(tuple, polys[1][0]))
    assert len(shared) == 1
    # reject row carries the reason, no geometry
    assert by_id[("reject", 92)][7] == {"m2db:reject": "no-area-after-repair"}


def test_nondbl_ring_heuristic(tmp_path):
    path = str(tmp_path / "nondbl.map")
    nondbl_map().write(path)
    h = read_header(path)
    assert not h.is_dbl
    rows = _decode_tile(path, h, 0, *T_MAIN, dbl=False)
    kinds = sorted(r[0] for r in rows)
    assert kinds == ["area", "area", "line", "point"]
    for r in rows:
        assert r[1] is None  # no ids in non-dbl maps


def test_wkb_nparts_expr_matches_pandas_udf(spark):
    """The r15 codegen part-count probe (wkb_nparts_expr) must be
    bit-identical to the pandas_udf reference it replaced in
    merge_lines — same u32-LE header read, same single/multi/null
    handling — so the single/multi split (and therefore which rows
    enter the merge kernel) is unchanged."""
    import pyspark.sql.functions as F

    from map2db_spark.geometry import wkb as gwkb
    from map2db_spark.operators.linemerge import wkb_nparts, wkb_nparts_expr

    geoms = [
        gwkb.encode_multilinestring([[(0.0, 0.0), (1.0, 1.0)]]),
        gwkb.encode_multilinestring(
            [[(0.0, 0.0), (1.0, 1.0)], [(2.0, 2.0), (3.0, 3.0)],
             [(4.0, 4.0), (5.0, 5.0)]]
        ),
        gwkb.encode_multipoint([(0.0, 0.0), (1.0, 1.0)]),
        gwkb.encode_multipolygon(
            [[[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]]]
        ),
        None,
    ]
    df = spark.createDataFrame(
        [(i, g) for i, g in enumerate(geoms)], "i INT, geom BINARY"
    )
    got = (
        df.select(
            "i",
            wkb_nparts_expr(F.col("geom")).alias("e"),
            wkb_nparts(F.col("geom")).alias("u"),
        )
        .orderBy("i")
        .collect()
    )
    assert [r["e"] for r in got] == [r["u"] for r in got]
    assert [r["e"] for r in got] == [1, 3, 2, 1, 0]
