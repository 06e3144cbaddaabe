"""Property-based encode->decode round trip (SURVEY §5 item 4):
random feature sets written by the fixture encoder must decode to
exactly the same features (modulo clipping, which these generators
avoid by construction)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from map2db_spark.operators.decode import parse_tile_payload
from map2db_spark.sources.fixture import MapWriter, Poi, Way
from map2db_spark.sources.header import read_header
from map2db_spark.sources.sample_maps import BBOX, T_MAIN
from map2db_spark.sources.tilemath import tile_bounds_deg

B = tile_bounds_deg(8, *T_MAIN)


def _snap(lo: float, hi: float, frac: float) -> float:
    return round(lo + (hi - lo) * frac, 6)


coord = st.tuples(
    st.floats(min_value=0.05, max_value=0.95),
    st.floats(min_value=0.05, max_value=0.95),
).map(lambda t: (_snap(B[0], B[2], t[0]), _snap(B[1], B[3], t[1])))

poi_strategy = st.builds(
    Poi,
    lat=st.floats(min_value=0.05, max_value=0.95).map(
        lambda f: _snap(B[1], B[3], f)
    ),
    lon=st.floats(min_value=0.05, max_value=0.95).map(
        lambda f: _snap(B[0], B[2], f)
    ),
    zoom=st.integers(min_value=8, max_value=11),
    layer=st.integers(min_value=-5, max_value=10),
    tags=st.lists(
        st.sampled_from(["a=1", "b=2", "c=3"]), max_size=3, unique=True
    ).map(tuple),
    vtags=st.dictionaries(
        st.sampled_from(["k1", "k2"]),
        st.one_of(
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            st.text(min_size=0, max_size=8),
        ),
        max_size=2,
    ),
    name=st.one_of(st.none(), st.text(min_size=1, max_size=10)),
    elevation=st.one_of(st.none(), st.integers(min_value=0, max_value=9000)),
    pnum=st.integers(min_value=0, max_value=2**30),
)


def _decode_main_tile(writer: MapWriter, tmpdir) -> list:
    path = str(tmpdir / "prop.map")
    writer.write(path)
    h = read_header(path)
    sf = h.subfiles[0]
    from map2db_spark.sources.header import _manifest_chunk_rows

    man = _manifest_chunk_rows(path, 0, sf, h.debuginfo, 0, sf.tile_count)
    row = man[(man.tile_x == T_MAIN[0]) & (man.tile_y == T_MAIN[1])].iloc[0]
    with open(path, "rb") as f:
        f.seek(row.offset)
        buf = f.read(row.end_offset - row.offset)
    points, ways = parse_tile_payload(
        buf, sf.level, sf.minzoom, sf.maxzoom, *T_MAIN, h.ptags, h.wtags, h.debuginfo
    )
    return points, ways


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pois=st.lists(poi_strategy, min_size=1, max_size=8))
def test_poi_roundtrip(pois, tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("prop")
    w = MapWriter(BBOX, [(8, 8, 11)], dbl_license="L")
    seen = set()
    unique = []
    for p in pois:
        if p.pnum not in seen:
            seen.add(p.pnum)
            unique.append(p)
    for p in unique:
        w.add_poi(0, *T_MAIN, p)
    points, _ = _decode_main_tile(w, tmpdir)
    assert len(points) == len(unique)
    got = {p["fid"]: p for p in points}
    for p in unique:
        g = got[p.pnum]
        assert g["lat"] == p.lat and g["lon"] == p.lon
        assert g["layer"] == p.layer
        assert g["minz"] == p.zoom
        assert sorted(g["tags"]) == sorted(p.tags)
        for k, v in p.vtags.items():
            assert g["vtags"][k] == str(v)
        if p.name is not None:
            assert g["vtags"]["m2db_name"] == p.name
        if p.elevation is not None:
            assert g["vtags"]["m2db_elevation"] == str(p.elevation)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lines=st.lists(
        st.lists(coord, min_size=2, max_size=6, unique=True), min_size=1, max_size=5
    ),
    double_delta=st.booleans(),
)
def test_way_coordinate_roundtrip(lines, double_delta, tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("prop")
    w = MapWriter(BBOX, [(8, 8, 11)], dbl_license="L")
    for i, line in enumerate(lines):
        w.add_way(0, *T_MAIN,
                  Way(blocks=[[line]], zoom=9, lnum=i, double_delta=double_delta))
    _, ways = _decode_main_tile(w, tmpdir)
    assert len(ways) == len(lines)
    got = {way["fid"]: way for way in ways}
    for i, line in enumerate(lines):
        decoded = got[i]["blocks"][0][0]
        assert decoded == [(lon, lat) for lon, lat in line]
