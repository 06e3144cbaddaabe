"""Source-layer depth: distributed vs driver manifest equivalence,
remaining vtag value types (:colour hex, %h), optional header fields,
corrupted-input error paths."""

from __future__ import annotations

import pytest

from map2db_spark.operators.decode import parse_tile_payload, tile_feature_rows
from map2db_spark.sources.fixture import Half, MapWriter, Poi, Way
from map2db_spark.sources.header import build_manifest, read_header
from map2db_spark.sources.sample_maps import BBOX, T_MAIN, dbl_map
from map2db_spark.sources.tilemath import tile_bounds_deg


@pytest.fixture(scope="module")
def dbl_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("maps") / "dbl.map"
    dbl_map().write(str(p))
    return str(p)


def test_distributed_manifest_equals_driver_manifest(spark, dbl_path):
    """The chunked executor-side index scan (the 100 TB path) must
    produce exactly the driver-side manifest, including chunk-boundary
    tiles (chunk_entries=2 forces boundaries inside each subfile)."""
    header = read_header(dbl_path)
    drv = build_manifest(spark, dbl_path, header, distributed=False)
    dist = build_manifest(
        spark, dbl_path, header, distributed=True, chunk_entries=2
    )
    key = ["subfile_idx", "tile_x", "tile_y"]
    a = sorted(tuple(r) for r in drv.collect())
    b = sorted(tuple(r) for r in dist.collect())
    assert a == b and len(a) > 0


def _decode_one_tile(path, dbl=True):
    h = read_header(path)
    sf = h.subfiles[0]
    from map2db_spark.sources.header import _manifest_chunk_rows

    man = _manifest_chunk_rows(path, 0, sf, h.debuginfo, 0, sf.tile_count)
    row = man[(man.tile_x == T_MAIN[0]) & (man.tile_y == T_MAIN[1])].iloc[0]
    with open(path, "rb") as f:
        f.seek(row.offset)
        buf = f.read(row.end_offset - row.offset)
    return h, buf, sf


def test_colour_and_halfwidth_vtags(tmp_path):
    """%i tags whose key contains ':colour' render as hex; %h values
    decode via s16 (reference map2db.py:437-445)."""
    w = MapWriter(BBOX, [(8, 8, 11)], dbl_license="L")
    b = tile_bounds_deg(8, *T_MAIN)
    cx, cy = round((b[0] + b[2]) / 2, 6), round((b[1] + b[3]) / 2, 6)
    w.add_poi(
        0, *T_MAIN,
        Poi(lat=cy, lon=cx, zoom=8, pnum=1,
            vtags={"roof:colour": 0xFF8800, "narrow": Half(-12)}),
    )
    path = str(tmp_path / "c.map")
    w.write(path)
    h, buf, sf = _decode_one_tile(path)
    points, _ = parse_tile_payload(
        buf, sf.level, sf.minzoom, sf.maxzoom, *T_MAIN, h.ptags, h.wtags, h.debuginfo
    )
    v = points[0]["vtags"]
    assert v["roof:colour"] == "ff8800"
    assert v["narrow"] == "-12"


def test_header_optional_fields(tmp_path):
    w = MapWriter(
        BBOX, [(8, 8, 11)], dbl_license="L",
        start=(1.0, 1.5, 12), lang="en,de", comment="c", createdby="x",
    )
    b = tile_bounds_deg(8, *T_MAIN)
    w.add_poi(0, *T_MAIN, Poi(lat=round((b[1] + b[3]) / 2, 6),
                              lon=round((b[0] + b[2]) / 2, 6), zoom=8, pnum=1))
    path = str(tmp_path / "opt.map")
    w.write(path)
    h = read_header(path)
    assert h.startlat == 1.0 and h.startlon == 1.5 and h.startzoom == 12
    assert h.lang == "en,de"
    assert h.comment == "c" and h.createdby == "x"


def test_truncated_tile_raises(tmp_path):
    w = MapWriter(BBOX, [(8, 8, 11)], dbl_license="L")
    b = tile_bounds_deg(8, *T_MAIN)
    w.add_poi(0, *T_MAIN, Poi(lat=round((b[1] + b[3]) / 2, 6),
                              lon=round((b[0] + b[2]) / 2, 6), zoom=8,
                              name="x" * 20, pnum=1))
    path = str(tmp_path / "t.map")
    w.write(path)
    h, buf, sf = _decode_one_tile(path)
    with pytest.raises(ValueError):
        parse_tile_payload(
            buf[: len(buf) - 10], sf.level, sf.minzoom, sf.maxzoom, *T_MAIN,
            h.ptags, h.wtags, h.debuginfo,
        )


def test_way_length_guard(tmp_path):
    """A way whose declared byte length overruns the tile raises (F9)."""
    w = MapWriter(BBOX, [(8, 8, 11)], dbl_license="L")
    w.add_way(0, *T_MAIN, Way(blocks=[[[(0.2, 0.2), (0.4, 0.4)]]], zoom=8, lnum=1))
    path = str(tmp_path / "wl.map")
    w.write(path)
    h, buf, sf = _decode_one_tile(path)
    # truncating mid-way leaves the length prefix pointing past the end
    with pytest.raises(ValueError):
        tile_feature_rows(
            buf[:-3], sf.level, sf.minzoom, sf.maxzoom, *T_MAIN,
            h.ptags, h.wtags, h.debuginfo, True,
        )


def test_trim_nonum_false_keeps_buffer(tmp_path, monkeypatch):
    """With TRIM_NONUM disabled, non-dbl features keep their edge-buffer
    coordinates (reference map2db.py:124-126, 845, 907)."""
    import map2db_spark.operators.decode as dec
    from map2db_spark.sources.sample_maps import BBOX

    w = MapWriter(BBOX, [(8, 8, 11)])
    # line sticking out of the tile into the buffer
    w.add_way(0, *T_MAIN, Way(blocks=[[[(1.2, 0.5), (1.6, 0.5)]]], zoom=9))
    path = str(tmp_path / "trim.map")
    w.write(path)
    h, buf, sf = _decode_one_tile(path)

    rows = dec.tile_feature_rows(
        buf, sf.level, sf.minzoom, sf.maxzoom, *T_MAIN,
        h.ptags, h.wtags, h.debuginfo, dbl=False,
    )
    from map2db_spark.geometry import wkb as gwkb

    _, clipped = gwkb.decode(rows[0][8])
    assert max(p[0] for p in clipped[0]) == 1.40625  # trimmed by default

    monkeypatch.setattr(dec, "TRIM_NONUM", False)
    rows = dec.tile_feature_rows(
        buf, sf.level, sf.minzoom, sf.maxzoom, *T_MAIN,
        h.ptags, h.wtags, h.debuginfo, dbl=False,
    )
    _, kept = gwkb.decode(rows[0][8])
    assert max(p[0] for p in kept[0]) == 1.6  # buffer coordinates kept
