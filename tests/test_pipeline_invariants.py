"""Whole-pipeline invariants over a seeded randomized multi-tile map:
the set-oriented restatements of the reference's runtime assumptions
(map2db.py:89-117) must hold for every feature regardless of where
fragments landed.

One generated map (seeded, ~60 features incl. cross-tile spans and
multi-level duplicates) -> one pipeline run -> invariants checked for
all features at once."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from map2db_spark.geometry import wkb as gwkb
from map2db_spark.pipeline import consolidated_features, load_features
from map2db_spark.sources.fixture import MapWriter, Poi, Way
from map2db_spark.sources.header import read_header
from map2db_spark.sources.sample_maps import BBOX
from map2db_spark.sources.tilemath import tile_bounds_deg

Z = 8
TILES = [(128, 126), (129, 126), (128, 127), (129, 127)]


def _rand_map(seed: int = 1234) -> MapWriter:
    rng = random.Random(seed)
    w = MapWriter(BBOX, [(6, 0, 7), (Z, 8, 11)], dbl_license="L")
    fid = 0
    for _ in range(30):
        tx, ty = rng.choice(TILES)
        b = tile_bounds_deg(Z, tx, ty)
        lat = round(rng.uniform(b[1] + 0.01, b[3] - 0.01), 6)
        lon = round(rng.uniform(b[0] + 0.01, b[2] - 0.01), 6)
        zoom = rng.randint(8, 11)
        w.add_poi(1, tx, ty, Poi(lat=lat, lon=lon, zoom=zoom, pnum=fid))
        if rng.random() < 0.3:
            # multi-level duplicate with a continuous zoom range
            w.add_poi(0, 32, 31, Poi(lat=lat, lon=lon, zoom=rng.randint(0, 7),
                                     pnum=fid))
            # rewrite higher-level sighting to start at the boundary
            w.placements[1][(tx, ty)]["pois"][-1].zoom = 8
        fid += 1
    for _ in range(30):
        # horizontal line possibly crossing the x boundary at 1.40625
        y = round(rng.uniform(0.1, 1.3), 6)
        x0 = round(rng.uniform(0.2, 1.2), 6)
        x1 = round(x0 + rng.uniform(0.1, 0.6), 6)
        line = [(x0, y), (x1, y)]
        row_tiles = [(tx, ty) for (tx, ty) in TILES if ty == 127]
        for tx, ty in row_tiles:
            b = tile_bounds_deg(Z, tx, ty)
            if x1 >= b[0] and x0 <= b[2]:
                w.add_way(1, tx, ty, Way(blocks=[[line]], zoom=9, lnum=fid))
        fid += 1
    return w


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("rand") / "rand.map")
    _rand_map().write(src)
    header = read_header(src)
    raw = load_features(spark, src, header).collect()
    final = consolidated_features(spark, src).collect()
    return raw, final


def test_no_violations(pipeline_out):
    _, final = pipeline_out
    assert all(r["violation"] is None for r in final)


def test_one_row_per_feature(pipeline_out):
    raw, final = pipeline_out
    raw_keys = {(r["ftype"], r["fid"]) for r in raw}
    final_keys = [(r["ftype"], r["fid"]) for r in final]
    assert len(final_keys) == len(set(final_keys))
    assert set(final_keys) == raw_keys


def test_zoom_fields(pipeline_out):
    raw, final = pipeline_out
    by_key: dict = {}
    for r in raw:
        by_key.setdefault((r["ftype"], r["fid"]), []).append(r)
    for f in final:
        sightings = by_key[(f["ftype"], f["fid"])]
        assert f["level"] == max(s["level"] for s in sightings)
        assert f["minz"] == min(s["minz"] for s in sightings)
        top = [s for s in sightings if s["level"] == f["level"]]
        assert f["maxz"] == top[0]["maxz"]


def test_geometry_bbox_covers_fragments(pipeline_out):
    """The consolidated geometry's bbox equals the union of its
    top-level fragments' bboxes (nothing lost, nothing invented)."""
    raw, final = pipeline_out

    def bbox(buf):
        kind, parts = gwkb.decode(buf)
        if kind == "multipoint":
            pts = parts
        elif kind == "multilinestring":
            pts = [p for ln in parts for p in ln]
        else:
            pts = [p for rings in parts for ring in rings for p in ring]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        return min(xs), min(ys), max(xs), max(ys)

    by_key: dict = {}
    for r in raw:
        by_key.setdefault((r["ftype"], r["fid"]), []).append(r)
    for f in final:
        sightings = by_key[(f["ftype"], f["fid"])]
        top = [s for s in sightings if s["level"] == f["level"]]
        boxes = [bbox(s["geom"]) for s in top]
        want = (
            min(b[0] for b in boxes),
            min(b[1] for b in boxes),
            max(b[2] for b in boxes),
            max(b[3] for b in boxes),
        )
        assert bbox(f["geom"]) == want
