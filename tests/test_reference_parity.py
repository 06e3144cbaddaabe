"""Golden parity vs the ACTUAL reference (SURVEY §5.2): run the
unmodified /root/reference/src/map2db.py — its shapely dependency
served by the kernel-backed shim in tests/support/shapely_shim — on
generated fixture maps, and diff its SQLite output table-by-table
against this engine's.

What this closes: round-1 testing compared the engine against its own
understanding of the format (self-built fixtures + DuckDB oracles).
Here the reference itself decodes the same map bytes and writes its
own database through its own dataflow (sequential upserts, mid-run
merges), so any divergence in decode, clip, consolidation, zoom
bookkeeping, vtag typing, id assignment, or line merging surfaces as
a table diff.

Geometry cells compare after decode->normalize (the reference writes
a bare LINESTRING when a merge fully succeeds where the engine always
writes MULTILINESTRING; values are identical).  Fixtures avoid the
reference's own crash paths (label-offset key bug map2db.py:557-627,
mid-run ValueError on zoom gaps) — those stay covered by the engine's
divergence tests, not parity.
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import sqlite3
import struct
import sys
from pathlib import Path

import pytest

from map2db_spark.geometry import normalize as gnorm
from map2db_spark.geometry import wkb as gwkb

REPO = Path(__file__).resolve().parent.parent
SHIM = REPO / "tests" / "support" / "shapely_shim"
REFERENCE = Path("/root/reference/src/map2db.py")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not present"
)


def _load_reference():
    if str(SHIM) not in sys.path:
        sys.path.insert(0, str(SHIM))
    spec = importlib.util.spec_from_file_location("m2db_reference", REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _norm_geom(buf: bytes):
    """WKB -> kernel-normalized structure; single LineString promotes
    to a one-part MultiLineString."""
    geom_type = struct.unpack_from("<I", buf, 1)[0]
    if geom_type == 2:
        n = struct.unpack_from("<I", buf, 5)[0]
        coords = [struct.unpack_from("<dd", buf, 9 + 16 * i) for i in range(n)]
        return ("multilinestring", gnorm.normalize_multilinestring([coords]))
    kind, parts = gwkb.decode(buf)
    if kind == "multipoint":
        return (kind, gnorm.normalize_multipoint(parts))
    if kind == "multilinestring":
        return (kind, gnorm.normalize_multilinestring(parts))
    return (kind, gnorm.normalize_multipolygon(parts))


def _dump(db_path: str):
    con = sqlite3.connect(db_path)
    con.row_factory = sqlite3.Row
    out = {}
    for t in [
        "points", "lines", "areas", "subfiles", "limits",
        "geometry_columns", "spatial_ref_sys",
    ]:
        rows = []
        for r in con.execute(f'SELECT * FROM "{t}"'):
            d = dict(r)
            if d.get("m2db_geometry") is not None:
                d["m2db_geometry"] = _norm_geom(d["m2db_geometry"])
            rows.append(d)
        out[t] = rows
    con.close()
    return out


@pytest.fixture(scope="module")
def outputs(spark, tmp_path_factory):
    from map2db_spark.pipeline import map2db as engine_map2db
    from map2db_spark.sources.sample_maps import parity_dbl_map, parity_nondbl_map

    tmp = tmp_path_factory.mktemp("refparity")
    ref = _load_reference()
    result = {}
    for name, builder in [("dbl", parity_dbl_map), ("nondbl", parity_nondbl_map)]:
        src = str(tmp / f"{name}.map")
        builder().write(src)
        ref_db = str(tmp / f"ref_{name}.db")
        with contextlib.redirect_stdout(io.StringIO()):
            ref.map2db(src, ref_db)
        eng_db = str(tmp / f"eng_{name}.db")
        engine_map2db(spark, src, eng_db, sink="sqlite")
        result[name] = (_dump(ref_db), _dump(eng_db))
    return result


def _sort_key(row: dict):
    return sorted(
        (k, repr(v)) for k, v in row.items()
    )


@pytest.mark.parametrize("fixture_name", ["dbl", "nondbl"])
@pytest.mark.parametrize(
    "table",
    ["points", "lines", "areas", "subfiles", "limits",
     "geometry_columns", "spatial_ref_sys"],
)
def test_table_parity(outputs, fixture_name, table):
    ref_rows, eng_rows = (o[table] for o in outputs[fixture_name])
    assert len(ref_rows) == len(eng_rows), f"{table}: row count"
    if ref_rows:
        assert set(ref_rows[0]) == set(eng_rows[0]), f"{table}: columns"
    for r, g in zip(
        sorted(ref_rows, key=_sort_key), sorted(eng_rows, key=_sort_key)
    ):
        assert r == g, f"{table}: row mismatch\nref={r}\neng={g}"
