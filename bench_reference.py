#!/usr/bin/env python3
"""Head-to-head single-node throughput: this engine vs the ACTUAL
reference (/root/reference/src/map2db.py, run unmodified through the
kernel-backed shapely shim) on the same generated MapsForge fixtures.

Prints one JSON line per size:
  {"features": N, "tiles": T, "ref_sec": best-of-k, "engine_sec":
   best-of-k, "speedup": ref/engine}

Methodology (BASELINE.md "self-set parity target"): both sides write
the full SQLite geodatabase from the same .map bytes; best-of-k wall
time per size; the engine session is warmed once on the smallest map
so JVM/codegen startup is not billed to a size.  Usage:

    python3 bench_reference.py [repeats]
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import json
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

REFERENCE = "/root/reference/src/map2db.py"
SHIM = str(Path(_REPO) / "tests" / "support" / "shapely_shim")

# (feats_per_tile, bbox): three densities on the 256-tile z10 grid,
# then the default density on a ~1024-tile grid (the 10^3 regime)
SIZES = [
    (30, (0.1, 0.1, 5.5, 5.5)),
    (90, (0.1, 0.1, 5.5, 5.5)),
    (240, (0.1, 0.1, 5.5, 5.5)),
    (30, (0.1, 0.1, 11.0, 11.0)),
]


def _load_reference():
    if SHIM not in sys.path:
        sys.path.insert(0, SHIM)
    spec = importlib.util.spec_from_file_location("m2db_reference", REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from map2db_spark.session import get_spark
    from map2db_spark.pipeline import map2db
    from map2db_spark.sources.sample_maps import large_map

    ref = _load_reference()
    spark = get_spark("bench-reference")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as tmp:
        maps = {}
        for idx, (fpt, bbox) in enumerate(SIZES):
            src = f"{tmp}/size{idx}.map"
            large_map(fpt, bbox=bbox).write(src)
            maps[idx] = (src, fpt)
        map2db(spark, maps[0][0], f"{tmp}/warm.db", sink="sqlite")  # session warm-up
        for idx, (fpt, bbox) in enumerate(SIZES):
            src, _ = maps[idx]
            ref_best = min(
                _timed(lambda i=i: _run_ref(ref, src, f"{tmp}/ref{idx}_{i}.db"))
                for i in range(repeats)
            )
            eng_best = min(
                _timed(lambda i=i: map2db(spark, src, f"{tmp}/eng{idx}_{i}.db", sink="sqlite"))
                for i in range(repeats)
            )
            import sqlite3

            con = sqlite3.connect(f"{tmp}/eng{idx}_0.db")
            feats = sum(
                con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
                for t in ["points", "lines", "areas"]
            )
            con.close()
            ntiles = round(
                ((bbox[3] - bbox[1]) / 0.3515625 + 1)
                * ((bbox[2] - bbox[0]) / 0.3515625 + 1)
            )
            print(
                json.dumps(
                    {
                        "feats_per_tile": fpt,
                        "tiles_approx": ntiles,
                        "input_features": ntiles * fpt,
                        "features": feats,
                        "ref_sec": round(ref_best, 2),
                        "engine_sec": round(eng_best, 2),
                        "speedup": round(ref_best / eng_best, 2),
                    }
                ),
                flush=True,
            )
    spark.stop()


def _run_ref(ref, src: str, dst: str) -> None:
    with contextlib.redirect_stdout(io.StringIO()):
        ref.map2db(src, dst)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
