"""The CLI must work when launched from OUTSIDE the repo directory.

Executor Python workers inherit the driver process cwd on sys.path, so
running from /root/repo silently masks a missing package-shipping step
(session.ship_package): any Arrow kernel that unpickles a
map2db_spark reference on the worker side dies with
ModuleNotFoundError only when the cwd is neutral.  This test launches
the real CLI in a subprocess with cwd=/tmp — the same launch shape as
the external harness and a real cluster submit.
"""

from __future__ import annotations

import os
import sqlite3
import subprocess
import sys


def test_cli_from_neutral_cwd(tmp_path):
    src = tmp_path / "cli.map"
    dst = tmp_path / "cli.db"
    # build the fixture map in-process (cheap), run the pipeline in a
    # fresh subprocess whose cwd is NOT the repo
    from map2db_spark.sources.sample_maps import dbl_map

    dbl_map().write(str(src))
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, '/root/repo'); "
            "from map2db_spark.cli import main; "
            f"main([{str(src)!r}, {str(dst)!r}])",
        ],
        cwd=str(tmp_path),
        # full parent env (PYSPARK_PYTHON/PATH select the pandas-bearing
        # interpreter for workers) — only the cwd is what's under test
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    con = sqlite3.connect(dst)
    counts = {
        t: con.execute(f'SELECT count(*) FROM "{t}"').fetchone()[0]
        for t in ("points", "lines", "areas")
    }
    con.close()
    assert counts == {"points": 3, "lines": 4, "areas": 2}


def test_cli_parquet_sink_from_neutral_cwd(tmp_path):
    """--sink=parquet from a neutral cwd: the cluster-default sink
    writes the three partitioned datasets + manifest (VERDICT r6 #6
    CLI flag)."""
    src = tmp_path / "clip.map"
    dst = tmp_path / "clip_out"
    from map2db_spark.sources.sample_maps import dbl_map

    dbl_map().write(str(src))
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, '/root/repo'); "
            "from map2db_spark.cli import main; "
            f"main([{str(src)!r}, {str(dst)!r}, '--sink=parquet'])",
        ],
        cwd=str(tmp_path),
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "parquet dataset written" in proc.stdout
    import json as _json

    import duckdb

    counts = {
        t: duckdb.sql(
            f"SELECT count(*) FROM '{dst}/{t}/*/*.parquet'"
        ).fetchone()[0]
        for t in ("points", "lines", "areas")
    }
    assert counts == {"points": 3, "lines": 4, "areas": 2}
    with open(dst / "manifest.json", encoding="utf-8") as f:
        manifest = _json.load(f)
    assert manifest["tables"] == ["points", "lines", "areas"]
    assert (tmp_path / "clip_out.config.toml").exists()
