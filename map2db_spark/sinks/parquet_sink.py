"""Canonical parquet sink: the scale-path output (SURVEY §7 hard part 6
— SQLite is an export format; at 100 TB the consolidated feature
tables live as partitioned parquet).

Layout: one dataset per feature table, partitioned by level (query
pattern: "features visible at zoom z" prunes whole level partitions).
Geometry stays a WKB binary column — GeoParquet-compatible column
layout (geometry column + metadata is a follow-up; readers that only
need attributes never touch the blob thanks to parquet column
pruning).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_parquet(consolidated: DataFrame, out_dir: str) -> dict[str, str]:
    paths = {}
    for ftype, table in [("point", "points"), ("line", "lines"), ("area", "areas")]:
        path = os.path.join(out_dir, table)
        (
            consolidated.where(consolidated.ftype == ftype)
            .drop("ftype")
            .repartition("level")
            .write.mode("overwrite")
            .partitionBy("level")
            .parquet(path)
        )
        paths[table] = path
    return paths
