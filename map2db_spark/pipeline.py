"""End-to-end pipeline: map file -> consolidated features -> sinks.

Spark-first restatement of the reference's ``map2db(src, dst)``
(map2db.py:1311-1532), per SURVEY §3.4:

driver:    header + tile index parse (KB-scale)            [sources/header]
executors: manifest -> mapInPandas decode + geometry prep  [operators/decode]
           groupBy(ftype, fid) consolidation (dbl)         [operators/consolidate]
           groupBy(fid) line merge (dbl)                   [operators/linemerge]
driver:    SQLite + TOML export sinks                      [sinks/]
executors: parquet canonical sink (optional)               [sinks/parquet_sink]

The plan is lazy end to end; the only driver-side data movements are
the collected vtag key set (tiny) and the Arrow batches streamed into
the SQLite file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map2db_spark.operators.consolidate import assign_ids, consolidate
from map2db_spark.operators.decode import decode_features
from map2db_spark.operators.linemerge import merge_lines
from map2db_spark.sinks.sqlite_sink import vtag_key_order, write_sqlite
from map2db_spark.sinks.toml_sink import write_config
from map2db_spark.sources.header import MapHeader, build_manifest, nonempty, read_header


def load_features(spark: SparkSession, src: str, header: MapHeader | None = None):
    """map file -> raw decoded features DataFrame (pre-consolidation)."""
    header = header or read_header(src)
    manifest = nonempty(build_manifest(spark, src, header))
    # Break spatial skew: neighboring tiles (dense cities) land in
    # different tasks.  An explicit round-robin on the tile key beats
    # relying on input order at high tile counts.
    manifest = manifest.repartition(
        max(spark.sparkContext.defaultParallelism * 2, 8),
        F.col("tile_x"),
        F.col("tile_y"),
        F.col("level"),
    )
    return decode_features(spark, src, header, manifest)


def decode_rejects(feats: DataFrame) -> DataFrame:
    """Features the decoder could not repair to valid geometry (F7/G4
    rejects path): the reference discards these with a log line
    (map2db.py:996-1011); here they stay queryable, with the reason
    under vtags['m2db:reject']."""
    return feats.where(F.col("ftype") == "reject")


def consolidated_features(
    spark: SparkSession, src: str, header: MapHeader | None = None
) -> DataFrame:
    """map file -> final feature rows (dbl: consolidated + line-merged;
    non-dbl: deterministically numbered raw rows).  Unreparable
    geometries (ftype='reject') are excluded, as the reference
    discards them; audit them via decode_rejects(load_features(...))."""
    header = header or read_header(src)
    feats = load_features(spark, src, header).where(F.col("ftype") != "reject")
    if not header.is_dbl:
        return assign_ids(feats).select(
            "ftype", "fid", "level", "minz", "maxz", "layer", "tags", "vtags", "geom",
            F.lit(None).cast("string").alias("violation"),
        )
    # materialize once before branching: the line/non-line split would
    # otherwise re-execute decode + consolidate per branch (measured
    # 2x the pipeline cost at 5.2M features)
    cons = consolidate(feats, header).localCheckpoint()
    lines = cons.where(F.col("ftype") == "line")
    merged = merge_lines(lines).drop(
        "was_multi", "still_multi_after_merge", "still_multi_after_snap", "has_loop"
    )
    return cons.where(F.col("ftype") != "line").unionByName(merged)


def map2db(spark: SparkSession, src_pathname: str, db_pathname: str) -> dict:
    """Full reference-parity run: writes the SQLite geodatabase and,
    for dbl maps, the forgemap TOML config.  Returns a summary dict."""
    header = read_header(src_pathname)
    feats = load_features(spark, src_pathname, header).where(
        F.col("ftype") != "reject"  # unreparable geometry: discarded, per reference
    )
    # cache: the feature scan feeds consolidation AND vtag-order; at
    # export scale this is the working set, materialized once
    feats.persist()
    try:
        if header.is_dbl:
            # one consolidate execution; the line/non-line branches and
            # the export all read the checkpoint
            cons = consolidate(feats, header).localCheckpoint()
            lines = cons.where(F.col("ftype") == "line")
            merged = merge_lines(lines).drop(
                "was_multi", "still_multi_after_merge",
                "still_multi_after_snap", "has_loop",
            )
            final = cons.where(F.col("ftype") != "line").unionByName(merged)
        else:
            final = assign_ids(feats).select(
                "ftype", "fid", "level", "minz", "maxz", "layer", "tags", "vtags",
                "geom", F.lit(None).cast("string").alias("violation"),
            )
        result = write_sqlite(db_pathname, src_pathname, header, final, feats)
        if header.is_dbl:
            # global vtag list for the TOML (first-sighting order over
            # all three tables)
            per_table = result["vtag_cols"]
            seen: list[str] = []
            for ftype in ["point", "line", "area"]:
                for k in per_table.get(ftype, []):
                    if k not in seen:
                        seen.append(k)
            config_path = db_pathname + ".config.toml"
            write_config(config_path, db_pathname, header.dbl_license, header, seen)
            result["config"] = config_path
        result["dbl"] = header.is_dbl
        return result
    finally:
        feats.unpersist()
