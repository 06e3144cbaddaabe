"""Parquet table catalog over the driver-generated test data.

Tables: region nation customer supplier part orders lineitem events
documents embeddings (TESTDATA.md).  All reads go through
``spark.read.parquet`` so Catalyst gets column pruning + predicate
pushdown into the scan for free — check with
``df.explain('formatted')``: filters used by a query must appear in
``PushedFilters`` and the scan's ``ReadSchema`` must list only the
referenced columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        # The driver has generated events.ts as TIMESTAMP(NANOS) in some
        # rounds (read as long nanoseconds via
        # spark.sql.legacy.parquet.nanosAsLong) and plain TIMESTAMP(MICROS)
        # in others.  Branch on the loaded dtype so both generations work:
        # nanos truncate to microseconds with exact integer division
        # (`div`, not `/` — a double round-trip of ~1.7e18 ns loses
        # precision); NTZ micros just re-type to session-TZ timestamp so
        # every downstream window/date function sees one type.
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def cleanup_roundtrip(df: DataFrame, tmp: str) -> DataFrame:
    """Materialize a (small) read-back result, then delete the
    round-trip scratch directory — repeated correctness/bench sweeps
    must not accumulate table copies in /tmp.  The persisted result
    serves the caller from cache after the backing files are gone."""
    import shutil

    out = df.persist()
    out.count()
    shutil.rmtree(tmp, ignore_errors=True)
    return out


class Tables:
    """Lazy accessor: ``t.lineitem`` returns the DataFrame for that table."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return load(self._spark, self._sf_dir, name)
