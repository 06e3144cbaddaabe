"""SQL registration of the engine's kernel functions: a SQL user gets
the same vectorized kernels (`SELECT m2db_haversine_km(...)`) that the
DataFrame API uses — the engine's UDF surface (SURVEY §2.5: the
reference IS one big UDF; ours are reusable, registered, Arrow-batched).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_engine_udfs(spark: SparkSession) -> list[str]:
    """Register the engine's reusable kernels for SQL use.  Returns the
    registered names.  Idempotent."""
    from map2db_spark.functions.spatial import wkb_bbox
    from map2db_spark.queries_sql import haversine_km

    spark.udf.register("m2db_haversine_km", haversine_km)
    spark.udf.register("m2db_wkb_bbox", wkb_bbox)
    return ["m2db_haversine_km", "m2db_wkb_bbox"]
