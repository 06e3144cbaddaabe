"""K-means clustering (Lloyd's algorithm) over embedding columns as
pure DataFrame operations — the iterative-algorithm showcase alongside
operators/components.py.

Exactness strategy (same as similarity.py): all arithmetic runs over
integer-scaled components (round(x * 1e6) as bigint), so distances are
exact integer sums and the centroid update floor(sum / count) is
bit-identical in any engine (the double division cannot cross an
integer boundary: the true rational is at least 1/count from the
boundary, ~7 orders of magnitude above double rounding error at these
magnitudes).  A fixed-iteration DuckDB oracle can therefore check
VALUES, not just convergence behavior.

Scale shape: each iteration is one map (assignment against k
broadcast-literal centroids, row-local) + one groupBy(cid, dim) with
map-side combine — shuffle volume O(k * dim * partitions), never
O(N).  Centroids round-trip through the driver between iterations,
which is legitimate (k*dim values, not O(N)).  For large k*dim the
assignment argmin belongs in a pandas UDF; at k=8/dim=64 the HOF
expressions stay simple and oracle-mirrorable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map2db_spark.functions.similarity import int_vec


def _dist_expr(iv_col, centroid: list[int]):
    """Exact integer squared L2 distance to a literal centroid."""
    c = F.array(*[F.lit(int(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(iv_col, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )


def _assign(base: DataFrame, centroids: dict[int, list[int]]) -> DataFrame:
    """(id, iv) -> (id, iv, cid, dist): argmin over centroids, ties to
    the lowest cid (struct comparison is lexicographic on (dist, cid),
    mirroring the oracle's ORDER BY dist, cid)."""
    pairs = F.array(
        *[
            F.struct(
                _dist_expr(F.col("iv"), vec).alias("d"),
                F.lit(cid).alias("cid"),
            )
            for cid, vec in sorted(centroids.items())
        ]
    )
    best = F.array_min(pairs)
    return base.select(
        "*", best["cid"].alias("cid"), best["d"].alias("dist")
    )


def _update(assigned: DataFrame, dim: int) -> dict[int, list[int]]:
    """New centroids: element-wise floor(sum / count) per cluster.
    groupBy(cid, pos) keeps the shuffle O(k * dim), with map-side
    partial sums doing the real work."""
    rows = (
        assigned.select("cid", F.posexplode("iv").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(F.floor(F.sum("v") / F.count(F.lit(1))).alias("m"))
        .collect()
    )
    out: dict[int, list[int]] = {}
    for r in rows:
        out.setdefault(r["cid"], [0] * dim)[r["pos"]] = r["m"]
    return out


def kmeans_int(
    vecs: DataFrame, k: int = 8, iters: int = 3, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-iteration Lloyd's k-means with deterministic seeding (the
    k lowest-id vectors are the initial centroids) and exact integer
    arithmetic.  Returns per-cluster (cid, n, ssd, csum): size, exact
    sum of squared distances of the final assignment, and the final
    centroid component sum — a complete value fingerprint of the run.

    A cluster that goes empty keeps its previous centroid (both here
    and in the oracle), so cluster identity is stable across
    iterations."""
    base = vecs.select(
        F.col(id_col).alias("vid"), int_vec(F.col(vec_col)).alias("iv")
    ).localCheckpoint()
    seed_rows = base.where(F.col("vid") < k).collect()
    centroids = {int(r["vid"]): list(r["iv"]) for r in seed_rows}
    assigned = None
    for _ in range(iters):
        assigned = _assign(base, centroids)
        fresh = _update(assigned, dim)
        centroids = {cid: fresh.get(cid, vec) for cid, vec in centroids.items()}
    csums = {cid: sum(vec) for cid, vec in centroids.items()}
    spark = vecs.sparkSession
    csum_df = spark.createDataFrame(
        [(cid, int(s)) for cid, s in sorted(csums.items())], "cid int, csum bigint"
    )
    stats = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dist").alias("ssd"),
    )
    return stats.join(F.broadcast(csum_df), "cid", "left").select(
        "cid", "n", "ssd", "csum"
    )
