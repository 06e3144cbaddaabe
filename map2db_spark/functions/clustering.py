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
    if not centroids:
        # mirror the oracle's empty centroid CTE (see _assign_arrow)
        return base.sparkSession.createDataFrame(
            [], "vid long, iv array<long>, cid int, dist long"
        )
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


def _assign_arrow(base: DataFrame, centroids: dict[int, list[int]]) -> DataFrame:
    """Arrow-batched assignment kernel: the same exact int64 argmin as
    _assign, but vectorized in numpy instead of interpreted HOF
    expressions (higher-order functions are CodegenFallback, ~10-40x
    slower per element).  Ties break to the lowest cid because argmin
    returns the first minimum and the centroid matrix rows are sorted
    by cid.  All arithmetic stays in int64, so results are
    bit-identical to the HOF path (asserted in tests)."""
    import numpy as np
    import pandas as pd

    if not centroids:
        # no seed vectors (empty corpus, or ids all beyond the seed
        # range): the oracle's CROSS JOIN against the empty centroid
        # CTE yields zero rows — mirror that instead of letting the
        # kernel's argmin raise on a zero-column distance matrix
        # (degenerate-input audit, VERDICT r14 #3)
        return base.sparkSession.createDataFrame(
            [], "vid long, iv array<long>, cid int, dist long"
        )

    cids = sorted(centroids)
    cmat = np.array([centroids[c] for c in cids], dtype=np.int64)
    cidv = np.array(cids, dtype=np.int64)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf["iv"].tolist(), dtype=np.int64)
            dists = np.empty((len(x), len(cidv)), dtype=np.int64)
            for j in range(len(cidv)):
                diff = x - cmat[j]
                dists[:, j] = np.einsum("ij,ij->i", diff, diff)
            best = dists.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vid": pdf["vid"].values,
                    "iv": pdf["iv"],
                    "cid": cidv[best].astype("int32"),
                    "dist": dists[np.arange(len(x)), best],
                }
            )

    return base.mapInPandas(
        kernel, "vid long, iv array<long>, cid int, dist long"
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


def _update_arrow(assigned: DataFrame, dim: int) -> dict[int, list[int]]:
    """Arrow-path centroid update: each partition emits one exact int64
    partial (sum-vector, count) per cluster — O(partitions * k) rows
    collected, no N*dim posexplode shuffle at all.  The final
    floor-division merge runs on Python ints (arbitrary precision, //
    is mathematical floor), identical to floor(sum/count) in both
    engines."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        acc: dict[int, tuple] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf["iv"].tolist(), dtype=np.int64)
            cids = pdf["cid"].values
            for cid in np.unique(cids):
                m = cids == cid
                s, n = x[m].sum(axis=0), int(m.sum())
                if cid in acc:
                    s0, n0 = acc[cid]
                    s, n = s0 + s, n0 + n
                acc[int(cid)] = (s, n)
        # explicit dtypes so the ZERO-group frame (empty corpus /
        # all-empty partitions) still Arrow-converts: pandas defaults
        # empty columns to float64, which Arrow cannot cast to
        # array<long> (degenerate-input audit, VERDICT r14 #3)
        yield pd.DataFrame(
            {
                "cid": pd.Series(list(acc), dtype="int32"),
                "s": pd.Series(
                    [s.tolist() for s, _ in acc.values()], dtype="object"
                ),
                "n": pd.Series([n for _, n in acc.values()], dtype="int64"),
            }
        )

    rows = assigned.mapInPandas(partials, "cid int, s array<long>, n long").collect()
    sums: dict[int, list[int]] = {}
    counts: dict[int, int] = {}
    for r in rows:
        if r["cid"] in sums:
            sums[r["cid"]] = [a + b for a, b in zip(sums[r["cid"]], r["s"])]
            counts[r["cid"]] += r["n"]
        else:
            sums[r["cid"]], counts[r["cid"]] = list(r["s"]), r["n"]
    return {
        cid: [v // counts[cid] for v in vec] for cid, vec in sums.items()
    }


def kmeans_int(
    vecs: DataFrame, k: int = 8, iters: int = 3, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """Fixed-iteration Lloyd's k-means with deterministic seeding (the
    k lowest-id vectors are the initial centroids) and exact integer
    arithmetic.  Returns per-cluster (cid, n, ssd, csum): size, exact
    sum of squared distances of the final assignment, and the final
    centroid component sum — a complete value fingerprint of the run.

    A cluster that goes empty keeps its previous centroid (both here
    and in the oracle), so cluster identity is stable across
    iterations.

    impl='arrow' (default) runs the assignment argmin as a vectorized
    numpy kernel over Arrow batches — the 100 TB path; impl='hof' uses
    pure column expressions (interpreted, oracle-mirrorable
    structure).  Both produce bit-identical results."""
    assign = _assign_arrow if impl == "arrow" else _assign
    update = _update_arrow if impl == "arrow" else _update
    base = vecs.select(
        F.col(id_col).alias("vid"), int_vec(F.col(vec_col)).alias("iv")
    ).localCheckpoint()
    seed_rows = base.where(F.col("vid") < k).collect()
    centroids = {int(r["vid"]): list(r["iv"]) for r in seed_rows}
    assigned = None
    for _ in range(iters):
        assigned = assign(base, centroids)
        fresh = update(assigned, dim)
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


def train_centroids(
    vecs: DataFrame, k: int = 16, iters: int = 3, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> list[list[int]]:
    """Train IVF coarse-quantizer centroids with the same exact-integer
    Lloyd's loop as kmeans_int (deterministic seeding, empty clusters
    keep their previous centroid).  Returns integer-scaled centroid
    vectors ordered by seed id — drop-in for similarity.ivf_topk in
    place of the random ivf_centroids.  At 100 TB you train on a
    sample (vecs.sample(...)); the loop's per-iteration traffic is
    O(partitions*k*dim), independent of N."""
    base = vecs.select(
        F.col(id_col).alias("vid"), int_vec(F.col(vec_col)).alias("iv")
    ).localCheckpoint()
    seed_rows = base.where(F.col("vid") < k).collect()
    centroids = {int(r["vid"]): list(r["iv"]) for r in seed_rows}
    for _ in range(iters):
        assigned = _assign_arrow(base, centroids)
        fresh = _update_arrow(assigned, dim)
        centroids = {cid: fresh.get(cid, vec) for cid, vec in centroids.items()}
    return [centroids[cid] for cid in sorted(centroids)]


def kmeans_assignments(
    vecs: DataFrame, k: int = 8, iters: int = 3, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Final-iteration assignment table ``(vid, iv, cid, dist)`` from
    the same deterministic exact-integer Lloyd's loop as kmeans_int
    (identical seeding, identical empty-cluster carry) — the input to
    cluster-local algorithms like SemDeDup-style semantic dedup, where
    the cluster id prunes the pair space before any similarity math."""
    base = vecs.select(
        F.col(id_col).alias("vid"), int_vec(F.col(vec_col)).alias("iv")
    ).persist()
    seed_rows = base.where(F.col("vid") < k).collect()
    centroids = {int(r["vid"]): list(r["iv"]) for r in seed_rows}
    assigned = None
    for _ in range(iters):
        assigned = _assign_arrow(base, centroids)
        fresh = _update_arrow(assigned, dim)
        centroids = {cid: fresh.get(cid, vec) for cid, vec in centroids.items()}
    return assigned
