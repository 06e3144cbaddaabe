"""Connected components over an undirected edge list — the clustering
step every near-duplicate pipeline ends with: candidate pairs (from
MinHash-LSH / Jaccard / cosine) are edges; each component is one
duplicate cluster, from which one representative survives.

Algorithm: iterative min-label propagation.  Every node starts
labelled with its own id; each round every node takes the min of its
own label and its neighbors' labels; converges in O(graph diameter)
rounds.  Each round is one shuffle (join edges⋈labels + groupBy), and
``localCheckpoint`` truncates the lineage so the plan stays constant
size across iterations — without it the logical plan doubles per round
and the driver dies long before the data does.

Scale path: diameter-bound rounds are fine for dedup graphs (near-dup
clusters are shallow: diameter is almost always < 5).  For adversarial
long-chain graphs the O(log n) alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) drops in behind the same signature.

The reference has no graph operator; this extends the engine surface
the same way the consolidation aggregate (map2db.py:747-812) extends
an upsert into a groupBy: an iterative driver loop over declarative
per-round plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, comp) where comp is the min node id reachable from
    ``node``.  Only nodes appearing in ``edges`` are labelled —
    singletons are by definition their own component and never need the
    loop.

    Each iteration: propagate labels across edges (both directions),
    take the per-node min, stop when no label changed.  The convergence
    check is one lightweight action per round on a checkpointed
    DataFrame (a count over a semi-joined diff), not a collect.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # labels travel across every edge; a node's new label is the min
        # of its own and everything its neighbors hold
        neighbor_labels = sym.join(
            labels, sym["a"] == labels["node"], "inner"
        ).select(F.col("b").alias("node"), F.col("comp"))
        new_labels = (
            labels.select("node", "comp")
            .unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def duplicate_clusters(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Collapse candidate-pair edges into duplicate clusters:
    (cluster_id = min member id, size, members as sorted CSV).  Every
    cluster here has >= 2 members by construction (nodes come from
    edges)."""
    comps = connected_components(edges, src=src, dst=dst)
    return comps.groupBy(F.col("comp").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("size"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list("node")), lambda x: x.cast("string")
            ),
        ).alias("members"),
    )
