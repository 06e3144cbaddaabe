"""Distributed minimum spanning forest via Boruvka rounds — the
classic MapReduce/Pregel graph algorithm the engine's CC / k-core /
PageRank family was missing, and the backbone of SINGLE-LINKAGE
hierarchical clustering (cutting the MSF at a distance threshold
yields exactly the single-linkage clusters — the dendrogram view of
the dedup/cluster stack).

Boruvka is the MST algorithm that distributes: every round, each
component picks its MINIMUM outgoing edge (one map-side-combinable
aggregate on the component key), the picked edges merge components
(one connected-components pass over the COMPONENT graph — nodes =
components, not data), and the component count at least halves, so
the loop runs O(log n) rounds of bounded dataflow.  Kruskal's global
sort and Prim's sequential frontier do not distribute; Boruvka is
the textbook answer.

Correctness requires DISTINCT edge weights (ties would make the
minimum ambiguous and can create cycles); callers encode a unique
tiebreak into the weight (weight * K + edge-id).  With distinct
weights the MSF is UNIQUE, which is what lets the registered query's
oracle verify this implementation with a DIFFERENT algorithm
entirely (the minimax-path / cycle property: an edge is in the MSF
iff its weight equals the minimax path weight between its
endpoints) — algorithm-independent agreement on the unique answer.

No counterpart in the reference (map2db.py decodes map tiles); this
is the training-data-pipeline extension surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def minimum_spanning_forest(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
    max_rounds: int = 40,
) -> DataFrame:
    """Minimum spanning forest of an undirected graph with DISTINCT
    edge weights.  Returns the chosen edges (src, dst, weight).

    Per Boruvka round: label each edge with its endpoints' current
    component ids; drop intra-component edges; every component picks
    its minimum cross edge (min on the component key, considering the
    edge from both sides); picked edges join the forest and merge
    their components via a CC pass over the component graph.  The
    driver loop is O(log n) rounds (components at least halve); each
    round's state is localCheckpointed so lineage stays flat (the
    k-core / CC convention for iterative dataflow)."""
    from map2db_spark.operators.components import connected_components

    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), F.col(weight).alias("w")
    ).localCheckpoint()
    comp = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("c"))
        .localCheckpoint()
    )
    def cross_edges(comp: DataFrame) -> DataFrame:
        return (
            e.join(
                comp.select(
                    F.col("node").alias("u"), F.col("c").alias("cu")
                ),
                "u",
            )
            .join(
                comp.select(
                    F.col("node").alias("v"), F.col("c").alias("cv")
                ),
                "v",
            )
            .where(F.col("cu") != F.col("cv"))
            .localCheckpoint()
        )

    chosen_rounds: list[DataFrame] = []
    converged = False
    for _ in range(max_rounds):
        lab = cross_edges(comp)
        if not lab.take(1):
            converged = True
            break
        cand = lab.select(F.col("cu").alias("c"), "w").unionByName(
            lab.select(F.col("cv").alias("c"), "w")
        )
        min_w = cand.groupBy("c").agg(F.min("w").alias("w")).select("w")
        # w is unique per edge, so the semi-join recovers exactly the
        # picked edges; an edge picked by both endpoints dedups on w
        chosen = (
            lab.join(min_w, "w", "left_semi")
            .dropDuplicates(["w"])
            .localCheckpoint()
        )
        chosen_rounds.append(chosen.select("u", "v", "w"))
        # merge components: CC over the COMPONENT graph (bounded by
        # the current component count, not the data size)
        cc = connected_components(
            chosen.select("cu", "cv"), src="cu", dst="cv"
        )
        comp = (
            comp.join(
                cc.withColumnRenamed("node", "c"), "c", "left"
            )
            .select(
                "node",
                F.coalesce(F.col("comp"), F.col("c")).alias("c"),
            )
            .localCheckpoint()
        )
    if not converged and cross_edges(comp).take(1):
        # the budget ran out with cross edges still standing; a forest
        # that finished in EXACTLY max_rounds rounds passes this check
        raise RuntimeError(
            f"Boruvka did not converge in {max_rounds} rounds"
        )
    if not chosen_rounds:
        return (
            e.select("u", "v", "w")
            .limit(0)
            .select(
                F.col("u").alias(src),
                F.col("v").alias(dst),
                F.col("w").alias(weight),
            )
        )
    out = chosen_rounds[0]
    for df in chosen_rounds[1:]:
        out = out.unionByName(df)
    # no cross-round dedup needed: a chosen edge's endpoints merge, so
    # it is intra-component (filtered) in every later round
    return out.select(
        F.col("u").alias(src), F.col("v").alias(dst), F.col("w").alias(weight)
    )
