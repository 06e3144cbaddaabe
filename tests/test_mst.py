"""Pins for the Boruvka minimum-spanning-forest operator
(operators/mst.py): exact agreement with a serial Kruskal over random
graphs (distinct weights -> unique MSF), plus edge cases (forest of
several components, single edge, empty input)."""

from __future__ import annotations

import random

from map2db_spark.operators.mst import minimum_spanning_forest


def kruskal(n_nodes: int, edges: list[tuple[int, int, int]]) -> set[int]:
    """Serial reference: returns the chosen edge weights (weights are
    unique edge ids by construction)."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chosen = set()
    for u, v, w in sorted(edges, key=lambda e: e[2]):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            chosen.add(w)
    return chosen


def spark_msf(spark, edges: list[tuple[int, int, int]]) -> set[int]:
    df = spark.createDataFrame(edges, "u LONG, v LONG, w LONG")
    return {
        r.w for r in minimum_spanning_forest(df).collect()
    }


def test_matches_kruskal_on_random_graphs(spark):
    for seed in range(6):
        rng = random.Random(100 + seed)
        n = rng.randint(6, 30)
        possible = [
            (u, v) for u in range(n) for v in range(u + 1, n)
        ]
        m = rng.randint(n // 2, min(len(possible), 3 * n))
        pairs = rng.sample(possible, m)
        weights = rng.sample(range(1, 10_000), m)  # distinct
        edges = [(u, v, w) for (u, v), w in zip(pairs, weights)]
        assert spark_msf(spark, edges) == kruskal(n, edges), (seed, edges)


def test_forest_of_disconnected_components(spark):
    # two triangles far apart: MSF keeps 2 edges per triangle
    edges = [
        (0, 1, 10), (1, 2, 20), (0, 2, 30),
        (5, 6, 11), (6, 7, 21), (5, 7, 31),
    ]
    got = spark_msf(spark, edges)
    assert got == {10, 20, 11, 21}, got


def test_single_edge_and_chain(spark):
    assert spark_msf(spark, [(1, 2, 7)]) == {7}
    # a chain is already a tree: every edge chosen
    chain = [(i, i + 1, 100 + i) for i in range(8)]
    assert spark_msf(spark, chain) == {100 + i for i in range(8)}


def test_msf_converges_in_exactly_max_rounds(spark):
    """A single-edge graph finishes in ONE round; max_rounds=1 must be
    accepted (the old for/else raised even though the forest was
    complete, because emptiness was only observed at the top of the
    next iteration)."""
    from map2db_spark.operators.mst import minimum_spanning_forest

    e = spark.createDataFrame([(1, 2, 10)], "u LONG, v LONG, w LONG")
    out = minimum_spanning_forest(e, max_rounds=1).collect()
    assert [(r["u"], r["v"], r["w"]) for r in out] == [(1, 2, 10)]


def test_msf_empty_input_keeps_caller_aliases(spark):
    from map2db_spark.operators.mst import minimum_spanning_forest

    e = spark.createDataFrame([], "a LONG, b LONG, wt LONG")
    out = minimum_spanning_forest(e, src="a", dst="b", weight="wt")
    assert out.columns == ["a", "b", "wt"]
    assert out.count() == 0


def test_msf_nonconvergence_still_raises(spark):
    """max_rounds=1 on a graph that needs two rounds leaves cross
    edges standing and must raise."""
    import pytest as _pytest

    from map2db_spark.operators.mst import minimum_spanning_forest

    # two tight pairs bridged by an expensive edge: round 1 merges the
    # pairs (each endpoint's minimum is its pair edge), the bridge
    # still crosses components afterwards -> needs a second round
    e = spark.createDataFrame(
        [(1, 2, 1), (3, 4, 2), (2, 3, 100)], "u LONG, v LONG, w LONG"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        minimum_spanning_forest(e, max_rounds=1)
