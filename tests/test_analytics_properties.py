"""Spark-independent correctness properties for the analytics
operators — closed-form and brute-force ground truths on constructed
inputs, so the guarantees (exact triangle count, PPJoin losslessness)
don't rest solely on the DuckDB oracle agreeing at one data point.
"""

from __future__ import annotations

import itertools
import random

from map2db_spark.queries_analytics import count_triangles, prefix_filter_pairs


def _edges_df(spark, edges):
    rows = [(int(a), int(b)) for a, b in sorted(set(edges))]
    return spark.createDataFrame(rows, schema="a long, b long")


def _stats(spark, edges):
    [row] = count_triangles(_edges_df(spark, edges)).collect()
    return row.asDict()


def _brute_triangles(edges):
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({n for e in es for n in e})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )


def test_complete_graph_k5(spark):
    # K5: C(5,3) = 10 triangles, C(5,2) = 10 edges
    edges = list(itertools.combinations(range(5), 2))
    s = _stats(spark, edges)
    assert s["n_nodes"] == 5 and s["n_edges"] == 10
    assert s["n_triangles"] == 10


def test_star_graph_has_no_triangles(spark):
    # hub-and-spoke: maximal degree skew, zero closure — exactly the
    # shape where an unoriented wedge join blows up and the count
    # must still be 0
    edges = [(0, i) for i in range(1, 12)]
    s = _stats(spark, edges)
    assert s["n_triangles"] == 0
    assert s["n_wedges"] == 11 * 10 // 2


def test_cycle_graph_has_no_triangles(spark):
    edges = [(i, (i + 1) % 8) for i in range(8)]
    assert _stats(spark, edges)["n_triangles"] == 0


def test_random_graphs_match_brute_force(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 12
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(n), 2)
            if rng.random() < 0.4
        ]
        s = _stats(spark, edges)
        assert s["n_triangles"] == _brute_triangles(edges), edges


def _brute_jaccard_pairs(sets, t_num, t_den):
    out = set()
    for ia, ib in itertools.combinations(sorted(sets), 2):
        inter = len(sets[ia] & sets[ib])
        union = len(sets[ia] | sets[ib])
        if t_den * inter >= t_num * union:
            out.add((ia, ib, inter, union))
    return out


def test_prefix_filter_is_lossless_on_random_set_families(spark):
    """The pigeonhole guarantee: prefix-filtered output equals brute
    force for random set families at several thresholds — losslessness
    must hold for ANY input, not just the corpus the oracle checked."""
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(30)]
    for t_num, t_den in [(9, 10), (4, 5), (1, 2)]:
        sets = {
            sid: frozenset(rng.sample(vocab, rng.randint(5, 15)))
            for sid in range(20)
        }
        tok = spark.createDataFrame(
            [(sid, t) for sid, s in sets.items() for t in s],
            schema="sid long, tok string",
        )
        got = {
            (r.id_a, r.id_b, r.inter_n, r.union_n)
            for r in prefix_filter_pairs(tok, t_num, t_den).collect()
        }
        want = _brute_jaccard_pairs(sets, t_num, t_den)
        assert got == want, (t_num, t_den, got ^ want)
