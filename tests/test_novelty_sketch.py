"""The frozen Bloom sketch under c_novelty_filter_frozen (VERDICT r9
#4): serialize/deserialize round-trip, shard-wise OR-merge equals the
union-corpus sketch (the mergeability claim in COVERAGE.md, now
load-bearing), Python/JVM hash-convention parity, and the
no-false-negative contract."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from map2db_spark.functions.sketches import (
    bloom_bit_positions,
    bloom_deserialize,
    bloom_merge,
    bloom_serialize,
)

M, K = 65536, 4


def test_serialize_roundtrip():
    rng = random.Random(42)
    for _ in range(5):
        bits = {rng.randrange(M) for _ in range(rng.randint(0, 3000))}
        raw = bloom_serialize(bits, M)
        assert len(raw) == M // 8
        assert bloom_deserialize(raw) == frozenset(bits)
    assert bloom_deserialize(bloom_serialize(set(), M)) == frozenset()


def test_shard_merge_equals_union_sketch():
    # freeze each shard independently, OR the bitmaps: must equal the
    # sketch of the union corpus — the property that lets a prior
    # corpus be frozen incrementally without re-reading any shard
    rng = random.Random(7)
    shards = [
        {f"gram-{rng.randrange(10_000)}" for _ in range(500)}
        for _ in range(3)
    ]

    def freeze(grams):
        bits = set()
        for g in grams:
            bits.update(bloom_bit_positions(g, M, K))
        return bloom_serialize(bits, M)

    merged = bloom_merge(*[freeze(s) for s in shards])
    union = freeze(set().union(*shards))
    assert merged == union


def test_positions_match_jvm_md5_convention(spark):
    # the Python freeze path and the JVM probe path must compute the
    # SAME positions or a sketch frozen by one side is useless to the
    # other (this is the c_novelty_filter_frozen 'nv{i}:' convention)
    grams = ["key agg row", "batch window spark", "the part data"]
    df = spark.createDataFrame([(g,) for g in grams], "gram STRING")
    exprs = [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"nv{i}:"), F.col("gram"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % M
        ).alias(f"p{i}")
        for i in range(K)
    ]
    jvm = {
        r["gram"]: [r[f"p{i}"] for i in range(K)]
        for r in df.select("gram", *exprs).collect()
    }
    for g in grams:
        assert bloom_bit_positions(g, M, K) == jvm[g], g


def test_no_false_negatives():
    grams = [f"g{i} h{i} k{i}" for i in range(2000)]
    bits = set()
    for g in grams:
        bits.update(bloom_bit_positions(g, M, K))
    frozen = bloom_deserialize(bloom_serialize(bits, M))
    for g in grams:
        assert all(p in frozen for p in bloom_bit_positions(g, M, K))


def test_merge_rejects_mismatched_sizes():
    import pytest

    with pytest.raises(ValueError):
        bloom_merge(bytes(8), bytes(16))
    with pytest.raises(ValueError):
        bloom_merge()
