"""Property-based invariants for the curation operators — the driver
gate checks value parity at one SF; these check the algebraic
properties that must hold at ANY scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from map2db_spark.functions import curation as C
from tests.conftest import SF_CORRECT


def test_packing_partitions_input_and_bounds_bins(spark):
    """Every doc lands in exactly one (shard, bin); bins fill to at
    least ctx_len before a new bin opens (concat-then-chunk: a bin's
    token span covers [bin*ctx, (bin+1)*ctx))."""
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    packed = C.pack_sequences(docs, ctx_len=512, n_shards=4)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    # within a shard, bin ids are dense from 0
    bins = packed.groupBy("shard").agg(
        F.min("bin").alias("lo"),
        F.max("bin").alias("hi"),
        F.countDistinct("bin").alias("nb"),
    )
    for r in bins.collect():
        assert r["lo"] == 0
        assert r["nb"] == r["hi"] + 1
    # every bin except a shard's last holds >= ctx_len tokens of spillover
    # coverage: total tokens in bins 0..b-1 >= b * ctx
    agg = (
        packed.groupBy("shard", "bin")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    per_shard: dict[int, dict[int, int]] = {}
    for r in agg:
        per_shard.setdefault(r["shard"], {})[r["bin"]] = r["t"]
    for shard, m in per_shard.items():
        run = 0
        for b in sorted(m):
            if b > 0:
                assert run >= b * 512, (shard, b, run)
            run += m[b]


def test_split_assign_covers_and_is_stable(spark):
    """Every doc gets exactly one split; assignment is a pure function
    of doc_id (re-running on a reshuffled frame changes nothing)."""
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    a = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", C.split_assign(F.col("doc_id")).alias("s")
        ).collect()
    }
    b = {
        r["doc_id"]: r["s"]
        for r in docs.repartition(13)
        .select("doc_id", C.split_assign(F.col("doc_id")).alias("s"))
        .collect()
    }
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}


def test_dup_ngram_fraction_bounds(spark):
    """dup fraction lies in [0, 1); a fully repetitive text scores
    high, distinct text scores 0."""
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c a b c"), (2, "one two three four five six")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["d"]
        for r in df.select(
            "doc_id", C.dup_ngram_fraction(F.col("text"), 3).alias("d")
        ).collect()
    }
    assert rows[2] == 0.0
    assert 0.5 < rows[1] < 1.0


def test_redact_pii_idempotent(spark):
    """Redacting already-redacted text is a no-op (placeholders must
    not re-match any pattern)."""
    df = spark.createDataFrame(
        [(1, "mail a@b.co ip 10.1.2.3 tel +1 555-123-9876 done")],
        "doc_id long, text string",
    )
    once = df.select(C.redact_pii(F.col("text")).alias("t"))
    twice = once.select(C.redact_pii(F.col("t")).alias("t"))
    assert once.collect() == twice.collect()
    out = once.collect()[0]["t"]
    assert "<EMAIL>" in out and "<IP>" in out and "<PHONE>" in out
