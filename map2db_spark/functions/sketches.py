"""Mergeable frequency summaries: distributed heavy hitters via
Misra-Gries partition summaries + candidate-only exact verification.

The 100 TB shape: a full `groupBy(key).count()` over a high-cardinality
key shuffles every distinct key; when only the heavy tail matters, a
bounded-memory per-partition summary (m counters, whatever the
partition size) finds every key with global count > N/m, and the
exact pass then counts ONLY those candidates — the shuffle carries
candidates, not the key universe.

Guarantee (Misra-Gries / mergeable-summaries): a summary with m
counters underestimates any key's count by at most N_part/m, and
summaries merge associatively (add counts, then subtract the
(m+1)-th largest and drop non-positives).  So any key with global
frequency above N/m survives into the candidate set, and if the
true k-th frequency clears that bar, candidate-verified top-k is
EXACTLY the true top-k — which is what makes the registered query
hash-matchable against a plain exact oracle.  Size m to the skew
threshold you care about (m >= N/f_k); with m above the distinct-key
count the summary degenerates to exact partition counts.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(acc: dict, other: dict, m: int) -> dict:
    """Merge two Misra-Gries summaries down to m counters."""
    for k, v in other.items():
        acc[k] = acc.get(k, 0) + v
    if len(acc) > m:
        kth = sorted(acc.values(), reverse=True)[m]  # (m+1)-th largest
        acc = {k: v - kth for k, v in acc.items() if v > kth}
    return acc


def mg_partition_summaries(
    df: DataFrame, key_col: str, m: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries as (key, lb) rows, lb the
    summary's lower-bound count.  Batch-vectorized: each Arrow batch
    contributes its exact value_counts (numpy), merged into the
    running summary with the MG merge — sequential per partition,
    O(m) state."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        for pdf in batches:
            counts = pdf[key_col].value_counts().to_dict()
            summary = _mg_merge(summary, counts, m)
        if summary:
            yield pd.DataFrame(
                {"key": list(summary), "lb": list(summary.values())}
            )

    return df.select(key_col).mapInPandas(kernel, schema="key LONG, lb LONG")


def heavy_hitters_topk(
    df: DataFrame, key_col: str, k: int, m: int = 512
) -> DataFrame:
    """Exact top-k keys by frequency, computed the scale-safe way:
    MG candidates -> broadcast semi-filter -> exact count over
    candidates only -> top-k window.  Exact whenever the true k-th
    frequency exceeds N/m (see module docstring); ties break by key.
    Returns (key, n, rank)."""
    from pyspark.sql.window import Window

    cands = mg_partition_summaries(df, key_col, m).select("key").distinct()
    exact = (
        df.join(F.broadcast(cands), df[key_col] == cands["key"], "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), key_col)
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col(key_col).alias("key"), "n", "rank")
    )


# ---------------------------------------------------------------------------
# Frozen Bloom membership sketch (cross-corpus novelty filtering)
# ---------------------------------------------------------------------------
#
# The ingest-time "have we trained on this already" primitive
# (VERDICT r9 #4): a prior corpus freezes into an m-bit Bloom filter
# of its n-gram set; new shards score against the FROZEN artifact
# without touching the prior corpus again.  Bloom filters are
# mergeable (bitwise OR) and the serialized form is the m/8-byte
# bitmap — build per partition/shard, OR the bitmaps, ship the bytes.
# Hash convention matches the engine's JVM side and the SQL oracles:
# position i of value v = int(md5(f"{seed}{i}:" + v)[:8], 16) % m.


def bloom_bit_positions(value: str, m: int, k: int, seed: str = "nv") -> list[int]:
    """The k bit positions of one value — the Python twin of the
    F.conv(F.substring(F.md5(...), 1, 8), 16, 10) % m convention used
    JVM-side (identical md5, so a sketch frozen by either side is
    probed correctly by the other)."""
    import hashlib

    return [
        int(
            hashlib.md5(f"{seed}{i}:{value}".encode()).hexdigest()[:8], 16
        )
        % m
        for i in range(k)
    ]


def bloom_serialize(bits: set[int] | frozenset[int], m: int) -> bytes:
    """Freeze a set of set-bit positions into the m-bit bitmap (the
    artifact a prior corpus ships to future ingest jobs)."""
    buf = bytearray((m + 7) // 8)
    for b in bits:
        if not 0 <= b < m:
            raise ValueError(f"bit {b} out of range for m={m}")
        buf[b >> 3] |= 1 << (b & 7)
    return bytes(buf)


def bloom_deserialize(raw: bytes) -> frozenset[int]:
    """Set-bit positions of a frozen bitmap."""
    return frozenset(
        (byte_i << 3) | bit
        for byte_i, byte in enumerate(raw)
        for bit in range(8)
        if byte & (1 << bit)
    )


def bloom_merge(*bitmaps: bytes) -> bytes:
    """OR-merge frozen bitmaps (all same m).  Mergeability is what
    lets each shard freeze independently and the union corpus' sketch
    be assembled without re-reading any shard."""
    if not bitmaps:
        raise ValueError("nothing to merge")
    sizes = {len(b) for b in bitmaps}
    if len(sizes) != 1:
        raise ValueError(f"bitmap sizes differ: {sorted(sizes)}")
    out = bytearray(bitmaps[0])
    for other in bitmaps[1:]:
        for i, byte in enumerate(other):
            out[i] |= byte
    return bytes(out)
