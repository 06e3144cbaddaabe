"""Corpus-wide exact-substring duplicate spans — the full (corpus-
scale) form of Lee et al. 2022's "Deduplicating Training Data Makes
Language Models Better", built Spark-first (VERDICT r9 #1).

r9's d_longest_common_span is the PAIRWISE half: given LSH candidate
pairs, score the longest verbatim shared block.  The production
operator must find every verbatim duplicate span of length >= L across
the WHOLE corpus with no candidate generator in front.  Lee et al. do
it with a monolithic suffix array; the Spark-native decomposition used
here is k-gram ANCHOR grouping:

  1. every character offset emits its length-L window's hash — one
     (anchor_hash, doc_id, offset) row per position, O(total chars);
  2. an anchor is DUPLICATED iff it occurs at >= 2 positions
     corpus-wide (map-side-combinable count on the hash key);
  3. positions semi-join the duplicated-anchor set;
  4. per doc, duplicated windows [off, off+L) merge into maximal
     intervals via one ordered window pass (island detection).

This is EXACT for the Lee-et-al removal semantics, not an
approximation: a position p lies inside a verbatim duplicate span of
length >= L  <=>  some length-L window containing p occurs elsewhere
in the corpus  <=>  p is covered by a duplicated anchor window.  So
the merged intervals are precisely the maximal duplicate-span
coverage a suffix array would emit (pinned against brute force and
against the pairwise suffix-automaton LCS in
tests/test_exact_substring.py).

Scale shape (the part the suffix array cannot do distributed): every
shuffle carries fixed-width (anchor_hash, doc_id, offset) rows — text
never crosses an Exchange (plan-asserted).  Pass 2's shuffle only
moves positions whose anchor is duplicated (the rare case in a clean
corpus).  Total volume is O(total chars) rows, linear like the suffix
array, but embarrassingly partitionable on the hash key; no suffix
structure ever materializes beyond the per-row window hash.  At
100 TB the md5 would drop to xxhash64 (8-byte keys) — md5 is used
here because both engines compute it identically (oracle parity).

No counterpart in the reference (map2db.py decodes map tiles); this
is the training-data-pipeline extension surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def duplicate_spans(
    docs: DataFrame,
    window: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_occurrences: int = 2,
    checkpoint: bool = True,
) -> DataFrame:
    """Maximal verbatim duplicate spans of length >= ``window`` across
    the whole corpus.  Returns (id_col, span_start, span_end) with
    span_end exclusive; a doc absent from the output has no duplicated
    span.  ``min_occurrences`` is the corpus-wide occurrence floor for
    a window to count as duplicated (2 = Lee et al. semantics,
    counting within-doc repeats)."""
    # GATED input scatter before the ~(chars per doc)x explode: a
    # small corpus parquet arrives as ONE input split (row-group
    # granularity beats maxPartitionBytes), which would run the whole
    # substr+md5 position pass single-task — the CLAUDE.md
    # repartition-before-work-amplifying-explodes rule.  The scatter
    # only fires when the scan has fewer splits than the session's
    # parallelism, so a production corpus (thousands of splits) never
    # re-ships its text; position/anchor rows stay text-free either
    # way (plan-asserted).  Measured at sf0.1 on local[32]: 5.5 s ->
    # 2.0-2.8 s standalone for the registered query.
    narrow = docs.select(id_col, text_col).where(
        F.length(text_col) >= window
    )
    target = docs.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < target:
        narrow = narrow.repartition(target, F.col(id_col))
    positions = narrow.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.length(text_col) - window)
        ).alias("off"),
        F.col(text_col),
    ).select(
        id_col,
        "off",
        # text is consumed map-side here; only the 8-byte anchor hash
        # shuffles.  xxhash64 (r15, guide §2.3 narrower types): the
        # anchor is an internal equality key only — any hash with the
        # same collision-free behavior yields the IDENTICAL span
        # output, and an 8-byte long row is ~4x narrower than the
        # 32-hex md5 string it replaces across the checkpoint, the
        # anchor-count Exchange and the probe Exchange, with a far
        # cheaper per-position hash (the pass is O(total chars)
        # hashes).  Collision risk at sf0.1 (~4M windows): ~5e-7
        # birthday mass; output equality is pinned against the md5
        # form in tests/test_exact_substring.py and the DuckDB oracle
        # (which keeps md5) at sf0.001/0.01/0.1.
        F.xxhash64(
            F.col(text_col).substr(F.col("off") + 1, F.lit(window))
        ).alias("h"),
    )
    # positions feeds BOTH the anchor count and the semi-join probe:
    # materialize it once (localCheckpoint after AQE optimization —
    # the multi-branch reuse tool that, unlike persist(), doesn't pin
    # a non-AQE plan under a vanilla session; measured 9.2s -> 4.0s at
    # sf0.1 vs recomputing the explode+hash per branch).  On a real
    # cluster the same role is played by a shuffle-reuse or a
    # checkpoint to the cluster store.  (checkpoint=False keeps the
    # full lineage visible for the plan-shape tests.)
    if checkpoint:
        positions = positions.localCheckpoint()
    dup_anchors = (
        positions.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_occurrences)
        .select("h")
    )
    # no broadcast hint: the duplicated-anchor set scales with the
    # corpus' duplication rate (worst case O(chars)) — AQE picks a
    # broadcast at runtime when it is genuinely small
    dup_pos = positions.join(dup_anchors, "h", "left_semi").select(
        id_col, "off"
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("off")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("off")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = dup_pos.select(
        id_col,
        "off",
        F.when(
            F.col("off")
            > F.coalesce(F.max(F.col("off") + window).over(w_prev), F.lit(-1)),
            1,
        )
        .otherwise(0)
        .alias("new_span"),
    )
    return (
        flagged.select(
            id_col, "off", F.sum("new_span").over(w_run).alias("span_id")
        )
        .groupBy(id_col, "span_id")
        .agg(
            F.min("off").alias("span_start"),
            (F.max("off") + window).alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )
