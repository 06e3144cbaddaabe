"""Structured Streaming queries for the driver gate.

Each runs a real streaming query (file source, availableNow trigger,
foreachBatch parquet file sink — executor-side writes, so result rows
never transit the driver) to completion and returns the result as a
DataFrame read back from the sink.  Complete-mode aggregations over
bounded input equal their batch twins, so tumbling windows and the
custom stateful operator get full DuckDB oracles; session windows (no
ANSI-SQL equivalent) register rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from map2db_spark.registry import query


def _run(spark: SparkSession, sf_dir: str, build, out_mode: str,
         schema: str, upsert_keys: tuple[str, ...] | None = None) -> DataFrame:
    """schema documents the contract (and pins column order for the
    oracle compare); the data itself arrives via the distributed file
    transport, never as driver rows."""
    from map2db_spark.streaming.events import (
        read_events_stream,
        run_available_now_df,
    )

    out = run_available_now_df(
        build(read_events_stream(spark, sf_dir)), out_mode,
        upsert_keys=upsert_keys,
    )
    cols = [c.split()[0] for c in schema.split(",")]
    return out.select(*cols)


@query(
    "s_stream_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL 6 HOUR, ts) AS win_start,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    """,
    tags=("streaming", "window-agg"),
)
def s_stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling event-time window, run as a real streaming
    query; equals the batch aggregation over the bounded input."""
    from map2db_spark.streaming.events import windowed_event_counts

    return _run(
        spark, sf_dir, windowed_event_counts, "complete",
        "win_start TIMESTAMP, n LONG, total_value DOUBLE",
    )


@query(
    "s_stream_user_state",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, max(ts) AS last_seen
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def s_stream_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState custom stateful operator (running per-user
    count + last-seen), driven as a real streaming query."""
    from map2db_spark.streaming.events import running_user_state

    return _run(
        spark, sf_dir, running_user_state, "update",
        "user_id LONG, n_events LONG, last_seen TIMESTAMP",
        upsert_keys=("user_id",),
    )


@query(
    "s_stream_stream_join",
    oracle="""
    SELECT p.event_id AS p_event, p.user_id AS p_user, p.ts AS p_ts,
           v.event_id AS v_event, v.ts AS v_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
    tags=("streaming", "join"),
)
def s_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (purchase x views within
    the preceding hour), run as a real streaming query; over bounded
    input it equals the batch interval join the oracle computes."""
    from map2db_spark.streaming.events import purchases_joined_to_views

    return _run(
        spark, sf_dir, purchases_joined_to_views, "append",
        "p_event LONG, p_user LONG, p_ts TIMESTAMP, v_event LONG, v_ts TIMESTAMP",
    )


@query(
    "s_stream_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
    tags=("streaming", "session"),
)
def s_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) over the event stream."""
    from map2db_spark.streaming.events import sessionize

    return _run(
        spark, sf_dir, sessionize, "complete",
        "session_start TIMESTAMP, session_end TIMESTAMP, user_id LONG,"
        " n_events LONG, session_value DOUBLE",
    )


@query(
    "s_stream_dedup",
    oracle="""
    SELECT event_id, user_id, ts, event_type FROM events
    """,
    tags=("streaming", "dedup"),
)
def s_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup over an at-least-once (self-unioned)
    stream: dropDuplicates with watermark-bounded state emits each
    event_id exactly once — the streaming twin of d_exact_dedup.
    Oracle: event_ids are unique in the source, so exactly-once output
    equals the source table."""
    from map2db_spark.streaming.events import dedup_events_stream

    return _run(
        spark, sf_dir, dedup_events_stream, "append",
        "event_id LONG, user_id LONG, ts TIMESTAMP, event_type STRING",
    )


@query(
    "s_stream_sliding_window",
    oracle="""
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) - i * INTERVAL 10 MINUTE AS win_start,
           event_type,
           round(sum(value), 2) AS total
    FROM events CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS i)
    GROUP BY 1, 2
    """,
    tags=("streaming", "window-agg"),
)
def s_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (overlapping) event-time windows — 1-hour span, 10-minute
    slide, so each event lands in 6 windows.  The oracle expands the
    same 6-window membership arithmetically."""
    from map2db_spark.streaming.events import sliding_value_sums

    return _run(
        spark, sf_dir, sliding_value_sums, "complete",
        "win_start TIMESTAMP, event_type STRING, total DOUBLE",
    )


def _curation_stream_oracle() -> str:
    from map2db_spark.queries_curation import _SPLIT_H_SQL
    from map2db_spark.queries_pipeline import _QUALITY_EXPR_SQL, _langid_expr_sql

    return f"""
    SELECT doc_id,
           {_langid_expr_sql()} AS detected,
           {_QUALITY_EXPR_SQL} AS quality,
           CASE WHEN {_SPLIT_H_SQL} < 'f0' THEN 'train'
                WHEN {_SPLIT_H_SQL} < 'f8' THEN 'val'
                ELSE 'test' END AS split,
           ({_QUALITY_EXPR_SQL} >= 0.7 AND {_langid_expr_sql()} = 'en') AS keep
    FROM documents
    """


@query(
    "s_stream_curation",
    oracle=_curation_stream_oracle(),
    tags=("streaming", "curation", "map-only"),
)
def s_stream_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time curation: language-ID, quality, deterministic split,
    and keep decision computed row-locally on a document STREAM (append
    mode, no state) — how a crawl pipeline filters before data lands.
    Equals the batch projection over the bounded input, so it carries a
    full SQL oracle (expressions shared with the batch queries, so the
    two surfaces cannot drift)."""
    from map2db_spark.streaming.events import (
        curate_documents,
        read_documents_stream,
        run_available_now_df,
    )

    return run_available_now_df(
        curate_documents(read_documents_stream(spark, sf_dir)), "append"
    ).select("doc_id", "detected", "quality", "split", "keep")


@query(
    "s_stream_static_enrich",
    oracle="""
    SELECT c.c_mktsegment, e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    tags=("streaming", "join", "enrichment"),
)
def s_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment (the dimension-join shape of
    every ingest pipeline): streaming events join the static customer
    table — broadcast, so the unbounded side never shuffles for the
    join — then aggregate per (mktsegment, event_type) in complete
    mode.  Over bounded input this equals the batch join+aggregate the
    oracle computes.  Exact integer cents keep the sum
    order-independent across micro-batches."""
    from map2db_spark.streaming.events import (
        enrich_with_customer,
        read_events_stream,
        run_available_now_df,
    )
    from map2db_spark.tables import Tables

    customer = Tables(spark, sf_dir).customer
    return run_available_now_df(
        enrich_with_customer(read_events_stream(spark, sf_dir), customer),
        "complete",
    ).select("c_mktsegment", "event_type", "n", "cents")


@query(
    "s_stream_dedup_within_wm",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
    tags=("streaming", "dedup"),
)
def s_stream_dedup_within_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup via dropDuplicatesWithinWatermark — unlike
    s_stream_dedup (plain dropDuplicates), this API suppresses
    duplicates whose RE-DELIVERY got a different event time, keying
    state on event_id alone and evicting it one watermark delay after
    first sighting.  Exactly-once output over the doubled bounded
    input equals the source table (event_ids unique at source); ts is
    projected out because within-watermark semantics don't promise
    WHICH copy's timestamp survives."""
    from map2db_spark.streaming.events import dedup_within_watermark_stream

    return _run(
        spark, sf_dir, dedup_within_watermark_stream, "append",
        "event_id LONG, user_id LONG, event_type STRING",
    )


@query(
    "s_stream_foreachbatch_upsert",
    oracle="""
    SELECT user_id, n_events, last_event_id FROM (
      SELECT user_id,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
               AS n_events,
             CAST(event_id AS BIGINT) AS last_event_id,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("streaming", "foreachbatch", "exactly-once"),
)
def s_stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch exactly-once upsert sink: ~4 real micro-batches
    (maxFilesPerTrigger=1 under Trigger.AvailableNow) MERGE into a
    keyed store through an idempotency ledger — last (ts, event_id)
    wins per user, counts accumulate, and replaying a delivered batch
    is asserted to be a no-op before the result is returned (the
    query RAISES if replay mutates state).  The final upserted state
    equals the batch argmax aggregation, which is the oracle."""
    from map2db_spark.streaming.events import foreach_batch_upsert

    state, ledger, replay_noop = foreach_batch_upsert(spark, sf_dir)
    assert replay_noop, "foreachBatch replay must be idempotent"
    assert len(ledger) >= 2, "expected multiple micro-batches"
    rows = [(uid, v[0], v[2]) for uid, v in state.items()]
    return spark.createDataFrame(
        rows, "user_id LONG, n_events LONG, last_event_id LONG"
    )



@query(
    "s_stream_append_emission",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    w AS (
      SELECT time_bucket(INTERVAL 6 HOUR, ts) AS win_start,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
      FROM events GROUP BY 1
    )
    SELECT win_start, n, sum_cents
    FROM w CROSS JOIN mx
    WHERE win_start + INTERVAL 6 HOUR <= m - INTERVAL 30 MINUTE
    """,
    tags=("streaming", "watermark", "append-mode"),
)
def s_stream_append_emission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode emission timing under a watermark, proven against
    a batch oracle: a window emits exactly once, and only after the
    watermark (max event time - 30 min) passes its END — so the
    append output over the bounded stream equals the batch
    aggregation RESTRICTED to watermark-closed windows, with the
    trailing open windows withheld.  This is the semantics that makes
    append sinks idempotent-by-construction (each window appears
    once, final) and explains why streaming dashboards lag by the
    watermark delay.

    Empirical note pinned by this query's development: this Spark
    build does NOT drop late input rows in the aggregation itself
    (a very-late row re-creates state for its expired window and
    emits at the next flush; numRowsDroppedByWatermark stays 0).
    Strict late-row DROP therefore requires an explicit upstream
    filter; the guaranteed watermark semantics are emission timing
    and state eviction — which is what this query pins.
    """
    from map2db_spark.streaming.events import append_emission_counts

    return append_emission_counts(spark, sf_dir).select(
        "win_start", "n", "sum_cents"
    )


@query(
    "s_stream_checkpoint_resume",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events
    """,
    tags=("streaming", "checkpoint", "exactly-once"),
)
def s_stream_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-recovery exactly-once across THREE query lifetimes:
    stream half the events into a native append-mode parquet sink,
    append the second half to the source and RESUME from the same
    checkpointLocation (the offset log admits only the new files),
    then run once more with no new input (must be a no-op).  The sink
    holds every event exactly once, so the read-back aggregate equals
    the whole-table batch oracle — any replay doubles rows, any loss
    drops them, and either flips the hash.  This is the crash-restart
    contract (s_stream_foreachbatch_upsert covers the transactional-
    sink side; this covers the source-offset-log side with the
    native file sink)."""
    from map2db_spark.streaming.events import checkpointed_resume

    return checkpointed_resume(spark, sf_dir).select(
        "n_rows", "n_distinct", "sum_cents"
    )
