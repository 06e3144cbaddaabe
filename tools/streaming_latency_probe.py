#!/usr/bin/env python3
"""Micro-batch latency breakdown for the streaming operators
(VERDICT r15 #5: the s_stream_* rows had only ever been plan-audited;
this probe measures where each micro-batch actually spends time).

For every streaming build in streaming/events.py the probe runs the
same availableNow bounded query the registered s_stream_* rows run,
but through a noop foreachBatch sink and with the StreamingQuery
handle kept, then reports per-batch `durationMs` (triggerExecution =
wall; addBatch = execution incl. state commit; getBatch/planning/
walCommit = orchestration) and the state-store metrics
(numRowsTotal, memoryUsedBytes, partition count via the operator's
numShufflePartitions when present).

    SPARK_GRAFT_CPUS=8 python3 tools/streaming_latency_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from map2db_spark.session import get_spark
    from map2db_spark.streaming import events as E

    spark = get_spark("streaming-latency-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # warm pass (sf0.001 tumbling, discarded): JVM + codegen warm-up
    # would otherwise be billed entirely to the first probed stream
    warm = (
        E.windowed_event_counts(
            E.read_events_stream(spark, "/root/testdata/sf0.001")
        )
        .writeStream.foreachBatch(
            lambda df, _i: df.write.format("noop").mode("overwrite").save()
        )
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    warm.awaitTermination()

    builds = {
        "tumbling_window": (E.windowed_event_counts, "complete"),
        "sliding_window": (E.sliding_value_sums, "complete"),
        "sessionize": (E.sessionize, "complete"),
        "user_state": (E.running_user_state, "update"),
        "stream_join": (E.purchases_joined_to_views, "append"),
        "dedup": (E.dedup_events_stream, "append"),
    }

    report = {}
    for name, (build, mode) in builds.items():
        stream = build(E.read_events_stream(spark, sf_dir))
        t0 = time.perf_counter()
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _i: df.write.format("noop")
                .mode("overwrite")
                .save()
            )
            .outputMode(mode)
            .trigger(availableNow=True)
            .queryName(f"probe_{name}")
            .start()
        )
        q.awaitTermination()
        wall = round(time.perf_counter() - t0, 3)
        batches = []
        for p in q.recentProgress:
            d = p.get("durationMs", {})
            ops = [
                {
                    "op": so.get("operatorName"),
                    "rowsTotal": so.get("numRowsTotal"),
                    "memBytes": so.get("memoryUsedBytes"),
                    "partitions": (so.get("customMetrics") or {}).get(
                        "numShufflePartitions"
                    ),
                    "commitMs": so.get("commitTimeMs"),
                }
                for so in p.get("stateOperators", [])
            ]
            batches.append(
                {
                    "batchId": p.get("batchId"),
                    "inRows": p.get("numInputRows"),
                    "triggerMs": d.get("triggerExecution"),
                    "addBatchMs": d.get("addBatch"),
                    "getBatchMs": d.get("getBatch"),
                    "planMs": d.get("queryPlanning"),
                    "walMs": d.get("walCommit"),
                    "commitOffsetsMs": d.get("commitOffsets"),
                    "state": ops,
                }
            )
        report[name] = {"wall_sec": wall, "batches": batches}

    print(json.dumps({"sf_dir": sf_dir, "streams": report}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
