#!/usr/bin/env python3
"""Registry-wide physical-plan audit (r15, guide §7.2): captures
`.explain("formatted")` for EVERY registered query at the given SF
and flags scale-smell nodes:

- SortAggregate            (immutable agg buffer -> sort before agg;
                            the min(string) pattern d_minhash_lsh had)
- CartesianProduct / BroadcastNestedLoopJoin (all-pairs joins)
- BatchEvalPython          (row-at-a-time pickled Python UDF)
- PythonUDTF               (per-row eval)
- SinglePartition          (an Exchange collapsing to one partition)
- rangepartitioning(...,1) (global sort to one partition)

Prints one line per flagged query plus a summary.  An audit, not a
gate: some hits are adjudicated (tiny scalar frames, TakeOrdered
tails) — see OPTIMIZATION_r15.md.  Usage:

    python3 tools/plan_audit.py [sf_dir] [out.json]
"""

from __future__ import annotations

import contextlib
import io
import json
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

FLAGS = (
    "SortAggregate",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
    "PythonUDTF",
    "SinglePartition",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from map2db_spark.registry import all_queries
    from map2db_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    entry_mod._nanos_as_long(spark)

    hits: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, fn in all_queries().items():
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - audit records, not raises
            errors[name] = repr(exc)[:200]
            continue
        found = [f for f in FLAGS if f in plan]
        if found:
            hits[name] = found
        # free any eager localCheckpoint blocks the construction made
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)
        spark.catalog.clearCache()

    for name, found in sorted(hits.items()):
        print(f"{name}: {','.join(found)}")
    print(f"-- flagged {len(hits)} / errors {len(errors)}")
    for name, err in errors.items():
        print(f"ERROR {name}: {err}")
    if out_path:
        Path(out_path).write_text(
            json.dumps({"hits": hits, "errors": errors}, indent=1)
        )
    spark.stop()


if __name__ == "__main__":
    main()
