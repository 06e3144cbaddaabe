"""CLI parity with the reference (map2db.py:1535-1547):

    python3 -m map2db_spark.cli src.map [dst.db] [--sink=sqlite|parquet]

dst defaults to src with the .map suffix replaced by .db.

Sink selection (SURVEY §7 hard part 6): the positional-.db invocation
keeps the reference's behavior — a single-file SQLite geodatabase, the
EXPORT format.  ``--sink=parquet`` (or a dst without the .db suffix
plus --sink) writes the CLUSTER-DEFAULT partitioned parquet datasets
instead; the ``map2db()`` API itself defaults to parquet, because on a
real cluster the single-file drain is the wrong default (BASELINE.md:
144x the reference via parquet vs 29-36x via SQLite at 10^5 tiles).
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    sink = None
    args = []
    for a in argv:
        if a.startswith("--sink="):
            sink = a.split("=", 1)[1]
        elif a == "--sink":
            raise ValueError("use --sink=sqlite or --sink=parquet")
        else:
            args.append(a)
    if len(args) < 1:
        raise ValueError("map pathname not provided")
    src = args[0]
    if not src.endswith(".map"):
        raise ValueError(f"{src} does not appear to be a mapsforge map file")
    if sink is None:
        # reference-parity default for the CLI: the .db export
        sink = "sqlite"
    if sink not in ("sqlite", "parquet"):
        raise ValueError(f"unknown sink {sink!r} (sqlite|parquet)")
    default_suffix = ".db" if sink == "sqlite" else ".parquet"
    dst = args[1] if len(args) >= 2 else src[:-4] + default_suffix

    from map2db_spark.pipeline import map2db
    from map2db_spark.session import get_spark

    spark = get_spark("map2db")
    spark.sparkContext.setLogLevel("WARN")
    try:
        result = map2db(spark, src, dst, sink=sink)
    finally:
        spark.stop()
    what = "database" if sink == "sqlite" else "parquet dataset"
    print(f"{what} written to '{dst}'")
    print(f"feature counts: {result['counts']}")
    if result.get("config"):
        print(f"forgemap configuration file written to {result['config']}")
    where = (
        "README table of the database"
        if sink == "sqlite"
        else "manifest.json of the dataset"
    )
    print(f"\nThe following is also in the {where}:")
    print(f'Text: """\n{result["license"]}\n"""')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
