"""CLI parity with the reference (map2db.py:1535-1547):

    python3 -m map2db_spark.cli src.map [dst.db]

dst defaults to src with the .map suffix replaced by .db.
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 1:
        raise ValueError("map pathname not provided")
    src = argv[0]
    if not src.endswith(".map"):
        raise ValueError(f"{src} does not appear to be a mapsforge map file")
    dst = argv[1] if len(argv) >= 2 else src[:-4] + ".db"

    from map2db_spark.pipeline import map2db
    from map2db_spark.session import get_spark

    spark = get_spark("map2db")
    spark.sparkContext.setLogLevel("WARN")
    try:
        result = map2db(spark, src, dst)
    finally:
        spark.stop()
    print(f"database written to '{dst}'")
    print(f"feature counts: {result['counts']}")
    if result.get("config"):
        print(f"forgemap configuration file written to {result['config']}")
    print("\nThe following is also in the README table of the database:")
    print(f'Text: """\n{result["license"]}\n"""')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
