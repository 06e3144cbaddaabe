"""Local mirror of the driver's correctness gate: run every registered
query on Spark at sf0.01 and its oracle on DuckDB over the same
parquet, then compare row count, sorted column names, and
order-insensitive values.

Float policy: queries round their own float outputs (the registry
convention), so comparison here is exact after a defensive 1e-9
relative tolerance — if a query needs the tolerance to pass, tighten
the query's rounding instead.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from map2db_spark.registry import QUERIES, _ensure_loaded
from tests.conftest import SF_CORRECT

_ensure_loaded()

ORACLE_CASES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY_CASES = sorted(n for n, s in QUERIES.items() if s.oracle is None)


def _canon_decimal(v) -> str:
    """Exact canonical digit string for Decimal cells — NO float
    round-trip.  DuckDB's pandas path coerces DECIMAL(38,0) to float64
    and corrupts values above 2^53 (round 5's three red driver rows);
    the local mirror must therefore compare decimals exactly or it is
    more lenient than the gate it mirrors."""
    s = format(v, "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return "0" if s in ("", "-0") else s


def _norm_cell(v):
    if v is None:
        return None
    import decimal

    if isinstance(v, decimal.Decimal):
        return _canon_decimal(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse ulp noise; queries already round, this is a backstop
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        # The driver's value-hash dies on array-typed result columns
        # (unhashable type: 'list') — fail loudly here so the lenient
        # local mirror can never pass a query the driver would reject.
        raise AssertionError(
            "array-typed result cell: serialize arrays to strings in the "
            f"registered query (driver value-hash cannot handle {v!r})"
        )
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return sorted_cols, out


def _assert_no_wide_decimals(name, schema):
    """The external gate's hash path round-trips DuckDB results through
    pandas, where wide decimals silently become float64 (corruption
    above 2^53) while Spark keeps exact Decimals — so the hash splits
    even when values agree.  No registered query may emit a decimal
    column wider than 18 digits; exact big rationals cross the engine
    boundary as canonical VARCHAR (x_decimal_ledger convention)."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    def walk(dt, path):
        if isinstance(dt, DecimalType) and dt.precision > 18:
            raise AssertionError(
                f"{name}: column {path} is {dt.simpleString()} — wider "
                "than 18 digits; emit as VARCHAR (x_decimal_ledger "
                "convention) so the driver hash cannot split on "
                "engine-side float coercion"
            )
        if isinstance(dt, StructType):
            for f in dt.fields:
                walk(f.dataType, f"{path}.{f.name}")
        elif isinstance(dt, ArrayType):
            walk(dt.elementType, path + "[]")
        elif isinstance(dt, MapType):
            walk(dt.keyType, path + "<key>")
            walk(dt.valueType, path + "<value>")

    walk(schema, "")


def test_wide_decimal_guard_trips(spark):
    """Self-test: the sweep MUST fail on a deliberately wide-decimal
    fixture query (r5 verdict item 2's done-condition)."""
    import pyspark.sql.functions as F

    wide = spark.range(1).select(
        F.lit(1).cast("decimal(38,0)").alias("too_wide")
    )
    with pytest.raises(AssertionError, match="wider than 18 digits"):
        _assert_no_wide_decimals("fixture", wide.schema)
    ok = spark.range(1).select(F.lit(1).cast("decimal(18,2)").alias("fine"))
    _assert_no_wide_decimals("fixture", ok.schema)


def test_dtype_guard_trips_on_hugeint(spark, duck):
    """Self-test: a deliberately UNCAST sum(BIGINT) oracle (DuckDB
    HUGEINT → float64 through the gate's pandas path) MUST fail the
    dtype guard against a Spark bigint column even though every value
    compares equal with ``==`` (round 10's four red rows)."""
    import pyspark.sql.functions as F

    from tests.dtype_guard import assert_oracle_dtype_parity

    sdf = spark.range(3).agg(F.sum("id").cast("long").alias("s"))
    uncast = "SELECT sum(i) AS s FROM range(3) t(i)"
    with pytest.raises(AssertionError, match="typed-cell family split"):
        assert_oracle_dtype_parity("fixture", sdf.schema, duck, uncast)
    cast_ok = "SELECT CAST(sum(i) AS BIGINT) AS s FROM range(3) t(i)"
    assert_oracle_dtype_parity("fixture", sdf.schema, duck, cast_ok)
    # the reverse split (Spark double vs DuckDB BIGINT) also trips
    sdf_d = spark.range(3).agg(F.sum("id").cast("double").alias("s"))
    with pytest.raises(AssertionError, match="typed-cell family split"):
        assert_oracle_dtype_parity("fixture", sdf_d.schema, duck, cast_ok)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, duck, name):
    spec = QUERIES[name]
    try:
        sdf = spec.fn(spark, SF_CORRECT)
        _assert_no_wide_decimals(name, sdf.schema)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
    finally:
        # persisted intermediates (LSH neighborhoods, round-trip
        # results, stream transports) must not accumulate across 300+
        # parametrized cases sharing one session
        spark.catalog.clearCache()

    from tests.dtype_guard import assert_oracle_dtype_parity

    assert_oracle_dtype_parity(name, sdf.schema, duck, spec.oracle)
    rel = duck.execute(spec.oracle)
    d_cols = [c[0] for c in rel.description]
    d_rows = rel.fetchall()

    sc, sr = _normalize(s_cols, s_rows)
    dc, dr = _normalize(d_cols, d_rows)

    assert sc == dc, f"{name}: column mismatch spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"{name}: rowcount spark={len(sr)} duckdb={len(dr)}"
    mismatches = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_CORRECT)
    _assert_no_wide_decimals(name, sdf.schema)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
