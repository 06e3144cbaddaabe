"""Typed-cell parity guard shared by the local correctness mirrors.

The external gate hashes TYPED cells after a pandas round-trip, so an
oracle column DuckDB types HUGEINT (any uncast ``sum(BIGINT)``) lands
as float64 while Spark emits int64 — and the hash splits on dtype even
when every value is bit-identical (round 10's four red rows:
x_gbdt_stumps, x_quantile_pinball, c_length_bucketing,
x_bradley_terry_mm; round 5's DECIMAL(38,0) incident was the same class
through a different type).  Both local mirrors compare values with
Python ``==`` (where ``123 == 123.0``), so they were structurally blind
to the class.  This module closes the gap: for every oracle, DuckDB's
column types (via ``DESCRIBE``) must agree with the Spark result schema
on the integer-vs-float family, so a bigint↔float64 split can never
pass locally again.
"""

from __future__ import annotations

_DUCK_INT = {
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "UBIGINT",
}
# HUGEINT/UHUGEINT are integers in DuckDB but float64 after the pandas
# round-trip the gate uses — classify them by their POST-pandas family.
_DUCK_FLOAT = {"HUGEINT", "UHUGEINT", "FLOAT", "DOUBLE", "REAL"}

_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}


def _duck_family(duck_type: str) -> str | None:
    t = duck_type.strip().upper()
    if t in _DUCK_INT:
        return "int"
    if t in _DUCK_FLOAT:
        return "float"
    return None  # decimals/strings/dates: value compare covers them


def _spark_family(simple_string: str) -> str | None:
    t = simple_string.strip().lower()
    if t in _SPARK_INT:
        return "int"
    if t in _SPARK_FLOAT:
        return "float"
    return None


def duck_output_types(con, sql: str) -> dict[str, str]:
    """Column-name → DuckDB type for an oracle, WITHOUT executing it.

    ``DESCRIBE <select>`` resolves the full binder type of every output
    column (including through WITH / UNION ALL, where one uncast branch
    widens the whole column) — exactly the type the pandas path will
    later coerce from.
    """
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def assert_oracle_dtype_parity(name: str, spark_schema, con, sql: str):
    """Fail when any output column's integer-vs-float family differs
    between the Spark result schema and the DuckDB oracle's bind types.

    Mirrors the gate's typed-cell hash: Spark bigint vs DuckDB HUGEINT
    (→ float64) is a FAILURE even though ``123 == 123.0``.
    """
    duck_types = duck_output_types(con, sql)
    spark_types = {f.name: f.dataType.simpleString() for f in spark_schema}
    bad = []
    for col, sp_t in spark_types.items():
        if col not in duck_types:
            continue  # column-name compare belongs to the value check
        sp_fam = _spark_family(sp_t)
        du_t = duck_types[col]
        du_fam = _duck_family(du_t)
        if sp_fam and du_fam and sp_fam != du_fam:
            bad.append((col, sp_t, du_t))
    if bad:
        detail = ", ".join(
            f"{c}: spark={s} vs duckdb={d}" for c, s, d in bad
        )
        raise AssertionError(
            f"{name}: typed-cell family split ({detail}) — the gate "
            "hashes dtypes, so an uncast sum(BIGINT) (HUGEINT → "
            "float64) fails even with identical values; CAST the "
            "oracle column (every UNION ALL branch) to match Spark"
        )
