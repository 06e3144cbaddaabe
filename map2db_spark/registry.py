"""Query registry: one place where every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extensions) is declared
as a (Spark callable, DuckDB oracle SQL) pair.

``__spark_entry__.queries()`` / ``oracle_sql()``, ``bench.py`` and the
parity tests all read from this registry, so a query is never declared
in one place and checked in another.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None,
    *,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", bench=bench, tags=tags
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in QUERIES.items() if spec.bench}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import map2db_spark.queries_relational  # noqa: F401
    import map2db_spark.queries_pipeline  # noqa: F401
    import map2db_spark.queries_mapsforge  # noqa: F401
    import map2db_spark.queries_streaming  # noqa: F401
    import map2db_spark.queries_sql  # noqa: F401
    import map2db_spark.queries_functions  # noqa: F401
    import map2db_spark.queries_curation  # noqa: F401

    _LOADED = True
