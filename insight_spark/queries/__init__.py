"""Declared query registry — the surface behind ``__spark_entry__``.

Each query is a (name, spark_fn, oracle_sql) triple registered via the
``@query`` decorator.  ``spark_fn(spark, sf_dir) -> DataFrame`` builds
the PySpark plan; ``oracle`` is the DuckDB-dialect SQL the driver runs
side-by-side at sf0.01 (row-count + schema + order-insensitive
value-hash).  Queries with ``oracle=None`` get the weaker rows-only
check (approx sketches, engine-specific RNG — SURVEY.md §7.4.6).

Alignment discipline (SURVEY.md §7.4), applied inside every pair:
- every computed column aliased identically on both sides;
- money/measure sums: DECIMAL(38,6) cast *before* aggregation (exact,
  order-independent) on both sides;
- means: round(exact_sum::double / count, 6) — identical formula both
  sides → bit-equal doubles;
- every order feeding row_number/limit ends in a unique tie-break key;
- rank-on-rounded-score for float ordering parity.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, SparkQuery] = {}
_ORACLE: dict[str, str] = {}

#: Submodules that populate the registry on import.
_MODULES = (
    "insight_spark.queries.relational",
    "insight_spark.queries.windows",
    "insight_spark.queries.events",
    "insight_spark.queries.text",
    "insight_spark.queries.vectors",
    "insight_spark.queries.llm",
    "insight_spark.queries.joins",
    "insight_spark.queries.aggregates",
    "insight_spark.queries.window_extra",
    "insight_spark.queries.setops",
    "insight_spark.queries.text_extra",
    "insight_spark.queries.vectors_extra",
    "insight_spark.queries.misc",
    "insight_spark.queries.pipeline_extra",
    "insight_spark.queries.functions_extra",
    "insight_spark.queries.subqueries",
    "insight_spark.queries.training",
)

_loaded = False


def _load() -> None:
    global _loaded
    if not _loaded:
        for mod in _MODULES:
            importlib.import_module(mod)
        _loaded = True


def query(name: str, oracle: str | None = None):
    """Register a declared query (and its DuckDB oracle, if hashable)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, SparkQuery]:
    _load()
    return dict(_QUERIES)


def all_oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLE)
