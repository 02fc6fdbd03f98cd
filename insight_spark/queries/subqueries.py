"""Subquery queries — Catalyst decorrelation coverage (SURVEY §4.1).

Correlated scalar subqueries and EXISTS/IN subqueries are the SQL-side
twins of the C4/C5 semi/anti DataFrame joins: Catalyst rewrites them
(``RewriteCorrelatedScalarSubquery`` → left outer join + agg,
``RewritePredicateSubquery`` → semi/anti join), so the executed plan is
shuffle-friendly at any scale — no per-row re-execution.  Both sides of
each pair run the IDENTICAL SQL text (shared ANSI dialect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from insight_spark.queries import query
from insight_spark.sources import load_table

_SCALAR_SQL = """
    SELECT p_partkey, p_brand, p_size
    FROM part p
    WHERE p_size > (
        SELECT AVG(p_size) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
"""

_EXISTS_SQL = """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o2
        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
    )
"""

_IN_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey <= 1
    )
"""


def _run_sql(spark: SparkSession, sf_dir: str, sql: str, tables) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


@query("scalar_subquery_avg", oracle=_SCALAR_SQL)
def scalar_subquery_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: parts larger than their brand's mean
    size.  Decorrelated by Catalyst into one grouped-agg + join — the
    subquery runs once, not per row."""
    return _run_sql(spark, sf_dir, _SCALAR_SQL, ["part"])


@query("exists_subquery", oracle=_EXISTS_SQL)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS → semi join + anti join (C4/C5 SQL form)."""
    return _run_sql(spark, sf_dir, _EXISTS_SQL, ["customer", "orders"])


@query("in_subquery", oracle=_IN_SQL)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → left semi join against the (broadcast) dim."""
    return _run_sql(spark, sf_dir, _IN_SQL, ["supplier", "nation"])


_LATERAL_SQL = """
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) t
"""


@query("lateral_topn_per_key", oracle=_LATERAL_SQL)
def lateral_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (the SQL-standard per-row derived
    table): each customer's top-2 orders by price, the statement run
    VERBATIM on both engines.  The canonical "top-N per key expressed
    relationally" form — Catalyst decorrelates the correlated LIMIT
    into a partitioned rank (the same physical shape as the E10
    WindowGroupLimit path), so the lateral sugar costs one key-shuffle,
    never a per-row subquery execution.  Unique tie-break
    (o_totalprice DESC, o_orderkey) per SURVEY §7.4.3."""
    return _run_sql(spark, sf_dir, _LATERAL_SQL, ["customer", "orders"])
