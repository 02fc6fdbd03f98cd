"""The user-facing plan lint (insight_spark.plans.scale_audit).

Each rule is exercised on a deliberately bad plan (must flag) and the
clean counterpart (must not), so the lint's signal and its
false-positive behavior are both pinned.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from insight_spark.plans import Finding, scale_audit
from insight_spark.queries import all_queries

from tests.conftest import SF_DIR


def _rules(findings: list[Finding], severity: str | None = None) -> set[str]:
    return {
        f.rule
        for f in findings
        if severity is None or f.severity == severity
    }


def test_flags_cartesian_product(spark):
    # hint forces CartesianProductExec; without it a small side plans
    # as BroadcastNestedLoopJoin (the warn-severity sibling, below)
    a = spark.range(10).select(F.col("id").alias("a"))
    b = spark.range(10).select(F.col("id").alias("b"))
    bad = a.hint("SHUFFLE_REPLICATE_NL").crossJoin(b)
    assert "cartesian-product" in _rules(scale_audit(bad), "fatal")


def test_warns_nested_loop_join(spark):
    a = spark.range(10).select(F.col("id").alias("a"))
    b = spark.range(10).select(F.col("id").alias("b"))
    assert "nested-loop-join" in _rules(scale_audit(a.crossJoin(b)), "warn")


def test_flags_unpartitioned_window(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert "unpartitioned-window" in _rules(scale_audit(df), "fatal")


def test_partitioned_window_not_flagged(spark):
    df = spark.range(100).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy(F.col("id") % 10).orderBy("id")),
    )
    assert "unpartitioned-window" not in _rules(scale_audit(df))


def test_flags_rowwise_python(spark):
    plus_one = F.udf(lambda x: x + 1, IntegerType())
    df = spark.range(100).select(plus_one(F.col("id").cast("int")).alias("y"))
    assert "rowwise-python" in _rules(scale_audit(df), "fatal")


def test_arrow_batched_python_not_flagged(spark):
    from pyspark.sql.functions import pandas_udf

    # lambda form: no type hints to resolve under future-annotations
    plus_one = pandas_udf(lambda s: s + 1, "long")
    df = spark.range(100).select(plus_one("id").alias("y"))
    assert "rowwise-python" not in _rules(scale_audit(df))


def test_global_sort_warns_but_topk_does_not(spark):
    full = spark.range(1000).orderBy(F.desc("id"))
    assert "global-sort" in _rules(scale_audit(full), "warn")
    # top-k fuses to TakeOrderedAndProject — no global Sort node
    topk = spark.range(1000).orderBy(F.desc("id")).limit(5)
    assert "global-sort" not in _rules(scale_audit(topk))


def test_shuffle_count_reported(spark):
    df = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
    info = [f for f in scale_audit(df) if f.rule == "shuffle-count"]
    assert len(info) == 1 and info[0].severity == "info"
    assert "1 shuffle" in info[0].detail


def test_findings_sorted_fatal_first(spark):
    a = spark.range(10).select(F.col("id").alias("a"))
    b = spark.range(10).select(F.col("id").alias("b"))
    bad = (
        a.hint("SHUFFLE_REPLICATE_NL")
        .crossJoin(b)
        .withColumn("rn", F.row_number().over(Window.orderBy("a")))
    )
    sevs = [f.severity for f in scale_audit(bad)]
    assert sevs == sorted(
        sevs, key=lambda s: {"fatal": 0, "warn": 1, "info": 2}[s]
    )


def test_flagship_query_is_clean(spark):
    """The audit agrees with the engine-wide guards on a real declared
    query: the flagship TPC-H Q1 plan has zero fatal findings."""
    df = all_queries()["tpch_q1_pricing_summary"](spark, SF_DIR)
    fatal = [f for f in scale_audit(df) if f.severity == "fatal"]
    assert not fatal, fatal
