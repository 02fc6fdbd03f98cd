"""Registration-time plan lint (plans/audit.lint_query_plan wired into
the @query decorator behind SPARK_GRAFT_LINT_PLANS).

The round-5 (rowwise UDTF plan) and round-6 (constant-folded window
partition key) regressions both shipped guard-breaking queries because
the engine-wide guards only ran in the full test sweep.  These tests
pin the build-time gate: a query whose plan contains a fatal
scale-killer raises PlanScaleError the first time it is BUILT with the
flag set, and documented bounded-window exemptions still pass.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from insight_spark.plans.audit import (
    BOUNDED_GLOBAL_WINDOW_OK,
    PlanScaleError,
    lint_query_plan,
)


def _docs(spark):
    return spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("k")
    )


def test_unpartitioned_window_is_fatal(spark):
    df = _docs(spark).withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    )
    with pytest.raises(PlanScaleError, match="unpartitioned-window"):
        lint_query_plan("bad_window_query", df)


def test_constant_folded_partition_key_is_fatal(spark):
    # The exact round-6 regression shape: partitionBy on a literal is
    # constant-folded away and the window goes global.
    df = _docs(spark).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(F.lit(0)).orderBy("doc_id")
        ),
    )
    with pytest.raises(PlanScaleError, match="unpartitioned-window"):
        lint_query_plan("bad_const_key_query", df)


def test_cartesian_product_is_fatal(spark):
    a, b = _docs(spark), _docs(spark).select(F.col("doc_id").alias("b_id"))
    # hint forces CartesianProductExec (tiny sides otherwise broadcast)
    df = a.hint("shuffle_replicate_nl").crossJoin(b)
    with pytest.raises(PlanScaleError, match="cartesian-product"):
        lint_query_plan("bad_cross_query", df)


def test_rowwise_python_is_fatal(spark):
    from pyspark.sql.types import LongType

    plain_udf = F.udf(lambda x: x + 1, LongType(), useArrow=False)
    df = _docs(spark).select(plain_udf("doc_id").alias("y"))
    with pytest.raises(PlanScaleError, match="rowwise-python"):
        lint_query_plan("bad_udf_query", df)


def test_bounded_window_exemption_passes(spark):
    # An allowlisted name may plan a global window (bounded input by
    # construction); the same plan under any other name must fail.
    assert "hybrid_search_rrf" in BOUNDED_GLOBAL_WINDOW_OK
    df = (
        _docs(spark)
        .orderBy("doc_id")
        .limit(5)
        .withColumn("rn", F.row_number().over(Window.orderBy("doc_id")))
    )
    lint_query_plan("hybrid_search_rrf", df)  # no raise
    with pytest.raises(PlanScaleError):
        lint_query_plan("not_exempt", df)


def test_clean_plan_passes(spark):
    df = _docs(spark).groupBy("k").agg(F.count("*").alias("n"))
    lint_query_plan("good_query", df)  # no raise


def test_decorator_lints_by_default_and_exempts_driver_paths(
    spark, monkeypatch
):
    """End-to-end (VERDICT r10 task 8): a guard-breaking query
    registered via @query fails at BUILD time by DEFAULT (dev loops),
    builds normally after set_lint_default(False) (the driver/bench
    path), and the env var overrides in both directions."""
    import insight_spark.queries as reg

    # another test may have routed through __spark_entry__.queries()
    # (which legitimately flips the default off for the driver path) —
    # this test's subject is the DEFAULT-ON behavior, so pin it
    reg.set_lint_default(True)
    name = "_lint_demo_bad_query"
    try:

        @reg.query(name)
        def _bad(sp, sf_dir):
            return _docs(sp).withColumn(
                "rn", F.row_number().over(Window.orderBy("doc_id"))
            )

        fn = reg._QUERIES[name]
        monkeypatch.delenv("SPARK_GRAFT_LINT_PLANS", raising=False)
        # default-on: a dev building a scale-killer fails immediately
        with pytest.raises(PlanScaleError, match=name):
            fn(spark, "unused")
        # driver/bench path: timed runs pay zero lint overhead
        reg.set_lint_default(False)
        fn(spark, "unused")  # builds fine
        # env overrides win either way
        monkeypatch.setenv("SPARK_GRAFT_LINT_PLANS", "1")
        with pytest.raises(PlanScaleError, match=name):
            fn(spark, "unused")
        reg.set_lint_default(True)
        monkeypatch.setenv("SPARK_GRAFT_LINT_PLANS", "0")
        fn(spark, "unused")  # builds fine
    finally:
        reg._QUERIES.pop(name, None)
        reg.set_lint_default(True)


def test_spark_entry_disables_lint_for_driver_window(spark):
    """__spark_entry__.queries() is the driver's import path — it must
    flip the build-time lint off so CORRECTNESS/bench timings never
    include (or fail on) plan linting."""
    import insight_spark.queries as reg
    import __spark_entry__ as contract

    reg.set_lint_default(True)
    try:
        contract.queries()
        assert reg._LINT_DEFAULT is False
    finally:
        reg.set_lint_default(True)
