"""M129: observe() in-flight metrics — the audit numbers the gate
reports must equal an independent recount of the same corpus (no
second-pass aggregation needed in production, but the test pays one
to pin correctness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from insight_spark.operators.text import tokenize
from insight_spark.queries.corpus_clean import quality_gate_observed
from insight_spark.sources import load_table
from tests.conftest import SF_DIR


def test_observe_metrics_match_recount(spark):
    docs = load_table(spark, SF_DIR, "documents")
    gated, obs = quality_gate_observed(docs)
    n_kept = gated.count()  # the action that populates the observation

    got = obs.get
    toks = tokenize(F.col("text"))
    scored = docs.withColumn(
        "_d", F.size(F.array_distinct(toks))
    ).withColumn("_s", F.size(toks))
    n_seen = scored.count()
    n_dropped = scored.filter(
        ~((F.col("_s") > 0) & (2 * F.col("_d") >= F.col("_s")))
    ).count()
    mean_ratio = scored.agg(
        F.round(
            F.avg(
                F.when(
                    F.col("_s") > 0,
                    F.col("_d").cast("double") / F.col("_s"),
                ).otherwise(F.lit(0.0))
            ),
            6,
        )
    ).collect()[0][0]

    assert got["n_seen"] == n_seen
    assert got["n_dropped"] == n_dropped
    assert got["n_seen"] - got["n_dropped"] == n_kept
    assert abs(got["mean_ratio"] - mean_ratio) < 1e-9


def test_observe_adds_no_exchange(spark):
    """The CollectMetrics node must ride the existing stage: the gate
    plan contains no shuffle at all (scan -> project -> observe ->
    filter)."""
    docs = load_table(spark, SF_DIR, "documents")
    gated, _ = quality_gate_observed(docs)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "CollectMetrics" in plan, plan


def test_ratio_micro_no_int_overflow_on_long_docs(spark):
    """Regression (r8, ADVICE): F.size() is 32-bit INT, so
    2000000 * _d overflowed INT for docs with >= 1074 distinct tokens
    (ArithmeticException under ANSI, silently wrong otherwise) while
    the DuckDB oracle computed in BIGINT.  The micro-ratio must now
    widen to BIGINT before multiplying."""
    long_doc = " ".join(f"tok{i}" for i in range(2000))  # 2000 distinct
    docs = spark.createDataFrame(
        [("d1", "src", long_doc)], "doc_id string, source string, text string"
    )
    gated, _ = quality_gate_observed(docs)
    row = gated.select("ratio_micro").collect()[0]
    assert row["ratio_micro"] == 1_000_000, row  # all-distinct => ratio 1.0
