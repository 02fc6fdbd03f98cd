"""M129: observe() in-flight metrics — the audit numbers the gate
reports must equal an independent recount of the same corpus (no
second-pass aggregation needed in production, but the test pays one
to pin correctness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from insight_spark.operators.text import tokenize
from insight_spark.queries.corpus_clean import (
    _OBS_GATE_MIN_RATIO,
    quality_gate_observed,
)
from insight_spark.sources import load_table
from tests.conftest import SF_DIR


def test_observe_metrics_match_recount(spark):
    docs = load_table(spark, SF_DIR, "documents")
    gated, obs = quality_gate_observed(docs)
    n_kept = gated.count()  # the action that populates the observation

    got = obs.get
    toks = tokenize(F.col("text"))
    ratio = F.round(
        F.when(
            F.size(toks) > 0,
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
        ).otherwise(F.lit(0.0)),
        6,
    )
    scored = docs.withColumn("r", ratio)
    n_seen = scored.count()
    n_dropped = scored.filter(F.col("r") < _OBS_GATE_MIN_RATIO).count()
    mean_ratio = scored.agg(F.round(F.avg("r"), 6)).collect()[0][0]

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
