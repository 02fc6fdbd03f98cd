"""Count-min sketch: merge law, bounds, and sketch-size cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from insight_spark.operators.sketches import cms_build, cms_estimate
from insight_spark.sources import load_table
from tests.conftest import SF_DIR

DEPTH, WIDTH = 4, 1024


def test_cms_merge_equals_whole(spark):
    """Sketch(shard A ∪ shard B) == cell-wise sum of the shard
    sketches — the property that makes CMS a partial aggregate."""
    ev = load_table(spark, SF_DIR, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    whole = cms_build(ev, "user_id", DEPTH, WIDTH)
    merged = (
        cms_build(a, "user_id", DEPTH, WIDTH)
        .unionAll(cms_build(b, "user_id", DEPTH, WIDTH))
        .groupBy("r", "pos")
        .agg(F.sum("c").alias("c"))
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


def test_cms_never_undercounts_and_caps_size(spark):
    ev = load_table(spark, SF_DIR, "events")
    sketch = cms_build(ev, "user_id", DEPTH, WIDTH)
    assert sketch.count() <= DEPTH * WIDTH

    exact = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    est = cms_estimate(exact, sketch, "user_id", DEPTH, WIDTH)
    assert est.filter(F.col("cms_est") < F.col("n")).count() == 0


def test_cms_estimate_zero_for_absent_key(spark):
    ev = load_table(spark, SF_DIR, "events")
    sketch = cms_build(ev.limit(1), "user_id", DEPTH, WIDTH)
    ghost = spark.createDataFrame([(10**15,)], "user_id long")
    rows = cms_estimate(ghost, sketch, "user_id", DEPTH, WIDTH).collect()
    # a 1-row sketch leaves almost every cell empty: the ghost key must
    # hit >= 1 empty cell and therefore estimate 0 (min over rows)
    assert rows[0].cms_est == 0
