"""Runtime-reoptimization audit pins (M356-M358): the in-build plan
assertions must be NON-VACUOUS (the mechanism is absent without the
probe posture), and the probes must not leak confs into the shared
session."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insight_spark.queries import all_queries
from insight_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"

_PROBE_CONFS = (
    "spark.sql.shuffle.partitions",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.forceOptimizeSkewedJoin",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.optimizer.runtime.bloomFilter.enabled",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold",
)


def _q(name):
    return all_queries()[name]


def _snapshot(spark):
    out = {}
    for k in _PROBE_CONFS:
        try:
            out[k] = spark.conf.get(k)
        except Exception:
            out[k] = None
    return out


@pytest.mark.parametrize(
    "name",
    ["aqe_skew_join_audit", "aqe_bhj_switch_audit",
     "runtime_bloom_join_audit"],
)
def test_probe_confs_restored(spark, name):
    """Queries share one session with the whole registry — a leaked
    256-byte advisory partition size or a disabled broadcast threshold
    would silently re-plan every later query."""
    before = _snapshot(spark)
    _q(name)(spark, SF_DIR).collect()
    assert _snapshot(spark) == before, f"{name} leaked session confs"


def test_skew_audit_values_and_whale_mass(spark):
    """The value leg, independent of the plan leg: every event lands in
    exactly one segment (the dim is keyed by every possible acct), and
    the whale's segment carries >= half of all events by fixture
    construction."""
    rows = _q("aqe_skew_join_audit")(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    n = ev.count()
    assert sum(r["n_events"] for r in rows) == n
    whale_seg = (
        load_table(spark, SF_DIR, "customer")
        .filter(F.col("c_custkey") == 0)
        .collect()[0]["c_mktsegment"]
    )
    by_seg = {r["c_mktsegment"]: r["n_events"] for r in rows}
    assert by_seg[whale_seg] >= n // 2, "fixture lost its hot key"


def test_skew_split_is_absent_without_probe_posture(spark):
    """Non-vacuity control for M356: the SAME join under the session's
    normal confs (32 MiB static broadcast, default skew thresholds)
    must NOT carry skew=true — so the in-query assertion can only be
    satisfied by the probe posture actually engaging AQE's splitter."""
    ev = load_table(spark, SF_DIR, "events").select(
        F.when(F.col("event_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("acct"),
    ).repartition(8)
    dim = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("acct"), "c_mktsegment"
    )
    out = ev.join(dim, "acct").groupBy("c_mktsegment").count()
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan


def test_bloom_injection_absent_at_default_thresholds(spark):
    """Non-vacuity control for M358: at the default 10 GiB
    application-side threshold the test-tier scan is far too small, so
    no might_contain may appear — proving the in-query assertion
    detects the injection, not some always-present plan text."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_quantity"
    )
    brand = (
        load_table(spark, SF_DIR, "part")
        .filter(F.col("p_brand") == "Brand#11")
        .select("p_partkey", "p_brand")
    )
    out = li.join(brand, li.l_partkey == brand.p_partkey).groupBy(
        "p_brand"
    ).count()
    oplan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" not in oplan


def test_bhj_switch_rowcount_matches_plain_join(spark):
    """The strategy switch must be value-free: per-flag counts equal
    the same join computed without any probe posture."""
    audited = {
        r["l_returnflag"]: r["n_rows"]
        for r in _q("aqe_bhj_switch_audit")(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    urgent = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    plain = {
        r["l_returnflag"]: r["count"]
        for r in li.join(urgent, "l_orderkey")
        .groupBy("l_returnflag")
        .count()
        .collect()
    }
    assert audited == plain
