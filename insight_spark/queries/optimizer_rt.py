"""Runtime-reoptimization audits: the three Catalyst/AQE mechanisms a
100 TB deployment leans on when STATIC planning cannot know enough —
skew-join splitting, runtime join-strategy switching, and runtime
Bloom-filter (semi-join reduction) injection.

Every other query in this engine declares a plan and trusts the
optimizer; these three PROVE, from the executed/optimized plan string
of this very session, that the runtime safety nets actually engage on
this engine's configuration contract.  Each query executes its join
under the posture confs, asserts the plan artifact (``skew=true``,
final-vs-initial join strategy, ``might_contain``/``bloom_filter_agg``),
restores the session confs, and returns the ordinary value-oracled
aggregate — so the driver's hash check keeps grading semantics while
the in-build assertion grades the mechanism.  A Spark upgrade or conf
regression that silently turns any of these off fails the query, not a
dashboard three rounds later.

Reference parity note: no reference file:line is citable — the
``/root/reference`` checkout is empty (SURVEY.md §0); rows M356-M358
of SURVEY §2 are the graded contract for this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_spark.engine import conf_override
from insight_spark.operators.relational import money, money_out
from insight_spark.queries import query
from insight_spark.sources import load_table

#: Probe confs, exported so the restoration tests iterate EXACTLY the
#: keys each probe touches (a hand-copied list drifted once — review
#: finding, r12 session 2).
SKEW_PROBE_CONF: dict[str, str] = {
    "spark.sql.shuffle.partitions": "16",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256b",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256b",
}

BHJ_PROBE_CONF: dict[str, str] = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "8m",
}

BLOOM_PROBE_CONF: dict[str, str] = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "1b",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@query(
    "aqe_skew_join_audit",
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id END AS acct,
               CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                   AS value_micro
        FROM events
    )
    SELECT c.c_mktsegment AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(f.value_micro) AS BIGINT) AS value_sum_micro
    FROM fact f JOIN customer c ON f.acct = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def aqe_skew_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE skew-join split, proven from the executed plan (M356).

    The fixture is the production pathology: half of all events route
    to ONE whale account (``event_id % 2 = 0 → acct 0``), so the
    shuffle partition holding key 0 dwarfs the median and a static
    hash-join would ride one straggler task for half the table.  With
    ``spark.sql.adaptive.skewJoin`` engaged (thresholds scaled to the
    test tier; a cluster keeps the 256 MiB defaults) AQE must split
    that partition across its map-chunk boundaries and replicate the
    matching dim rows — asserted here as ``SortMergeJoin(skew=true)``
    in THIS run's final adaptive plan, the artifact that says the
    straggler was actually cut, not merely permitted.

    Shapes that matter (found while building this audit, kept as
    documentation): OptimizeSkewedJoin only matches
    ``SMJ(Sort(shuffle), Sort(shuffle))`` — an aggregate between the
    shuffle and the join (the join-back-aggregate idiom) defeats it,
    so the skew-sensitive side must be a plain relation; and a split
    needs MULTIPLE map chunks, hence the ``repartition(8)`` standing
    in for the many-map-task reality of a real cluster (a single-file
    local scan is one map task, which is unsplittable).  Splitting
    breaks the join's hash partitioning for the downstream per-segment
    aggregate, so ``forceOptimizeSkewedJoin`` accepts that extra
    exchange — at scale the re-shuffle of join OUTPUT rows is noise
    next to a 50%-of-the-table straggler.

    Broadcast is disabled for the probe because a broadcast join has
    no skewed shuffle to rescue — the audit targets the plan family
    where skew actually hurts.  The oracle is mechanism-blind SQL:
    splitting is physical, so values must not move.  The audit
    deliberately re-executes at the caller's collect instead of
    persisting the K-row aggregate: the registry stays cache-free, and
    the re-run is the same finalized adaptive plan (bench lists the
    query as ITERATIVE so timings charge the whole operation).
    """
    with conf_override(spark, SKEW_PROBE_CONF):
        fact = (
            load_table(spark, sf_dir, "events")
            .select(
                F.when(F.col("event_id") % 2 == 0, F.lit(0))
                .otherwise(F.col("user_id"))
                .cast("long")
                .alias("acct"),
                (F.col("value").cast("decimal(38,6)") * 1000000)
                .cast("long")
                .alias("value_micro"),
            )
            .repartition(8)
        )
        dim = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("acct"), "c_mktsegment"
        )
        out = fact.join(dim, "acct").groupBy("c_mktsegment").agg(
            F.count("*").alias("n_events"),
            F.sum("value_micro").alias("value_sum_micro"),
        )
        out.collect()  # materialize the final adaptive plan
        plan = _executed_plan(out)
        assert "isFinalPlan=true" in plan, "adaptive plan never finalized"
        assert "skew=true" in plan, (
            "AQE did not split the whale-account partition — no "
            "skew=true join in the final plan:\n" + plan[:2000]
        )
    return out


@query(
    "aqe_bhj_switch_audit",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
)
def aqe_bhj_switch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE runtime join-strategy switch, proven initial-vs-final (M357).

    The case static planning cannot win: the dim side is
    ``orders WHERE o_orderpriority='1-URGENT'`` and without CBO
    column stats the optimizer cannot know the filter keeps ~20% —
    on a 100 TB fact table, planning SMJ when the filtered dim fits
    in memory shuffles the entire fact side for nothing.  The probe
    disables STATIC broadcast (threshold -1 — stands in for "the
    static size estimate was too big/unknown") while leaving the
    RUNTIME threshold at 8 MiB; AQE measures the dim's actual shuffle
    output between stages and rewrites the join mid-query.

    Asserted from one plan string, split on the ``== Initial Plan ==``
    marker: the final section must contain ``BroadcastHashJoin`` and
    the initial section ``SortMergeJoin`` — i.e. the switch HAPPENED
    at runtime, not at planning time.  The local-shuffle-reader then
    feeds the broadcast from already-written map output without the
    planned exchange.  Values are strategy-blind (same oracle SQL
    either way); revenue accumulates in DECIMAL(38,6) before the
    rounded-double projection, per the engine-wide hash-parity rule.
    """
    with conf_override(spark, BHJ_PROBE_CONF):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
        )
        urgent = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select(F.col("o_orderkey").alias("l_orderkey"))
        )
        out = li.join(urgent, "l_orderkey").groupBy("l_returnflag").agg(
            F.count("*").alias("n_rows"),
            F.sum(
                money(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("_rev"),
        ).select("l_returnflag", "n_rows", money_out("_rev").alias("revenue"))
        out.collect()  # materialize the final adaptive plan
        plan = _executed_plan(out)
        final, marker, initial = plan.partition("== Initial Plan ==")
        assert marker, "no initial-plan section — AQE not engaged"
        assert "SortMergeJoin" in initial, (
            "probe invalid: the INITIAL plan was not a sort-merge join"
        )
        assert "BroadcastHashJoin" in final, (
            "AQE did not switch the runtime-small dim join to "
            "broadcast:\n" + final[:2000]
        )
    return out


@query(
    "runtime_bloom_join_audit",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                      AS DOUBLE), 6) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#11'
    GROUP BY p_brand
    """,
)
def runtime_bloom_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst runtime Bloom-filter injection, proven from the
    optimized plan (M358).

    Native counterpart to this engine's hand-built ``bloom_semi_agg``
    (operators/layout.py): when a shuffle join's creation side carries
    a selective filter (``p_brand = 'Brand#11'`` keeps ~4% of parts),
    ``InjectRuntimeFilter`` plants a ``bloom_filter_agg`` subquery on
    the dim and a ``might_contain(xxhash64(l_partkey))`` predicate on
    the FACT side — so non-matching fact rows die at the scan, before
    the exchange.  At 100 TB that is the semi-join reduction that
    decides whether the join shuffles the whole fact table or the ~4%
    candidate set; false positives only ever cost IO because the exact
    join still runs on top, which is also why the oracle is the plain
    join SQL.

    Plan-freezing detail (review finding, r12 session 2): BOTH the
    optimized plan and the PHYSICAL plan are touched inside the conf
    override.  QueryExecution memoizes each stage lazily, and physical
    planning (JoinSelection) happens at whichever moment the physical
    plan is first accessed — asserting only the optimized plan would
    leave the caller's later collect to plan the join under the
    RESTORED 32 MiB broadcast threshold, executing a broadcast join
    that carries the injected filter redundantly.  With the physical
    plan frozen here, the executed strategy is the shuffle join the
    injection was licensed for (AQE may still locally re-optimize the
    frozen adaptive plan; the injected filter rides along either way
    and can only cost the K-sized dim subquery).  Spark 4.1 renders
    the pair as ``might_contain(scalar-subquery ...)`` over
    ``bloom_filter_agg`` — asserted in both plan stages.  Probe confs:
    broadcast disabled (the injection rule targets shuffle joins) and
    the application-side scan threshold floored to 1 byte so the
    injection condition is scale-tier-independent; a cluster keeps the
    10 GiB default.
    """
    with conf_override(spark, BLOOM_PROBE_CONF):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_quantity"
        )
        brand = (
            load_table(spark, sf_dir, "part")
            .filter(F.col("p_brand") == "Brand#11")
            .select("p_partkey", "p_brand")
        )
        out = (
            li.join(brand, li.l_partkey == brand.p_partkey)
            .groupBy("p_brand")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(money("l_quantity")).alias("_sq"),
            )
            .select("p_brand", "n_rows", money_out("_sq").alias("sum_qty"))
        )
        # force (and memoize) BOTH plan stages under the probe
        # thresholds — optimization for the injection, physical
        # planning for the shuffle-join strategy the caller executes
        oplan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in oplan and "bloom_filter_agg" in oplan, (
            "InjectRuntimeFilter did not plant a bloom filter on the "
            "fact side:\n" + oplan[:2000]
        )
        pplan = _executed_plan(out)
        assert "might_contain" in pplan, (
            "injected bloom filter missing from the physical plan:\n"
            + pplan[:2000]
        )
    return out
