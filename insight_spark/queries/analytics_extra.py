"""Product-analytics operators (funnel, retention, resample, upsert).

The query patterns an analytics engine serves daily over an events
stream: ordered-step funnels, cohort retention matrices, time-grid
gap filling with forward fill, and SCD-1 batch upsert.  All built-in
DataFrame ops — aggregates, windows, sequence+explode — with DuckDB
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insight_spark.queries import query
from insight_spark.sources import load_table


@query(
    "funnel_steps",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts >= s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS n_step1,
           (SELECT COUNT(*) FROM s2) AS n_step2,
           (SELECT COUNT(*) FROM s3) AS n_step3
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel: view → click (at/after first view) →
    purchase (at/after first qualifying click).

    Each step is one filtered min-ts aggregate joined to the previous
    step's frontier — N steps = N bounded aggregations on user_id, all
    sharing the same shuffle key, never a per-user sort of full
    histories.  Output is the funnel summary (users surviving each
    step).
    """
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_step1"))
        .crossJoin(s2.agg(F.count("*").alias("n_step2")))
        .crossJoin(s3.agg(F.count("*").alias("n_step3")))
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day,
                          date_trunc('day', e.ts)) AS INTEGER) AS day_offset,
           COUNT(DISTINCT e.user_id) AS n_active
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted distinct on each subsequent day offset.

    Two aggregates on user_id (cohort assignment, then the activity
    join) — the cohort table is |users| rows and broadcast-eligible at
    typical cohort cardinalities.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort_day")
    )
    return (
        ev.join(firsts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day"))
            .cast("int")
            .alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "gap_fill_hourly",
    oracle="""
    WITH hourly AS (
        SELECT user_id, h, value AS last_value FROM (
            SELECT user_id, date_trunc('hour', ts) AS h, value,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE user_id < 20 AND value IS NOT NULL
        ) WHERE rn = 1
    ),
    spans AS (
        SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY user_id
    ),
    grid AS (
        SELECT s.user_id, unnest(generate_series(s.h0, s.h1,
                                                 INTERVAL 1 HOUR)) AS h
        FROM spans s
    )
    SELECT g.user_id, g.h AS hour,
           ROUND(last_value(hy.last_value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS UNBOUNDED PRECEDING), 6) AS filled_value
    FROM grid g LEFT JOIN hourly hy
      ON g.user_id = hy.user_id AND g.h = hy.h
    """,
)
def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grid resample + forward fill (gap filling).

    Per user: snap events to an hourly grid (keeping the latest value
    in each hour via max_by on the (ts, event_id) total order), expand
    the [first, last] hour span with sequence+explode, left-join the
    observed hours, and forward-fill with last(ignorenulls).  Grid
    expansion is per-user-bounded (span hours, not |events|); the fill
    window shares the user_id shuffle with the grid join.  Restricted
    to user_id < 20 to keep the fixture output bounded — the operator
    itself has no such limit.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 20) & F.col("value").isNotNull()
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.max_by("value", F.struct("ts", "event_id")).alias("last_value")
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(hourly, ["user_id", "h"], "left").select(
        "user_id",
        F.col("h").alias("hour"),
        F.round(F.last("last_value", ignorenulls=True).over(w), 6).alias(
            "filled_value"
        ),
    )


@query(
    "merge_upsert_orders",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey,
               ROUND(CAST(o_totalprice AS DOUBLE) * 1.1, 6) AS o_totalprice,
               'U' AS o_orderstatus
        FROM orders WHERE o_orderkey % 10 = 0
    ),
    kept AS (
        SELECT o_orderkey, ROUND(CAST(o_totalprice AS DOUBLE), 6)
                   AS o_totalprice, o_orderstatus
        FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM updates u
                          WHERE u.o_orderkey = orders.o_orderkey)
    )
    SELECT * FROM kept UNION ALL SELECT * FROM updates
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch SCD-1 MERGE (upsert): rows present in the update batch
    replace target rows by key; everything else passes through.

    Spark-without-Delta form: target ⟕anti updates ∪ updates — one
    shuffle on the key (or zero if the update batch broadcasts, the
    common case: updates ≪ target).  The streaming sibling is
    ``foreach_batch_upsert`` (sources/sinks.py).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice").cast("double"), 6).alias("o_totalprice"),
        "o_orderstatus",
    )
    updates = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice").cast("double") * 1.1, 6).alias(
                "o_totalprice"
            ),
            F.lit("U").alias("o_orderstatus"),
        )
    )
    kept = orders.join(
        F.broadcast(updates.select("o_orderkey")), "o_orderkey", "left_anti"
    )
    return kept.unionByName(updates)


@query(
    "join_key_skew_profile",
    oracle="""
    WITH counts AS (
        SELECT o_custkey AS key, COUNT(*) AS cnt
        FROM orders GROUP BY o_custkey
    ),
    stats AS (
        SELECT SUM(cnt) AS total, COUNT(*) AS n_keys FROM counts
    )
    SELECT c.key, c.cnt,
           ROUND(CAST(c.cnt AS DOUBLE) / s.total, 6) AS share,
           ROUND(CAST(c.cnt AS DOUBLE) * s.n_keys / s.total, 6)
               AS skew_factor
    FROM counts c CROSS JOIN stats s
    ORDER BY c.cnt DESC, c.key ASC
    LIMIT 20
    """,
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter profile of a join key: top-20 keys with row share
    and skew factor (key count ÷ mean key count).

    The pre-flight diagnostic behind every salting/AQE-skew decision
    in this repo: a skew_factor ≫ 1 key is the one that stalls a
    shuffle join at 100 TB.  Shape: one map-side-combined groupBy on
    the key, a 1-row global stat broadcast back, TakeOrdered for the
    top-k — no full sort, no second wide shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    stats = counts.agg(
        F.sum("cnt").alias("_total"), F.count("*").alias("_n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("_total"), 6)
                .alias("share"),
            F.round(
                F.col("cnt").cast("double") * F.col("_n_keys")
                / F.col("_total"),
                6,
            ).alias("skew_factor"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(20)
    )


@query(
    "cms_heavy_hitters",
    oracle="""
    WITH c AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1)
    SELECT user_id, n_events, TRUE AS cms_lower_ok, TRUE AS cms_upper_ok
    FROM c ORDER BY n_events DESC, user_id LIMIT 10
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters (the frequency-sketch sibling of
    `hll_merge_distinct`): exact top-10 users plus the CM guarantee
    flags, stated as TRUE in the oracle so a sketch regression breaks
    the value hash (M15 bound-oracle contract).

    `cms_lower_ok` is the hard guarantee (estimate never undercounts);
    `cms_upper_ok` is the ε-bound (excess ≤ 10·N/width, failure odds
    ≤ 10⁻⁴ per key with depth 4 — and deterministic for fixed data and
    seeds).  At 100 TB the sketch stays ≤ depth·width cells through
    map-side combine, merges by cell-wise sum across corpus shards, and
    broadcasts for estimation — frequency queries without a key
    shuffle.
    """
    from insight_spark.operators.sketches import cms_build, cms_estimate

    depth, width = 4, 8192
    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id", depth, width)
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), "user_id")
        .limit(10)
    )
    total = ev.agg(F.count("*").alias("_n"))
    est = cms_estimate(top, sketch, "user_id", depth, width).crossJoin(
        F.broadcast(total)
    )
    margin = F.lit(10.0) * F.col("_n") / F.lit(width)
    return est.select(
        "user_id",
        "n_events",
        (F.col("cms_est") >= F.col("n_events")).alias("cms_lower_ok"),
        (F.col("cms_est") <= F.col("n_events") + margin).alias("cms_upper_ok"),
    ).orderBy(F.desc("n_events"), "user_id")
