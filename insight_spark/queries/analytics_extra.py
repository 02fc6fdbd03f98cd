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


@query(
    "markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    counts AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM counts
    ORDER BY prev_type, next_type
    """,
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    (sequence analytics — the user-journey summary behind next-event
    prediction and anomalous-flow detection).

    One shuffle on user_id for the lag, then a word-count-shaped
    aggregate on the (prev, next) pair — the per-row transition P is a
    window over the tiny |types|² matrix.  At 100 TB the lag pass
    dominates and is the same exchange sessionize already needs.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    counts = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return (
        counts.withColumn(
            "p", F.round(F.col("n").cast("double") / F.sum("n").over(wp), 6)
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(d.med, 6) AS median_value,
           ROUND(a.mad, 6) AS mad,
           COUNT(*) FILTER (WHERE d.adev > 3 * a.mad) AS n_outliers,
           COUNT(*) AS n
    FROM dev d JOIN mad a ON d.event_type = a.event_type
    GROUP BY d.event_type, d.med, a.mad
    ORDER BY d.event_type
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation (table
    quality / anomaly surface): per event_type, the median, the MAD,
    and how many values sit more than 3 MADs from the median.

    Two grouped exact-percentile aggregates over the same event_type
    shuffle; the per-group medians broadcast back (|types| rows).
    Robust stats are the data-quality gate that mean/stddev z-scores
    fail on heavy-tailed value columns.  Exact interpolated percentile
    parity (D11 discipline) makes the 3-MAD comparison deterministic
    cross-engine; only the final projection rounds.
    """
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count_if(F.col("adev") > 3 * F.col("mad")).alias("n_outliers"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
        .select(
            "event_type",
            F.round("med", 6).alias("median_value"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
            "n",
        )
    )


@query(
    "ewma_smooth",
    oracle="""
    WITH lags AS (
        SELECT user_id, event_id, ts, value,
               LAG(value, 1) OVER w AS l1,
               LAG(value, 2) OVER w AS l2,
               LAG(value, 3) OVER w AS l3,
               LAG(value, 4) OVER w AS l4
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           ROUND(
             (value
              + COALESCE(l1, 0) * 0.5
              + COALESCE(l2, 0) * 0.25
              + COALESCE(l3, 0) * 0.125
              + COALESCE(l4, 0) * 0.0625)
             /
             (1.0
              + (CASE WHEN l1 IS NULL THEN 0 ELSE 0.5 END)
              + (CASE WHEN l2 IS NULL THEN 0 ELSE 0.25 END)
              + (CASE WHEN l3 IS NULL THEN 0 ELSE 0.125 END)
              + (CASE WHEN l4 IS NULL THEN 0 ELSE 0.0625 END)),
             6) AS ewma5
    FROM lags
    """,
)
def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-window EWMA smoothing per user stream (time-series
    analytics): exponential weights 1, 1/2, ..., 1/16 over the last 5
    events, renormalized over the lags actually present at the
    sequence head.

    The infinite-history EWMA recurrence is inherently sequential; the
    5-term truncation (weight tail < 4%) re-expresses it as 4 LAGs
    over ONE window spec — a single user_id exchange, fully
    parallel, no recursion.  Weights are powers of two, so every
    product is exact in binary and the engines agree bit-for-bit
    before the final round.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = ev.select(
        "user_id",
        "event_id",
        "value",
        *[F.lag("value", i).over(w).alias(f"l{i}") for i in range(1, 5)],
    )
    weights = [0.5, 0.25, 0.125, 0.0625]
    num = F.col("value")
    den = F.lit(1.0)
    for i, wt in enumerate(weights, start=1):
        num = num + F.coalesce(F.col(f"l{i}"), F.lit(0.0)) * wt
        den = den + F.when(F.col(f"l{i}").isNull(), 0.0).otherwise(wt)
    return lags.select(
        "user_id", "event_id", F.round(num / den, 6).alias("ewma5")
    )


@query(
    "rollup_multires",
    oracle="""
    SELECT 'hour' AS resolution, date_trunc('hour', ts) AS bucket_start,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'day', date_trunc('day', ts), COUNT(*),
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'month', date_trunc('month', ts), COUNT(*),
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
    FROM events GROUP BY 2
    """,
)
def rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup (the hypertable continuous-aggregate
    pattern): hour / day / month aggregates where each coarser level
    re-aggregates the FINER level's partials instead of rescanning the
    fact table.

    This is the materialized-rollup maintenance shape at 100 TB: the
    raw scan happens once (hourly), day sums hour, month sums day —
    legal because counts and DECIMAL sums are exactly mergeable
    (doubles would drift re-aggregated in a different order; the
    oracle aggregates each level straight from raw, so parity PROVES
    the partial-reuse is lossless).  The hourly level is
    localCheckpoint'ed — without it Spark's three output branches each
    recompute the raw scan (verified: 3× events scans, no
    ReusedExchange), which is exactly the recompute a materialized
    continuous aggregate exists to avoid.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_start")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("_sum"),
    ).localCheckpoint()
    daily = hourly.groupBy(
        F.date_trunc("day", "bucket_start").alias("bucket_start")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("_sum").alias("_sum"),
    )
    monthly = daily.groupBy(
        F.date_trunc("month", "bucket_start").alias("bucket_start")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("_sum").alias("_sum"),
    )
    def _out(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.lit(tag).alias("resolution"),
            "bucket_start",
            "n_events",
            F.round(F.col("_sum").cast("double"), 6).alias("sum_value"),
        )
    return (
        _out(hourly, "hour")
        .unionAll(_out(daily, "day"))
        .unionAll(_out(monthly, "month"))
    )


@query(
    "histogram_quantile",
    oracle="""
    WITH stats AS (
        SELECT MIN(value) AS vmin, MAX(value) AS vmax, COUNT(*) AS n
        FROM events
    ),
    b AS (
        SELECT LEAST(CAST(FLOOR((value - vmin)
                   / NULLIF((vmax - vmin) / 256.0, 0)) AS BIGINT),
                     255) AS bucket,
               COUNT(*) AS c
        FROM events, stats
        GROUP BY 1
    ),
    cum AS (
        SELECT bucket, SUM(c) OVER (ORDER BY bucket) AS cum FROM b
    ),
    qs AS (SELECT CAST(unnest([0.25, 0.5, 0.9, 0.99]) AS DOUBLE) AS q)
    SELECT q,
           ROUND(vmin + (MIN(bucket) + 1) * ((vmax - vmin) / 256.0), 6) AS est
    FROM qs, cum, stats
    WHERE cum >= q * n
    GROUP BY q, vmin, vmax
    """,
)
def histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram quantile sketch (completes the
    sketch trio with HLL M26 and CMS M35): 256 fixed-width buckets,
    estimate = upper edge of the first bucket whose cumulative count
    crosses q·n.

    The 100 TB form: bucket counts are a map-side-combined aggregate
    (≤256 rows per partition), cells merge by cell-wise sum across
    shards/days exactly like the CMS, and the estimate is off by at
    most one bucket width.  Unlike approx_percentile's opaque internal
    state, the histogram IS a DataFrame — persistable, mergeable,
    SQL-reproducible, which is why the whole sketch value-oracles
    exactly rather than needing a bound check.
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count("*").alias("n"),
    )
    width = (F.col("vmax") - F.col("vmin")) / 256.0
    b = (
        ev.crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.floor((F.col("value") - F.col("vmin")) / F.nullif(width, F.lit(0.0))),
                F.lit(255),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )
    cum = b.select(
        "bucket",
        F.sum("c").over(Window.orderBy("bucket")).alias("cum"),
    )
    qs = F.array(*[F.lit(x) for x in (0.25, 0.5, 0.9, 0.99)])
    qdf = (
        stats.select("vmin", "vmax", "n", F.explode(qs).alias("q"))
    )
    return (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy("q", "vmin", "vmax")
        .agg(F.min("bucket").alias("_bk"))
        .select(
            "q",
            F.round(
                F.col("vmin")
                + (F.col("_bk") + 1) * ((F.col("vmax") - F.col("vmin")) / 256.0),
                6,
            ).alias("est"),
        )
    )


@query(
    "anomalous_hours",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour_start, COUNT(*) AS n
        FROM events GROUP BY 1
    ),
    stats AS (
        SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mu,
               stddev_samp(n) AS sigma
        FROM hourly
    )
    SELECT hour_start, n,
           ROUND((n - mu) / sigma, 6) AS z,
           (ABS((n - mu) / sigma) > 3) AS is_anomaly
    FROM hourly, stats
    """,
)
def anomalous_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection (ops-analytics surface): z-score every
    hour's event count against the global hourly mean/stddev, flag
    |z| > 3.

    Two tiny aggregates off one date_trunc rollup — the global stats
    are a 1-row broadcast back onto the |hours| rollup.  At 100 TB
    the rollup is the mergeable-partials shape (see M48) and the
    z-scoring cost is per-bucket, not per-event.  Integer counts make
    the mean exact (sum/count of longs), so the z values agree
    cross-engine before rounding.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count("*").alias("n"))
    stats = hourly.agg(
        (F.sum("n").cast("double") / F.count("*")).alias("mu"),
        F.stddev_samp("n").alias("sigma"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return hourly.crossJoin(F.broadcast(stats)).select(
        "hour_start",
        "n",
        F.round(z, 6).alias("z"),
        (F.abs(z) > 3).alias("is_anomaly"),
    )


@query(
    "ab_test_metrics",
    oracle="""
    WITH assigned AS (
        SELECT user_id,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                    THEN 'A' ELSE 'B' END AS variant
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    per_variant AS (
        SELECT variant,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS vsum,
               stddev_samp(value) AS sd
        FROM events e JOIN assigned a ON e.user_id = a.user_id
        GROUP BY variant
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN variant = 'A' THEN n END) AS n_a,
            MAX(CASE WHEN variant = 'A' THEN vsum END) AS sum_a,
            MAX(CASE WHEN variant = 'A' THEN sd END) AS sd_a,
            MAX(CASE WHEN variant = 'B' THEN n END) AS n_b,
            MAX(CASE WHEN variant = 'B' THEN vsum END) AS sum_b,
            MAX(CASE WHEN variant = 'B' THEN sd END) AS sd_b
        FROM per_variant
    )
    SELECT n_a, n_b,
           ROUND(sum_a / n_a, 6) AS mean_a,
           ROUND(sum_b / n_b, 6) AS mean_b,
           ROUND((sum_a / n_a - sum_b / n_b)
                 / sqrt(sd_a * sd_a / n_a + sd_b * sd_b / n_b), 6) AS z_stat
    FROM wide
    """,
)
def ab_test_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-metric A/B test readout (experimentation surface):
    deterministic ~50/50 variant assignment keyed on md5(user_id) (the
    train_test_split idiom — stable under re-runs and user-set growth),
    then the Welch z-statistic on mean event value between variants.

    (A conversion-proportion test is degenerate on this fixture —
    every user purchases — so the readout uses the continuous metric,
    which is also the harder parity case: exact-decimal sums for the
    means, D7 stddev parity for the variance term.)

    The assignment table is |users| rows and broadcasts onto the fact;
    the whole readout is one event_type-free scan + a 2-row pivot.
    All arithmetic is the identical formula on both engines, rounded
    only at the final projection.
    """
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    assigned = users.select(
        "user_id",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
        )
        .otherwise("B")
        .alias("variant"),
    )
    per_variant = (
        ev.join(F.broadcast(assigned), "user_id")
        .groupBy("variant")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("vsum"),
            F.stddev_samp("value").alias("sd"),
        )
    )
    wide = per_variant.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == "A", F.col("vsum"))).alias("sum_a"),
        F.max(F.when(F.col("variant") == "A", F.col("sd"))).alias("sd_a"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == "B", F.col("vsum"))).alias("sum_b"),
        F.max(F.when(F.col("variant") == "B", F.col("sd"))).alias("sd_b"),
    )
    ma = F.col("sum_a") / F.col("n_a")
    mb = F.col("sum_b") / F.col("n_b")
    se = F.sqrt(
        F.col("sd_a") * F.col("sd_a") / F.col("n_a")
        + F.col("sd_b") * F.col("sd_b") / F.col("n_b")
    )
    return wide.select(
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round((ma - mb) / se, 6).alias("z_stat"),
    )


@query(
    "event_kgrams",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type, 1) OVER w AS p1,
               LAG(event_type, 2) OVER w AS p2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p2 || '>' || p1 || '>' || event_type AS motif,
           COUNT(*) AS n
    FROM seq WHERE p2 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, motif
    LIMIT 20
    """,
)
def event_kgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top behavioral motifs (sequence mining): trigrams of consecutive
    event types per user stream, counted corpus-wide.

    The k-gram construction is two LAGs over ONE window spec — the
    same single user_id exchange as sessionize — then a word-count
    aggregate on the motif string.  At 100 TB the motif key space is
    |types|³ (tiny), so the count shuffle is map-side combined down to
    nearly nothing.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    return (
        seq.filter(F.col("p2").isNotNull())
        .select(
            F.concat_ws(">", "p2", "p1", "event_type").alias("motif")
        )
        .groupBy("motif")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "motif")
        .limit(20)
    )


@query(
    "weighted_percentile",
    oracle="""
    WITH w AS (
        SELECT l_returnflag, l_extendedprice AS v,
               SUM(l_quantity) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ) AS cumw,
               SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS totw
        FROM lineitem
    )
    SELECT l_returnflag,
           ROUND(MIN(CASE WHEN cumw >= 0.5 * totw THEN v END), 6) AS wp50,
           ROUND(MIN(CASE WHEN cumw >= 0.9 * totw THEN v END), 6) AS wp90
    FROM w
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted percentiles (quantity-weighted price distribution):
    the smallest value whose cumulative weight crosses q·total, per
    group — the estimator behind "the median dollar was spent at
    price X" questions that unweighted percentiles get wrong.

    One hash exchange on the group key serves both window passes
    (ordered cumulative + unordered total) and the final min-CASE
    aggregate.  The crossing rule on a value-ordered cumulative sum is
    deterministic under ties because the cumulative order carries a
    unique (orderkey, linenumber) tie-break.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # ROWS frame == DuckDB's default RANGE frame here: the ordering
    # carries a unique (orderkey, linenumber) tie-break, so every row
    # is its own peer group
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    d = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.sum("l_quantity").over(wc).alias("cumw"),
        F.sum("l_quantity").over(wt).alias("totw"),
    )
    return (
        d.groupBy("l_returnflag")
        .agg(
            F.round(
                F.min(F.when(F.col("cumw") >= 0.5 * F.col("totw"), F.col("v"))),
                6,
            ).alias("wp50"),
            F.round(
                F.min(F.when(F.col("cumw") >= 0.9 * F.col("totw"), F.col("v"))),
                6,
            ).alias("wp90"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "wow_revenue_delta",
    oracle="""
    WITH weekly AS (
        SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
               SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
        FROM orders
        GROUP BY 1
    )
    SELECT week_start,
           ROUND(CAST(rev AS DOUBLE), 6) AS revenue,
           ROUND(CAST(rev - LAG(rev) OVER (ORDER BY week_start) AS DOUBLE),
                 6) AS wow_delta,
           ROUND(CAST(rev - LAG(rev) OVER (ORDER BY week_start) AS DOUBLE)
                 / NULLIF(CAST(LAG(rev) OVER (ORDER BY week_start) AS DOUBLE),
                          0), 6) AS wow_pct
    FROM weekly
    """,
)
def wow_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue deltas (BI trend surface): weekly
    DECIMAL-exact revenue, absolute and relative change vs the prior
    week via LAG over the aggregated series.

    The fact scan reduces to |weeks| rows BEFORE the (single-
    partition) trend window — lag-over-aggregate, never lag-over-raw:
    at 100 TB the window input is a few hundred rows regardless of
    fact size, so the global ordering is free.  Deltas are computed on
    the exact decimals and only cast/rounded at projection.
    """
    orders = load_table(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.to_date(F.date_trunc("week", "o_orderdate")).alias("week_start")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev"))
    w = Window.orderBy("week_start")
    prev = F.lag("rev").over(w)
    return weekly.select(
        "week_start",
        F.round(F.col("rev").cast("double"), 6).alias("revenue"),
        F.round((F.col("rev") - prev).cast("double"), 6).alias("wow_delta"),
        F.round(
            (F.col("rev") - prev).cast("double")
            / F.nullif(prev.cast("double"), F.lit(0.0)),
            6,
        ).alias("wow_pct"),
    )


@query(
    "scd2_history",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS valid_to,
           LEAD(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) IS NULL AS is_current
    FROM orders
    WHERE o_custkey <= 100
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 interval construction (warehouse history tracking): each
    customer's ordered change records become [valid_from, valid_to)
    versions via LEAD, the open-ended latest row flagged current —
    the companion to merge_upsert_orders' SCD-1 overwrite.

    One window pass on the natural key: the interval closing needs no
    self-join (the naive formulation) because LEAD reads the next
    version inside the same sorted partition.  At 100 TB this is one
    key exchange over the changelog, and incremental maintenance only
    touches keys present in the new batch.  (Keyed to o_custkey <= 100
    to bound fixture output; the operator has no such limit.)
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") <= 100
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "ks_distribution_shift",
    oracle="""
    WITH a AS (
        SELECT value FROM events WHERE event_type = 'click'
    ),
    b AS (
        SELECT value FROM events WHERE event_type = 'view'
    ),
    grid AS (
        SELECT DISTINCT value AS v FROM (
            SELECT value FROM a UNION ALL SELECT value FROM b
        )
    ),
    cdfs AS (
        SELECT v,
               CAST((SELECT COUNT(*) FROM a WHERE a.value <= g.v) AS DOUBLE)
                   / (SELECT COUNT(*) FROM a) AS cdf_a,
               CAST((SELECT COUNT(*) FROM b WHERE b.value <= g.v) AS DOUBLE)
                   / (SELECT COUNT(*) FROM b) AS cdf_b
        FROM grid g
    )
    SELECT ROUND(MAX(ABS(cdf_a - cdf_b)), 6) AS ks_stat,
           (SELECT COUNT(*) FROM a) AS n_a,
           (SELECT COUNT(*) FROM b) AS n_b
    FROM cdfs
    """,
)
def ks_distribution_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the click and
    view value distributions (distribution-shift detection — the gate
    that catches a drifted data source before it trains): sup |CDF_a -
    CDF_b| over the pooled value grid.

    Spark-first: the correlated per-point CDF subqueries (the oracle's
    textbook form, O(n²) as written) become an exact TWO-PHASE
    distributed cumulative sum — no global single-partition sort
    anywhere in the plan:

    1. pre-aggregate the tagged sample to per-distinct-value counts
       (map-side-combined groupBy; ties collapse here, so no
       tie-break bookkeeping later);
    2. ``repartitionByRange(P, value)`` the distinct values — range
       boundaries come from Spark's deterministic reservoir sketch,
       so partition i holds strictly smaller values than i+1;
    3. a *partitioned* window per range-partition computes local
       running counts in parallel (P concurrent sorted scans of
       ~|V|/P values each);
    4. per-partition totals (= max of the local cumulative) roll up
       to prefix offsets over ≤P rows — bounded by construction, the
       one tiny driver-scale window — and broadcast-join back.

    local cumulative + prefix offset = exact global CDF at every
    grid point; the sup is a max aggregate.  At 100 TB the pooled
    sample never lands on one task: the only global structures are
    the P-row offset table and the 1-row totals, both broadcast.
    """
    n_parts = 32
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "view")).select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("is_b"),
    )
    totals = tagged.agg(
        F.sum("is_a").alias("n_a"), F.sum("is_b").alias("n_b")
    )
    # phase 0: collapse to per-distinct-value counts (shuffle 1, combined)
    per_v_counts = tagged.groupBy("value").agg(
        F.sum("is_a").alias("na_v"), F.sum("is_b").alias("nb_v")
    )
    # phase 1: range-partition the value grid; local cumulative per range
    ranged = per_v_counts.repartitionByRange(n_parts, "value").withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_local = ranged.select(
        "value",
        "pid",
        F.sum("na_v").over(w_local).alias("ca_l"),
        F.sum("nb_v").over(w_local).alias("cb_l"),
    )
    # phase 2: per-partition totals -> exclusive prefix offsets.
    # ≤ n_parts rows by construction — the unpartitioned window here
    # is driver-scale metadata, not data (guarded allowlist case).
    ptot = cum_local.groupBy("pid").agg(
        F.max("ca_l").alias("pa"), F.max("cb_l").alias("pb")
    )
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = ptot.select(
        "pid",
        F.coalesce(F.sum("pa").over(w_off), F.lit(0)).alias("oa"),
        F.coalesce(F.sum("pb").over(w_off), F.lit(0)).alias("ob"),
    )
    per_v = cum_local.join(F.broadcast(offsets), "pid").select(
        "value",
        (F.col("ca_l") + F.col("oa")).alias("ca"),
        (F.col("cb_l") + F.col("ob")).alias("cb"),
    )
    return (
        per_v.crossJoin(F.broadcast(totals))
        .select(
            F.abs(
                F.col("ca").cast("double") / F.col("n_a")
                - F.col("cb").cast("double") / F.col("n_b")
            ).alias("d"),
            "n_a",
            "n_b",
        )
        .groupBy("n_a", "n_b")
        .agg(F.round(F.max("d"), 6).alias("ks_stat"))
        .select("ks_stat", "n_a", "n_b")
    )


@query(
    "interp_fill_hourly",
    oracle="""
    WITH hourly AS (
        SELECT user_id, h, value AS v FROM (
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
    ),
    joined AS (
        SELECT g.user_id, g.h, hy.v,
               CASE WHEN hy.v IS NOT NULL THEN g.h END AS oh
        FROM grid g LEFT JOIN hourly hy
          ON g.user_id = hy.user_id AND g.h = hy.h
    ),
    ctx AS (
        SELECT user_id, h, v,
               last_value(v IGNORE NULLS) OVER w_prev AS pv,
               last_value(oh IGNORE NULLS) OVER w_prev AS ph,
               first_value(v IGNORE NULLS) OVER w_next AS nv,
               first_value(oh IGNORE NULLS) OVER w_next AS nh
        FROM joined
        WINDOW w_prev AS (PARTITION BY user_id ORDER BY h
                          ROWS UNBOUNDED PRECEDING),
               w_next AS (PARTITION BY user_id ORDER BY h
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, h AS hour,
           -- floor-based rounding: bit-identical on both engines
           -- (ROUND on doubles is HALF_UP in Spark, half-even here)
           floor((CASE
               WHEN v IS NOT NULL THEN v
               WHEN ph IS NOT NULL AND nh IS NOT NULL AND ph <> nh THEN
                   pv + (nv - pv) * (epoch(h) - epoch(ph))
                        / (epoch(nh) - epoch(ph))
               WHEN ph IS NOT NULL THEN pv
               ELSE nv
           END) * 1000000 + 0.5) / 1000000 AS filled_value
    FROM ctx
    """,
)
def interp_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grid resample + LINEAR interpolation — the twin of
    ``gap_fill_hourly`` for continuous signals (sensor values, rates)
    where forward-fill understates trends: each missing hour gets the
    time-weighted blend of the nearest observed values on either side;
    edges degrade to nearest-known.

    Same scale shape as the forward-fill form (per-user-bounded grid
    explode, one user_id shuffle shared by the join and all four
    context windows); the interpolation itself is pure column math in
    the same window pass, identical double formula on both engines.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 20) & F.col("value").isNotNull()
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.max_by("value", F.struct("ts", "event_id")).alias("v"))
    spans = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    joined = grid.join(hourly, ["user_id", "h"], "left").withColumn(
        "oh", F.when(F.col("v").isNotNull(), F.col("h"))
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ctx = joined.select(
        "user_id",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last("oh", ignorenulls=True).over(w_prev).alias("ph"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first("oh", ignorenulls=True).over(w_next).alias("nh"),
    )
    eh = lambda c: F.col(c).cast("double")  # noqa: E731 — epoch seconds
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("ph").isNotNull()
            & F.col("nh").isNotNull()
            & (F.col("ph") != F.col("nh")),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (eh("h") - eh("ph"))
            / (eh("nh") - eh("ph")),
        )
        .when(F.col("ph").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return ctx.select(
        "user_id",
        F.col("h").alias("hour"),
        (F.floor(interp * 1e6 + F.lit(0.5)) / 1e6).alias("filled_value"),
    )


@query(
    "seasonal_naive_error",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_start,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT cur.event_type, cur.hour_start,
           cur.n, prev.n AS f_naive,
           CAST(ABS(cur.n - prev.n) AS BIGINT) AS abs_err,
           ROUND(2.0 * ABS(cur.n - prev.n) / (cur.n + prev.n), 6)
               AS smape_term
    FROM hourly cur
    JOIN hourly prev
      ON prev.event_type = cur.event_type
     AND prev.hour_start + INTERVAL 24 HOUR = cur.hour_start
    """,
)
def seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each (type, hour)'s
    event count with the same hour one day earlier, and score every
    hour with absolute error and its sMAPE term — the standard
    sanity baseline every forecasting pipeline is graded against.

    The day-lag is an equi-join on (type, hour-24h), NOT a row-offset
    LAG: missing hours (gaps) must miss their forecast rather than
    silently borrow the previous *row*, and the join form stays correct
    under any gap pattern while shuffling on the same (type, hour) key
    the rollup just produced.  Counts are integers, so error terms are
    exact before the one ROUND; no float accumulates.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count("*").alias("n"))
    cur = hourly.select(
        "event_type", "hour_start", F.col("n")
    )
    prev = hourly.select(
        F.col("event_type").alias("p_type"),
        (F.col("hour_start") + F.expr("INTERVAL 24 HOURS")).alias(
            "p_hour"
        ),
        F.col("n").alias("f_naive"),
    )
    return (
        cur.join(
            prev,
            (F.col("p_type") == F.col("event_type"))
            & (F.col("p_hour") == F.col("hour_start")),
        )
        .select(
            "event_type",
            "hour_start",
            "n",
            "f_naive",
            F.abs(F.col("n") - F.col("f_naive"))
            .cast("long")
            .alias("abs_err"),
            F.round(
                2.0
                * F.abs(F.col("n") - F.col("f_naive"))
                / (F.col("n") + F.col("f_naive")),
                6,
            ).alias("smape_term"),
        )
    )


@query(
    "assoc_rules",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        FROM events
    ),
    n AS (SELECT COUNT(DISTINCT (user_id, day)) AS n_baskets FROM baskets),
    singles AS (
        SELECT event_type, COUNT(*) AS cnt FROM baskets GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS antecedent, b.event_type AS consequent,
               COUNT(*) AS n_ab
        FROM baskets a
        JOIN baskets b
          ON b.user_id = a.user_id AND b.day = a.day
         AND b.event_type <> a.event_type
        GROUP BY 1, 2
    )
    SELECT p.antecedent, p.consequent,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           ROUND(CAST(p.n_ab AS DOUBLE) / n.n_baskets, 6) AS support,
           ROUND(CAST(p.n_ab AS DOUBLE) / sa.cnt, 6) AS confidence,
           ROUND(CAST(p.n_ab AS DOUBLE) * n.n_baskets
                 / (CAST(sa.cnt AS DOUBLE) * sb.cnt), 6) AS lift
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.antecedent
    JOIN singles sb ON sb.event_type = p.consequent
    CROSS JOIN n
    """,
)
def assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over (user, day) baskets:
    support / confidence / lift for every ordered event-type pair —
    the recommendation-mining classic (a-priori's scoring step; with 5
    items the frequent-set enumeration is the pair join itself).

    Scale shape: baskets come from one DISTINCT (word-count shuffle on
    the basket key); the pair join is an equi-join on the basket key
    whose per-basket blowup is bounded by the item vocabulary (|types|²
    per basket, never corpus²); the singles table is vocabulary-sized
    and broadcasts.  All three metrics are exact integer ratios — one
    ROUND each, no float accumulation.
    """
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.select(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    ).distinct()
    n_tbl = (
        baskets.select("user_id", "day")
        .distinct()
        .agg(F.count("*").alias("n_baskets"))
    )
    singles = baskets.groupBy("event_type").agg(F.count("*").alias("cnt"))
    a = baskets.select(
        F.col("user_id").alias("u"),
        F.col("day").alias("d"),
        F.col("event_type").alias("antecedent"),
    )
    b = baskets.select(
        F.col("user_id").alias("u"),
        F.col("day").alias("d"),
        F.col("event_type").alias("consequent"),
    )
    pairs = (
        a.join(b, ["u", "d"])
        .filter(F.col("consequent") != F.col("antecedent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").alias("n_ab"))
    )
    sa = singles.select(
        F.col("event_type").alias("antecedent"), F.col("cnt").alias("cnt_a")
    )
    sb = singles.select(
        F.col("event_type").alias("consequent"), F.col("cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sb), "consequent")
        .crossJoin(F.broadcast(n_tbl))
        .select(
            "antecedent",
            "consequent",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(
                F.col("n_ab").cast("double") / F.col("n_baskets"), 6
            ).alias("support"),
            F.round(
                F.col("n_ab").cast("double") / F.col("cnt_a"), 6
            ).alias("confidence"),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n_baskets")
                / (F.col("cnt_a").cast("double") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "point_in_time_join",
    oracle="""
    WITH dim AS (
        SELECT user_id, value AS feat,
               ts AS valid_from,
               LEAD(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS valid_to
        FROM events WHERE event_type = 'purchase'
    ),
    facts AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'click'
    )
    SELECT f.event_id, f.user_id,
           d.feat AS feat_at_click,
           d.valid_from AS feat_version
    FROM facts f
    LEFT JOIN dim d
      ON d.user_id = f.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature join — the feature-store correctness op:
    each click is enriched with the purchase-value feature that was
    CURRENT at click time (never a later one — the temporal-leakage
    bug this op exists to prevent).  The dimension is the SCD-2
    interval table built in-plan by one LEAD window (the
    ``scd2_history`` shape); each fact matches exactly one version or
    none (clicks before the user's first purchase keep a NULL
    feature).

    Plan shape, distinct from the as-of union+window trick (C9) and
    the keyless range join (C8): a hash EQUI-join on user_id with the
    validity range riding as a join filter — per-user version counts
    are small, so the filter prunes a bounded candidate list per
    probe, and both sides shuffle on the same user key the window just
    used (one exchange reused).  At 100 TB this is the standard
    "training-set assembly against a versioned feature table" join.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("value").alias("feat"), "ts", "event_id")
        .select(
            F.col("user_id").alias("d_user"),
            "feat",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w.partitionBy("user_id")).alias("valid_to"),
        )
    )
    facts = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    cond = (
        (F.col("d_user") == F.col("user_id"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
    )
    return facts.join(dim, cond, "left").select(
        "event_id",
        "user_id",
        F.col("feat").alias("feat_at_click"),
        F.col("valid_from").alias("feat_version"),
    )


@query(
    "attribution_linear_touch",
    oracle="""
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts,
               CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_micro
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS cid, user_id, ts AS cts
        FROM events WHERE event_type = 'click'
    ),
    touches AS (
        SELECT p.pid, p.v_micro, c.cid, c.cts,
               COUNT(*) OVER (PARTITION BY p.pid) AS n_touch,
               ROW_NUMBER() OVER (
                   PARTITION BY p.pid ORDER BY c.cts, c.cid) AS rn
        FROM p JOIN c ON p.user_id = c.user_id
                     AND c.cts <= p.pts
                     AND c.cts > p.pts - INTERVAL 72 HOURS
    ),
    alloc AS (
        SELECT cid, cts,
               v_micro // n_touch
                 + CASE WHEN rn <= v_micro % n_touch THEN 1 ELSE 0 END
                 AS a_micro
        FROM touches
    )
    SELECT CAST(EXTRACT(hour FROM cts) AS INTEGER) AS click_hour,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(CAST(SUM(CAST(a_micro AS DECIMAL(38,0))) AS DOUBLE)
                 / 1000000.0, 6) AS attributed_revenue
    FROM alloc
    GROUP BY 1
    """,
)
def attribution_linear_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (M89): each purchase's value is
    split evenly across every click the user made in the 72 hours
    before it, then attributed revenue rolls up by click hour-of-day
    (the marketing-analytics complement of the as-of last-touch join).

    Exact arithmetic where naive value/n would float-drift: the value
    is quantized to integer micro-units and split by the
    largest-remainder rule — every touch gets v DIV n, the first
    (v MOD n) touches by (ts, click_id) get one extra micro — so the
    allocation is all-integer, conserves the purchase total exactly,
    and both engines reproduce it bit-for-bit; the only float appears
    in the final fixed-formula projection.

    Plan: hash equi-join on user_id with the 72 h band as a join
    filter (bounded per-user candidates), then one window exchange on
    purchase id for the fan-out normalization, then the hour rollup —
    three bounded-key shuffles, no UDFs.  At 100 TB the band filter is
    what keeps the per-user candidate list small regardless of history
    length.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("v_micro"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts")
    )
    touches = p.join(
        c,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") > F.col("pts") - F.expr("INTERVAL 72 HOURS")),
    )
    w = Window.partitionBy("pid")
    touches = touches.select(
        "pid",
        "v_micro",
        "cid",
        "cts",
        F.count("*").over(w).alias("n_touch"),
        F.row_number().over(w.orderBy("cts", "cid")).alias("rn"),
    )
    alloc = touches.select(
        "cid",
        "cts",
        (
            F.expr("v_micro DIV n_touch")
            + F.when(
                F.col("rn") <= F.expr("v_micro % n_touch"), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("a_micro"),
    )
    return alloc.groupBy(F.hour("cts").alias("click_hour")).agg(
        F.count("*").cast("long").alias("n_touches"),
        F.round(
            F.sum(F.col("a_micro").cast("decimal(38,0)")).cast("double")
            / 1000000.0,
            6,
        ).alias("attributed_revenue"),
    )


@query(
    "psi_drift",
    oracle="""
    WITH bounds AS (
        SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS t_mid
        FROM events
    ),
    binned AS (
        SELECT event_type,
               CASE WHEN epoch_us(ts) >= t_mid THEN 1 ELSE 0 END AS cur,
               LEAST(CAST(floor(value / 50.0) AS BIGINT), 9) AS bin
        FROM events CROSS JOIN bounds
    ),
    grid AS (
        SELECT DISTINCT event_type, b.bin
        FROM binned CROSS JOIN (SELECT unnest(range(10)) AS bin) b
    ),
    counts AS (
        SELECT g.event_type, g.bin,
               COALESCE(SUM(CASE WHEN cur = 0 THEN 1 ELSE 0 END), 0) AS ref_n,
               COALESCE(SUM(CASE WHEN cur = 1 THEN 1 ELSE 0 END), 0) AS cur_n
        FROM grid g
        LEFT JOIN binned x ON x.event_type = g.event_type AND x.bin = g.bin
        GROUP BY g.event_type, g.bin
    ),
    tot AS (
        SELECT event_type,
               SUM(ref_n) AS ref_t, SUM(cur_n) AS cur_t
        FROM counts GROUP BY event_type
    ),
    terms AS (
        SELECT c.event_type,
               CAST(floor(
                   ((CAST(cur_n + 1 AS DOUBLE) / (cur_t + 10))
                    - (CAST(ref_n + 1 AS DOUBLE) / (ref_t + 10)))
                   * ln((CAST(cur_n + 1 AS DOUBLE) / (cur_t + 10))
                        / (CAST(ref_n + 1 AS DOUBLE) / (ref_t + 10)))
                   * 1000000000 + 0.5) AS BIGINT) AS term_nano
        FROM counts c JOIN tot USING (event_type)
    )
    SELECT event_type,
           ROUND(CAST(SUM(term_nano) AS DOUBLE) / 1000000000.0, 6) AS psi
    FROM terms
    GROUP BY event_type
    """,
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index per event type (M92) — the standard
    feature-drift monitor an ML serving pipeline runs between a
    reference window and the current one (PSI < 0.1 stable, > 0.25
    drifted); the binned-proportions complement of the KS statistic
    (M66).

    Value binned into 10 fixed-width buckets (width 50, top-clamped);
    reference = first half of the time range, current = second
    (integer-microsecond midpoint — no float epoch).  Laplace-smoothed
    proportions (+1 per bin) keep empty bins finite, and every bin of
    the 10-bin grid participates on both sides via the grid outer
    join.  Exactness: counts are integers, each bin's PSI term is one
    fixed float expression quantized to nano-units BEFORE the per-type
    sum (sum order cannot move the result), one final rounded double.

    Scale: two passes — a 1-row time-bounds broadcast, then one hash
    aggregate on (type, bin) whose output is |types|·10 rows; the term
    math runs on that bounded table.  At 100 TB the scan dominates and
    everything after the first aggregate is metadata-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2)
        .cast("long")
        .alias("t_mid")
    )
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(F.unix_micros("ts") >= F.col("t_mid"), 1)
        .otherwise(0)
        .alias("cur"),
        F.least(F.floor(F.col("value") / 50.0).cast("long"), F.lit(9)).alias(
            "bin"
        ),
    )
    grid = (
        binned.select("event_type")
        .distinct()
        .crossJoin(spark.range(10).select(F.col("id").alias("bin")))
    )
    counts = (
        grid.join(binned, ["event_type", "bin"], "left")
        .groupBy("event_type", "bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("cur") == 0, 1).otherwise(0)), F.lit(0)
            ).alias("ref_n"),
            F.coalesce(
                F.sum(F.when(F.col("cur") == 1, 1).otherwise(0)), F.lit(0)
            ).alias("cur_n"),
        )
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("ref_n").alias("ref_t"), F.sum("cur_n").alias("cur_t")
    )
    p_cur = (F.col("cur_n") + 1).cast("double") / (F.col("cur_t") + 10)
    p_ref = (F.col("ref_n") + 1).cast("double") / (F.col("ref_t") + 10)
    term_nano = F.floor(
        (p_cur - p_ref) * F.log(p_cur / p_ref) * 1000000000 + F.lit(0.5)
    ).cast("long")
    return (
        counts.join(tot, "event_type")
        .select("event_type", term_nano.alias("term_nano"))
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum("term_nano").cast("double") / 1000000000.0, 6
            ).alias("psi")
        )
    )


@query(
    "cdc_apply_log",
    oracle="""
    WITH oplog AS (
        SELECT o_custkey AS key,
               o_orderkey AS seq,
               CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                         IN ('0', '1') THEN 'D' ELSE 'U' END AS op,
               CAST(o_totalprice AS DECIMAL(38,6)) AS payload
        FROM orders
    ),
    latest AS (
        SELECT key, op, payload,
               ROW_NUMBER() OVER (
                   PARTITION BY key ORDER BY seq DESC) AS rn
        FROM oplog
    )
    SELECT key,
           ROUND(CAST(payload AS DOUBLE), 6) AS current_value
    FROM latest
    WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction (M93): materialize the CURRENT state of a
    keyed table from an insert/update/delete change log — keep each
    key's highest-sequence operation, and a trailing delete tombstone
    removes the key entirely.  The third member of the mutation
    family: merge_upsert is SCD-1 (two-table merge), scd2_history
    keeps every version, this is the log-compaction semantics a
    Kafka-compacted-topic / Debezium consumer applies.

    The op log is synthesized deterministically from orders (seq =
    orderkey; ~1/8 of ops are tombstones via an md5 range on the seq),
    so both engines replay the identical log.  One window exchange on
    the key — the same single-shuffle shape as keyed dedup; at 100 TB
    this runs per ingest batch over the (batch ∪ snapshot) union with
    the snapshot pre-partitioned on key, so only the batch shuffles.
    """
    orders = load_table(spark, sf_dir, "orders")
    oplog = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin(
                "0", "1"
            ),
            "D",
        )
        .otherwise("U")
        .alias("op"),
        F.col("o_totalprice").cast("decimal(38,6)").alias("payload"),
    )
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    return (
        oplog.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "key",
            F.round(F.col("payload").cast("double"), 6).alias(
                "current_value"
            ),
        )
    )


@query(
    "rfm_segmentation",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               datediff('day', DATE '1990-01-01', MAX(o_orderdate)) AS r,
               COUNT(*) AS f,
               SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS m_dec,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS m
        FROM orders GROUP BY o_custkey
    ),
    b AS (
        SELECT ROUND(quantile_cont(r, 0.2), 6) AS r1,
               ROUND(quantile_cont(r, 0.4), 6) AS r2,
               ROUND(quantile_cont(r, 0.6), 6) AS r3,
               ROUND(quantile_cont(r, 0.8), 6) AS r4,
               ROUND(quantile_cont(f, 0.2), 6) AS f1,
               ROUND(quantile_cont(f, 0.4), 6) AS f2,
               ROUND(quantile_cont(f, 0.6), 6) AS f3,
               ROUND(quantile_cont(f, 0.8), 6) AS f4,
               ROUND(quantile_cont(m, 0.2), 6) AS m1,
               ROUND(quantile_cont(m, 0.4), 6) AS m2,
               ROUND(quantile_cont(m, 0.6), 6) AS m3,
               ROUND(quantile_cont(m, 0.8), 6) AS m4
        FROM cust
    ),
    scored AS (
        SELECT o_custkey, m_dec,
               1 + CAST(r > r1 AS INT) + CAST(r > r2 AS INT)
                 + CAST(r > r3 AS INT) + CAST(r > r4 AS INT) AS rs,
               1 + CAST(f > f1 AS INT) + CAST(f > f2 AS INT)
                 + CAST(f > f3 AS INT) + CAST(f > f4 AS INT) AS fs,
               1 + CAST(m > m1 AS INT) + CAST(m > m2 AS INT)
                 + CAST(m > m3 AS INT) + CAST(m > m4 AS INT) AS ms
        FROM cust, b
    )
    SELECT CAST(rs AS VARCHAR) || CAST(fs AS VARCHAR) || CAST(ms AS VARCHAR)
               AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(m_dec) AS DOUBLE) / COUNT(*) AS avg_monetary
    FROM scored GROUP BY 1
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (M140): recency (days to last order),
    frequency (order count), monetary (exact-decimal lifetime spend),
    each scored 1-5 against its own exact interpolated quintile
    boundaries — the classic CRM segmentation grid ("555" = best),
    per-segment sizes and average spend.

    Quintile boundaries come from ONE global percentile aggregate
    (Spark ``percentile`` == DuckDB ``quantile_cont``, the shared
    linear-interpolation definition, rounded to 6 dp on both sides so
    boundary bit-drift cannot flip a comparison — metric gaps are
    >= 0.01, far above 1e-6) broadcast back as a single row — no
    per-customer window, no global sort: scoring is a map-side
    projection.  avg_monetary stays an UNROUNDED bit-equal division
    of the exact-decimal sum (the r7 terminal-ROUND lesson); monetary
    sums are DECIMAL(38,6) end to end — the per-segment
    sum runs in DECIMAL (order-independent) and casts to double ONCE,
    because a per-segment SUM of doubles accumulates in partition
    order and is not bit-reproducible (caught by the oracle on the
    first draft).
    """
    orders = load_table(spark, sf_dir, "orders")
    # |customers|-sized aggregate feeding the percentile pass AND the
    # scoring pass — checkpoint once instead of scanning orders twice
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(
                F.datediff(
                    F.col("o_orderdate"), F.lit("1990-01-01").cast("date")
                )
            ).alias("r"),
            F.count("*").alias("f"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("m_dec"),
        )
        .withColumn("m", F.col("m_dec").cast("double"))
        .localCheckpoint()
    )
    bounds = cust.agg(
        *[
            F.round(F.percentile(c, F.lit(p)), 6).alias(f"{c}{i + 1}")
            for c in ("r", "f", "m")
            for i, p in enumerate((0.2, 0.4, 0.6, 0.8))
        ]
    )

    def score(c: str):
        s = F.lit(1)
        for i in range(1, 5):
            s = s + (F.col(c) > F.col(f"{c}{i}")).cast("int")
        return s

    scored = cust.crossJoin(F.broadcast(bounds)).select(
        "m_dec",
        score("r").alias("rs"),
        score("f").alias("fs"),
        score("m").alias("ms"),
    )
    return (
        scored.groupBy(
            F.concat_ws(
                "", F.col("rs"), F.col("fs"), F.col("ms")
            ).alias("segment")
        )
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum("m_dec").cast("double") / F.count("*")).alias(
                "avg_monetary"
            ),
        )
    )


@query(
    "calibration_reliability_bins",
    oracle="""
    WITH scored AS (
        SELECT CAST(event_type = 'purchase' AS INT) AS y,
               1.0 / (1.0 + exp(-(value - 50.0) / 25.0)) AS p
        FROM events
    ),
    binned AS (
        SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin, y,
               CAST(floor(p * 1000000 + 0.5) AS BIGINT) AS p_micro
        FROM scored
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(p_micro) AS DOUBLE) / 1000000.0 / COUNT(*)
               AS mean_pred,
           CAST(SUM(y) AS DOUBLE) / COUNT(*) AS frac_pos
    FROM binned GROUP BY bin
    """,
)
def calibration_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier calibration / reliability diagram (M142): bucket a
    model's predicted probabilities into 10 bins and compare each
    bin's mean prediction to its observed positive rate — the ML-eval
    table behind every calibration plot and Platt/isotonic refit
    decision.  Score = a fixed sigmoid of the event value (a stand-in
    model; swap in any scored column), label = purchase events.

    Float discipline: bin assignment floors p·10 (identical double on
    both engines — same sigmoid expression, and exp's argument
    (value-50)/25 is the same double so exp agrees bitwise in
    practice; the HASHED aggregates never touch exp's low bits:
    per-row p is half-up-quantized to exact 1e-6 micro-units BEFORE
    summation, and both output means are single bit-equal integer
    divisions, unrounded).  Scale: map-side projection + one
    10-key-bounded aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    p = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.col("value") - F.lit(50.0)) / F.lit(25.0))
    )
    y = (F.col("event_type") == "purchase").cast("int")
    scored = ev.select(
        y.alias("y"),
        F.least(F.floor(p * 10).cast("int"), F.lit(9)).alias("bin"),
        F.floor(p * 1000000 + F.lit(0.5)).cast("long").alias("p_micro"),
    )
    return scored.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        (
            F.sum("p_micro").cast("double") / F.lit(1000000.0) / F.count("*")
        ).alias("mean_pred"),
        (F.sum("y").cast("double") / F.count("*")).alias("frac_pos"),
    )


@query(
    "benford_first_digit_audit",
    oracle="""
    WITH cents AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        FROM orders
        WHERE o_totalprice > 0
    ),
    digits AS (
        SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit
        FROM cents WHERE v > 0
    ),
    counted AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
        FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counted),
    expected AS (
        SELECT digit, n,
               CASE digit
                   WHEN 1 THEN 301030 WHEN 2 THEN 176091
                   WHEN 3 THEN 124939 WHEN 4 THEN 96910
                   WHEN 5 THEN 79181 WHEN 6 THEN 66947
                   WHEN 7 THEN 57992 WHEN 8 THEN 51153
                   ELSE 45757
               END AS expected_micro,
               total
        FROM counted, tot
    )
    SELECT digit, n, expected_micro,
           CAST(n AS DOUBLE) / total AS observed_frac,
           CAST(floor(
               1e9 * CAST((n * 1000000 - total * expected_micro)
                          AS DOUBLE)
                   * (n * 1000000 - total * expected_micro)
                   / (CAST(total AS DOUBLE) * expected_micro * 1000000)
               + 0.5) AS BIGINT) AS chi2_term_nano
    FROM expected
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit (M175): distribution of the first
    significant digit of order totals vs Benford's law — the classic
    fraud / synthetic-data / unit-mixup detector run as a DQ gate over
    any monetary or count column (a corpus whose first digits are
    uniform was generated, truncated, or re-scaled somewhere).  Emits
    per-digit observed counts, fractions, the expected Benford
    probability, and a chi-square contribution per digit; the caller
    sums chi2_term_nano for the test statistic.

    Exactness: the first digit is extracted from the exact BIGINT cents
    string (no float log10 — powers of ten are a branch hazard there);
    the expected table is pre-quantized micro-probabilities that sum to
    exactly 1_000_000; each chi-square term's numerator (O·1e6 − N·p)
    is exact BIGINT arithmetic, and the single double square/divide is
    nano-quantized per digit (the `psi_drift` discipline) so the rows
    hash bit-equal cross-engine.

    Scale: map-only digit projection, a 9-key map-side-combined
    aggregate, and a 9-row window for the total — nothing after the
    scan touches data-sized state.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = orders.where(F.col("o_totalprice") > 0).select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v")
    )
    digits = cents.where(F.col("v") > 0).select(
        F.substring(F.col("v").cast("string"), 1, 1).cast("int").alias("digit")
    )
    counted = digits.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    #: round(log10(1 + 1/d) * 1e6) for d = 1..9; sums to exactly 1e6.
    benford_micro = F.array(
        *[
            F.lit(v)
            for v in (
                301030, 176091, 124939, 96910, 79181,
                66947, 57992, 51153, 45757,
            )
        ]
    )
    tot = counted.agg(F.sum("n").cast("long").alias("total"))
    expected = counted.crossJoin(tot).select(
        "digit",
        "n",
        F.element_at(benford_micro, F.col("digit")).alias("expected_micro"),
        "total",
    )
    num = F.col("n") * F.lit(1000000) - F.col("total") * F.col(
        "expected_micro"
    )
    return expected.select(
        "digit",
        "n",
        "expected_micro",
        (F.col("n").cast("double") / F.col("total")).alias("observed_frac"),
        F.floor(
            F.lit(1e9)
            * num.cast("double")
            * num
            / (
                F.col("total").cast("double")
                * F.col("expected_micro")
                * F.lit(1000000)
            )
            + F.lit(0.5)
        )
        .cast("long")
        .alias("chi2_term_nano"),
    )


@query(
    "annotator_agreement_kappa",
    oracle="""
    WITH rated AS (
        SELECT label AS a,
               CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)
                         IN ('0', '1', '2')
                    THEN (label + 1) % 10 ELSE label END AS b
        FROM embeddings
    ),
    conf AS (SELECT a, b, COUNT(*) AS n FROM rated GROUP BY a, b),
    rows_m AS (SELECT a AS cls, SUM(n) AS row_n FROM conf GROUP BY a),
    cols_m AS (SELECT b AS cls, SUM(n) AS col_n FROM conf GROUP BY b),
    s AS (
        SELECT CAST(SUM(COALESCE(row_n, 0) * COALESCE(col_n, 0))
                    AS BIGINT) AS chance_sum
        FROM rows_m FULL JOIN cols_m USING (cls)
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_items,
               CAST(SUM(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT)
                   AS n_agree
        FROM conf
    )
    SELECT n_items, n_agree, chance_sum,
           CAST(n_agree AS DOUBLE) / n_items AS po,
           CAST(chance_sum AS DOUBLE) / (n_items * n_items) AS pe,
           CAST(n_items * n_agree - chance_sum AS DOUBLE)
               / (n_items * n_items - chance_sum) AS kappa
    FROM tot, s
    """,
)
def annotator_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement via Cohen's kappa (M160) — the label-QA
    gate run before trusting a labeled dataset (or an LLM-as-judge
    pass): observed agreement corrected for chance agreement over the
    two raters' confusion matrix.  Rater A is the stored label; rater B
    is a deterministic md5-keyed perturbation (~19% of items shifted one
    class) standing in for the second annotator column a real dataset
    carries — swap in the real column and everything downstream is
    unchanged.

    Exactness: kappa is computed in INTEGER form —
    kappa = (N·agree − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k) —
    so po, pe, and kappa are each ONE IEEE division of exact BIGINTs
    (bit-equal cross-engine; no intermediate float arithmetic, no
    terminal ROUND).

    Scale: the confusion matrix is a |classes|²-keyed aggregate (one
    map-side-combined shuffle over the ratings), marginals and the
    chance sum are |classes|-sized joins, and the result is one row.
    Nothing after the first aggregate touches data-sized state.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    flip = F.substring(
        F.md5(F.col("vec_id").cast("string")), 1, 1
    ).isin("0", "1", "2")
    rated = emb.select(
        F.col("label").alias("a"),
        F.when(flip, (F.col("label") + 1) % 10)
        .otherwise(F.col("label"))
        .alias("b"),
    )
    conf = rated.groupBy("a", "b").agg(F.count("*").alias("n"))
    rows_m = conf.groupBy(F.col("a").alias("cls")).agg(
        F.sum("n").alias("row_n")
    )
    cols_m = conf.groupBy(F.col("b").alias("cls")).agg(
        F.sum("n").alias("col_n")
    )
    s = (
        rows_m.join(cols_m, "cls", "full")
        .select(
            (
                F.coalesce("row_n", F.lit(0))
                * F.coalesce("col_n", F.lit(0))
            ).alias("prod")
        )
        .agg(F.sum("prod").alias("chance_sum"))
    )
    tot = conf.agg(
        F.sum("n").alias("n_items"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n")).otherwise(0))
        .alias("n_agree"),
    )
    n, d, c = F.col("n_items"), F.col("n_agree"), F.col("chance_sum")
    return tot.crossJoin(s).select(
        "n_items",
        "n_agree",
        "chance_sum",
        (d.cast("double") / n).alias("po"),
        (c.cast("double") / (n * n)).alias("pe"),
        ((n * d - c).cast("double") / (n * n - c)).alias("kappa"),
    )


@query(
    "acf_hourly_lags",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY date_trunc('hour', ts)
    ),
    idx AS (
        SELECT x, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS i
        FROM hourly
    ),
    lags AS (SELECT unnest([1, 2, 3, 4, 5, 6]) AS k),
    pairs AS (
        SELECT l.k, a.x AS xt, b.x AS xl
        FROM idx a
        JOIN lags l ON a.i > l.k
        JOIN idx b ON b.i = a.i - l.k
    ),
    moments AS (
        SELECT k,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(xt) AS BIGINT) AS sx,
               CAST(SUM(xl) AS BIGINT) AS sy,
               CAST(SUM(xt * xt) AS BIGINT) AS sxx,
               CAST(SUM(xl * xl) AS BIGINT) AS syy,
               CAST(SUM(xt * xl) AS BIGINT) AS sxy
        FROM pairs GROUP BY k
    )
    SELECT CAST(k AS INT) AS lag, n AS n_pairs,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE)) AS acf
    FROM moments
    """,
)
def acf_hourly_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the hourly event series (M177) at
    row-lags 1..6 — the seasonality/burstiness diagnostic read before
    picking a forecast window or an anomaly baseline (a strong lag-24
    ACF says "daily cycle", a flat one says the series is noise).
    Pearson form over (x_t, x_{t-k}) pairs; on a dense series row-lag
    equals time-lag (run `gap_fill_hourly` first when the grid has
    holes).

    Exactness: all six moment sums are exact BIGINTs over the bounded
    hourly series; each ACF value is the cross-multiplied integer
    Pearson numerator over one IEEE sqrt of a product of exact-integer
    factors — same expression both engines, bit-equal (sqrt is
    correctly rounded by IEEE 754, unlike libm log/exp which stay
    banned from hashed paths).

    Scale: the per-hour pre-aggregate is the only data-sized shuffle
    (map-side combined); everything after runs on |hours| rows — the
    row_number window and the 6-lag self-join are post-aggregate
    (documented BOUNDED_GLOBAL_WINDOW_OK exemption, the
    `wow_revenue_delta` pattern).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").cast("long").alias("x")
    )
    w = Window.orderBy("h")
    idx = hourly.select(
        "x", F.row_number().over(w).cast("long").alias("i")
    )
    lags = spark.createDataFrame([(k,) for k in range(1, 7)], "k long")
    a = idx.alias("a")
    b = idx.select(
        F.col("x").alias("xl"), F.col("i").alias("ib")
    ).alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .where(F.col("a.i") > F.col("k"))
        .join(b, F.col("b.ib") == F.col("a.i") - F.col("k"))
        .select("k", F.col("a.x").alias("xt"), "xl")
    )
    m = pairs.groupBy("k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xt").cast("long").alias("sx"),
        F.sum("xl").cast("long").alias("sy"),
        F.sum(F.col("xt") * F.col("xt")).cast("long").alias("sxx"),
        F.sum(F.col("xl") * F.col("xl")).cast("long").alias("syy"),
        F.sum(F.col("xt") * F.col("xl")).cast("long").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n * F.col("sxy") - sx * sy
    d1 = n * F.col("sxx") - sx * sx
    d2 = n * F.col("syy") - sy * sy
    return m.select(
        F.col("k").cast("int").alias("lag"),
        n.alias("n_pairs"),
        (
            num.cast("double")
            / F.sqrt(d1.cast("double") * d2.cast("double"))
        ).alias("acf"),
    )


@query(
    "cusum_changepoint",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY date_trunc('hour', ts)
    ),
    stats AS (
        SELECT CAST(SUM(x) AS BIGINT) AS sx,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM hourly
    ),
    dev AS (SELECT h, x, n * x - sx AS d, n FROM hourly, stats),
    pre AS (
        SELECT h, x, n,
               SUM(d) OVER (ORDER BY h
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS p
        FROM dev
    ),
    cus AS (
        SELECT h, x, n,
               p - least(CAST(0 AS BIGINT),
                         MIN(p) OVER (ORDER BY h
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)) AS cus_scaled
        FROM pre
    )
    SELECT h AS hour, x AS n_events,
           CAST(cus_scaled AS BIGINT) AS cusum_scaled,
           CAST(cus_scaled AS DOUBLE) / n AS cusum
    FROM cus
    ORDER BY cus_scaled DESC, hour
    LIMIT 5
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection over the hourly event series
    (M178): the sequential change-point statistic
    S_t = max(0, S_{t-1} + (x_t − mean)) — where the drift sustained
    above the series mean accumulates — reported for the top-5 hours.
    The monitoring primitive behind "traffic stepped up around 3pm":
    a spike decays immediately, a level shift keeps growing.

    The recurrence is inherently sequential, but it has the exact
    closed form S_t = P_t − min(0, min_{j≤t} P_j) over the deviation
    prefix sums P — two stacked running windows, no recursion (the
    same prefix−running-min identity both engines evaluate).

    Exactness: deviations are scaled by n (d_t = n·x_t − Σx) so the
    mean never materializes as a float — prefix sums, running minima,
    and cusum_scaled are exact BIGINTs end-to-end; the reported cusum
    is ONE IEEE division by n.  Top-5 ordering is on the exact integer
    with the unique hour as tie-break.

    Scale: per-hour pre-aggregate is the only data-sized shuffle; the
    two running windows operate on |hours| post-aggregate rows
    (documented BOUNDED_GLOBAL_WINDOW_OK exemption) and the result is
    a TakeOrdered(5).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").cast("long").alias("x")
    )
    stats = hourly.agg(
        F.sum("x").cast("long").alias("sx"),
        F.count("*").cast("long").alias("n"),
    )
    dev = hourly.crossJoin(stats).select(
        "h", "x", "n", (F.col("n") * F.col("x") - F.col("sx")).alias("d")
    )
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    pre = dev.select("h", "x", "n", F.sum("d").over(w).alias("p"))
    cus = pre.select(
        "h",
        "x",
        "n",
        (
            F.col("p")
            - F.least(F.lit(0).cast("long"), F.min("p").over(w))
        ).alias("cus_scaled"),
    )
    return (
        cus.orderBy(F.col("cus_scaled").desc(), "h")
        .limit(5)
        .select(
            F.col("h").alias("hour"),
            F.col("x").alias("n_events"),
            F.col("cus_scaled").cast("long").alias("cusum_scaled"),
            (F.col("cus_scaled").cast("double") / F.col("n")).alias("cusum"),
        )
    )


@query(
    "roc_auc_binned",
    oracle="""
    WITH scored AS (
        SELECT CAST(floor(value * 10 + 0.5) AS BIGINT) AS b,
               CAST(event_type = 'purchase' AS INT) AS y
        FROM events
    ),
    buckets AS (
        SELECT b,
               CAST(count_if(y = 1) AS BIGINT) AS np,
               CAST(count_if(y = 0) AS BIGINT) AS nn
        FROM scored GROUP BY b
    ),
    cum AS (
        SELECT np, nn,
               CAST(SUM(nn) OVER (ORDER BY b
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - nn AS BIGINT)
                   AS nn_below
        FROM buckets
    )
    SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
           CAST(SUM(nn) AS BIGINT) AS n_neg,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(np * (2 * nn_below + nn)) AS BIGINT) AS u2,
           CAST(SUM(np * (2 * nn_below + nn)) AS DOUBLE)
               / (2 * SUM(np) * SUM(nn)) AS auc
    FROM cum
    """,
)
def roc_auc_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned ROC-AUC (M181): the Mann-Whitney identity
    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻) computed from
    score-histogram buckets — the model-eval number behind every
    ranking-quality gate, in the binned form a 100 TB scorer actually
    uses (exact per-row ranking needs a global sort; the histogram
    needs one bounded aggregate).  Score = event value deci-quantized
    (production: any monotone quantization of the model score; AUC is
    rank-based so quantization only merges ties), label = purchase.

    Exactness: per-bucket positive/negative counts are exact BIGINTs;
    the tie-aware U statistic is computed doubled
    (u2 = Σ_b np_b·(2·negatives_below + nn_b)) so ties never produce a
    fraction; AUC is ONE IEEE division u2 / (2·n_pos·n_neg).

    Scale: one map-side-combined aggregate over the scan; the running
    negative count is a window over |buckets| rows — bounded by the
    score range (≈4 900 here), not the data size (documented
    BOUNDED_GLOBAL_WINDOW_OK exemption).
    """
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.floor(F.col("value") * 10 + F.lit(0.5)).cast("long").alias("b"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    buckets = scored.groupBy("b").agg(
        F.count_if(F.col("y") == 1).cast("long").alias("np"),
        F.count_if(F.col("y") == 0).cast("long").alias("nn"),
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.select(
        "np",
        "nn",
        (F.sum("nn").over(w) - F.col("nn")).cast("long").alias("nn_below"),
    )
    u2 = F.sum(
        F.col("np") * (F.lit(2) * F.col("nn_below") + F.col("nn"))
    ).cast("long")
    return cum.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.count("*").cast("long").alias("n_buckets"),
        u2.alias("u2"),
        (
            u2.cast("double")
            / (F.lit(2) * F.sum("np") * F.sum("nn"))
        ).alias("auc"),
    )


@query(
    "theil_sen_trend",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY date_trunc('hour', ts)
    ),
    idx AS (
        SELECT x, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS i
        FROM hourly
    ),
    slopes AS (
        SELECT CAST(floor(CAST((b.x - a.x) * 1000000 AS DOUBLE)
                          / (b.i - a.i)) AS BIGINT) AS slope_micro,
               a.i AS i, b.i AS j
        FROM idx a JOIN idx b ON b.i > a.i
    ),
    ranked AS (
        SELECT slope_micro,
               CAST(row_number() OVER (
                   ORDER BY slope_micro, i, j) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM slopes
    )
    SELECT m AS n_pairs,
           CAST((SELECT COUNT(*) FROM hourly) AS BIGINT) AS n_hours,
           CAST(slope_micro AS BIGINT) AS median_slope_micro,
           CAST(slope_micro AS DOUBLE) / 1000000 AS slope_per_hour
    FROM ranked WHERE rn = (m + 1) // 2
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend (M184): the median of all pairwise
    slopes of the hourly event series — the trend estimator that
    shrugs off the outlier hours OLS would chase (breakdown point
    ~29%).  The "is traffic actually growing" number for a noisy
    operational series.

    Exactness: slopes are micro-quantized via one floor of one IEEE
    division of exact integers ((Δx·1e6 exact in double far below
    2^53) / Δi) — identical doubles both engines; the median is the
    exact lower-middle element under the total order
    (slope_micro, i, j), so the result is ONE deterministic row.

    Scale: the per-hour pre-aggregate is the only data-sized shuffle;
    the |hours|² pair join (~260 k pairs for a 30-day series) and both
    windows run post-aggregate on series-sized state — bounded by the
    time range, never by data volume (documented
    BOUNDED_GLOBAL_WINDOW_OK exemption).  For multi-year series swap
    in the standard per-partition-sample variant; the median logic is
    unchanged.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").cast("long").alias("x")
    )
    w = Window.orderBy("h")
    idx = hourly.select(
        "x", F.row_number().over(w).cast("long").alias("i")
    )
    a = idx.select(F.col("x").alias("xa"), F.col("i").alias("i"))
    b = idx.select(F.col("x").alias("xb"), F.col("i").alias("j"))
    slopes = (
        a.join(b, F.col("j") > F.col("i"))
        .select(
            F.floor(
                ((F.col("xb") - F.col("xa")) * F.lit(1000000))
                .cast("double")
                / (F.col("j") - F.col("i"))
            )
            .cast("long")
            .alias("slope_micro"),
            "i",
            "j",
        )
    )
    w_rank = Window.orderBy("slope_micro", "i", "j")
    w_all = Window.partitionBy()
    ranked = slopes.select(
        "slope_micro",
        F.row_number().over(w_rank).cast("long").alias("rn"),
        F.count("*").over(w_all).cast("long").alias("m"),
    )
    n_hours = hourly.agg(F.count("*").cast("long").alias("n_hours"))
    return (
        ranked.where(F.col("rn") == F.expr("(m + 1) div 2"))
        .crossJoin(n_hours)
        .select(
            F.col("m").alias("n_pairs"),
            "n_hours",
            F.col("slope_micro").cast("long").alias("median_slope_micro"),
            (F.col("slope_micro").cast("double") / F.lit(1000000)).alias(
                "slope_per_hour"
            ),
        )
    )


@query(
    "dau_wau_stickiness",
    oracle="""
    WITH day_users AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               user_id
        FROM events
    ),
    dau AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM day_users GROUP BY d
    ),
    contrib AS (
        SELECT DISTINCT
               unnest(generate_series(d, d + INTERVAL 6 DAY,
                                      INTERVAL 1 DAY)) AS wd,
               user_id
        FROM day_users
    ),
    wau AS (
        SELECT wd AS d, CAST(COUNT(*) AS BIGINT) AS wau
        FROM contrib GROUP BY wd
    )
    SELECT dau.d AS day, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness (M187): daily active users over trailing-7-day
    weekly active users, per day — the engagement ratio product teams
    track (DAU/WAU → how many weekly users show up on a given day;
    1/7 = everyone visits once a week, 1.0 = everyone visits daily).

    The trailing-window distinct is NOT computed with a per-day range
    join (a 30-way nested-loop rescan of the activity table): each
    (day, user) activity row instead EMITS the 7 window-days it
    contributes to via a map-side sequence-explode, and WAU is one
    distinct aggregate over the emitted pairs — the shuffle-friendly
    inversion that scales as 7×|day-user pairs| regardless of the
    window count.  Days past the observed range are dropped by the
    inner join with the DAU side (early days carry a partial trailing
    window, as every production WAU does).

    Exactness: both counts are exact distinct BIGINTs over UTC
    date_trunc'd days; stickiness is ONE IEEE division.
    """
    ev = load_table(spark, sf_dir, "events")
    day_users = ev.select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct()
    dau = day_users.groupBy("d").agg(F.count("*").cast("long").alias("dau"))
    contrib = day_users.select(
        F.explode(
            F.sequence(
                F.col("d"),
                F.col("d") + F.expr("INTERVAL 6 DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("wd"),
        "user_id",
    ).distinct()
    wau = contrib.groupBy(F.col("wd").alias("d")).agg(
        F.count("*").cast("long").alias("wau")
    )
    return dau.join(wau, "d").select(
        F.col("d").alias("day"),
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
    )


@query(
    "user_diversity_gini",
    oracle="""
    WITH counts AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) * SUM(c) - SUM(c * c) AS DOUBLE)
               / (SUM(c) * SUM(c)) AS simpson_gini
    FROM counts GROUP BY user_id
    """,
)
def user_diversity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity (M188): the Gini–Simpson index
    1 − Σ(c_t/n)² over each user's event-type distribution — 0 for a
    single-behavior user, →1 for uniformly mixed behavior.  The
    log-free diversity feature (Shannon entropy needs libm log, which
    stays banned from hashed paths — Gini–Simpson carries the same
    ordering signal for segmentation/churn features and is exact).

    Exactness: per-(user, type) counts are exact BIGINTs; the index is
    the integer form (n² − Σc²)/n² — ONE IEEE division of exact
    integers per user.

    Scale: one (user, type)-keyed map-side-combined aggregate, then a
    user-keyed second aggregate — the same two-level rollup shape as
    any per-entity profile; per-user state is |event types|, bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    n = F.sum("c")
    return counts.groupBy("user_id").agg(
        n.cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_types"),
        (
            (n * n - F.sum(F.col("c") * F.col("c"))).cast("double")
            / (n * n)
        ).alias("simpson_gini"),
    )


@query(
    "revenue_lorenz_curve",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY o_custkey
    ),
    binned AS (
        SELECT v // 100000 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(v) AS BIGINT) AS revenue_cents
        FROM cust GROUP BY v // 100000
    ),
    tot AS (
        SELECT CAST(SUM(n_customers) AS BIGINT) AS tn,
               CAST(SUM(revenue_cents) AS BIGINT) AS ts
        FROM binned
    ),
    cum AS (
        SELECT bucket, n_customers, revenue_cents,
               CAST(SUM(n_customers) OVER (
                   ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cn,
               CAST(SUM(revenue_cents) OVER (
                   ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cs
        FROM binned
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, n_customers, revenue_cents,
           CAST(1000000 * cn // tn AS BIGINT) AS cum_pop_ppm,
           CAST(1000000 * cs // ts AS BIGINT) AS cum_rev_ppm
    FROM cum, tot
    """,
)
def revenue_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned Lorenz concentration curve (M191): customers bucketed by
    total spend ($1000-wide buckets), with cumulative population and
    revenue shares in ppm — the whale-concentration table behind "the
    top 5% of customers carry 40% of revenue" and the Gini coefficient
    (one trapezoid pass over these rows; the same shape audits token
    mass per source or shard-size concentration).

    Exactness: per-customer revenue is an exact BIGINT cents sum;
    bucket assignment one integer division; cumulative shares are
    integer ppm divisions of exact cumulative sums — every output
    column an exact BIGINT, no floats at all.

    Scale: the customer rollup is the only data-sized shuffle; the
    running sums operate on |buckets| rows — bounded by the spend
    range, not the customer count (documented
    BOUNDED_GLOBAL_WINDOW_OK exemption).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("v")
    )
    binned = cust.groupBy(F.expr("v div 100000").alias("bucket")).agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("v").cast("long").alias("revenue_cents"),
    )
    tot = binned.agg(
        F.sum("n_customers").cast("long").alias("tn"),
        F.sum("revenue_cents").cast("long").alias("ts"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = binned.select(
        "bucket",
        "n_customers",
        "revenue_cents",
        F.sum("n_customers").over(w).cast("long").alias("cn"),
        F.sum("revenue_cents").over(w).cast("long").alias("cs"),
    )
    return cum.crossJoin(tot).select(
        F.col("bucket").cast("long").alias("bucket"),
        "n_customers",
        "revenue_cents",
        F.expr("1000000 * cn div tn").cast("long").alias("cum_pop_ppm"),
        F.expr("1000000 * cs div ts").cast("long").alias("cum_rev_ppm"),
    )


@query(
    "ab_srm_check",
    oracle="""
    WITH assigned AS (
        SELECT DISTINCT user_id,
               (strpos('0123456789abcdef',
                       substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                   % 2 AS arm
        FROM events
    ),
    counts AS (
        SELECT CAST(count_if(arm = 0) AS BIGINT) AS n_a,
               CAST(count_if(arm = 1) AS BIGINT) AS n_b
        FROM assigned
    )
    SELECT n_a, n_b,
           CAST(n_a + n_b AS BIGINT) AS n_total,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)
               AS chi2,
           CAST(CASE WHEN CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                          / (n_a + n_b) > 3.841 THEN 1 ELSE 0 END
                AS INT) AS srm_flag
    FROM counts
    """,
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check (M192): the first gate every A/B
    readout must pass — under a 50/50 md5 hash split, is the observed
    arm imbalance within chance?  Chi-square with 1 dof reduces to
    (n_a − n_b)²/(n_a + n_b); past 3.841 (95%) the assignment or
    logging pipeline is dropping one arm's users and every downstream
    metric is invalid (the industry-standard "SRM" trigger).  The
    assignment here is the same first-nibble md5 parity a real
    bucketing service computes; swap in the logged arm column and the
    test is unchanged.

    Exactness: arm counts are exact BIGINTs over DISTINCT users; the
    statistic is ONE IEEE division of exact integers, and the flag
    compares that division against a pre-quantized literal (no libm
    p-value — the 1-dof 95% critical value is a constant).

    Scale: a DISTINCT user projection and ONE 2-key conditional
    aggregate — map-side combined, one row out.
    """
    ev = load_table(spark, sf_dir, "events")
    arm = (
        F.expr(
            "instr('0123456789abcdef',"
            " substr(md5(CAST(user_id AS STRING)), 1, 1)) - 1"
        )
        % 2
    )
    assigned = ev.select("user_id").distinct().select(arm.alias("arm"))
    counts = assigned.agg(
        F.count_if(F.col("arm") == 0).cast("long").alias("n_a"),
        F.count_if(F.col("arm") == 1).cast("long").alias("n_b"),
    )
    d = F.col("n_a") - F.col("n_b")
    chi2 = (d * d).cast("double") / (F.col("n_a") + F.col("n_b"))
    return counts.select(
        "n_a",
        "n_b",
        (F.col("n_a") + F.col("n_b")).cast("long").alias("n_total"),
        chi2.alias("chi2"),
        F.when(chi2 > 3.841, 1).otherwise(0).cast("int").alias("srm_flag"),
    )


@query(
    "survival_hazard_table",
    oracle="""
    WITH first_view AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
        SELECT f.user_id,
               CAST((epoch_us(MIN(e.ts)) - epoch_us(f.t0)) // 86400000000
                    AS BIGINT) AS day_bin
        FROM first_view f
        JOIN events e ON e.user_id = f.user_id
         AND e.event_type = 'purchase' AND e.ts >= f.t0
        GROUP BY f.user_id, f.t0
    ),
    conv_days AS (
        SELECT day_bin, CAST(COUNT(*) AS BIGINT) AS n_converted
        FROM conv WHERE day_bin BETWEEN 0 AND 6 GROUP BY day_bin
    ),
    cohort AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM first_view),
    days AS (SELECT unnest(range(7)) AS day),
    at_risk AS (
        SELECT d.day,
               n - COALESCE((SELECT SUM(c2.n_converted) FROM conv_days c2
                             WHERE c2.day_bin < d.day), 0) AS n_at_risk
        FROM days d, cohort
    )
    SELECT CAST(a.day AS INT) AS day,
           CAST(a.n_at_risk AS BIGINT) AS n_at_risk,
           CAST(COALESCE(c.n_converted, 0) AS BIGINT) AS n_converted,
           CAST(1000000 * COALESCE(c.n_converted, 0) // a.n_at_risk
                AS BIGINT) AS hazard_ppm
    FROM at_risk a LEFT JOIN conv_days c ON c.day_bin = a.day
    """,
)
def survival_hazard_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time survival/hazard table (M193): per day 0-6 after a
    user's first view — users still at risk (no conversion yet),
    conversions that day, and the discrete hazard (conversions per
    at-risk user, ppm) — the Kaplan-Meier data prep behind
    time-to-convert curves with censoring done RIGHT: users who never
    purchase (or purchase after the 7-day horizon) stay in every
    day's risk set instead of being dropped, the mistake that
    overstates every conversion rate M144's converted-only latency
    table cannot see.  Chain (1 − h_d) over these rows for the
    survival curve.

    Exactness: day bins are integer-microsecond differences div
    86400e6 (unix_micros/epoch_us — the `twap_user_value` discipline;
    fractional-double epochs never enter); risk sets are
    total-minus-prefix integer arithmetic
    over the 7-row bin table (triangular join, no window); hazard is
    ONE integer ppm division.

    Scale: two user-keyed MIN aggregates (the funnel shuffle shape);
    everything after runs on 7 rows.
    """
    ev = load_table(spark, sf_dir, "events")
    first_view = ev.where(F.col("event_type") == "view").groupBy(
        "user_id"
    ).agg(F.min("ts").alias("t0"))
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .join(first_view, "user_id")
        .where(F.col("ts") >= F.col("t0"))
        .groupBy("user_id", "t0")
        .agg(F.min("ts").alias("tc"))
        .select(
            F.expr(
                "(unix_micros(tc) - unix_micros(t0)) div 86400000000"
            )
            .cast("long")
            .alias("day_bin")
        )
    )
    conv_days = (
        conv.where(F.col("day_bin").between(0, 6))
        .groupBy("day_bin")
        .agg(F.count("*").cast("long").alias("n_converted"))
    )
    cohort = first_view.agg(F.count("*").cast("long").alias("n"))
    days = spark.createDataFrame([(d,) for d in range(7)], "day long")
    at_risk = (
        days.crossJoin(F.broadcast(cohort))
        .join(
            conv_days.alias("c2"),
            F.col("c2.day_bin") < F.col("day"),
            "left",
        )
        .groupBy("day", "n")
        .agg(
            F.coalesce(F.sum("n_converted"), F.lit(0)).alias("converted_before")
        )
        .select(
            "day", (F.col("n") - F.col("converted_before")).alias("n_at_risk")
        )
    )
    return (
        at_risk.join(conv_days, at_risk.day == conv_days.day_bin, "left")
        .select(
            F.col("day").cast("int").alias("day"),
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            F.coalesce("n_converted", F.lit(0))
            .cast("long")
            .alias("n_converted"),
            F.expr(
                "CAST(1000000 * COALESCE(n_converted, 0) div n_at_risk"
                " AS BIGINT)"
            ).alias("hazard_ppm"),
        )
    )


@query(
    "calibration_ece",
    oracle="""
    WITH scored AS (
        SELECT CAST(event_type = 'purchase' AS INT) AS y,
               1.0 / (1.0 + exp(-(value - 50.0) / 25.0)) AS p
        FROM events
    ),
    binned AS (
        SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin, y,
               CAST(floor(p * 1000000 + 0.5) AS BIGINT) AS p_micro
        FROM scored
    ),
    bins AS (
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(y) AS BIGINT) AS pos_b,
               CAST(SUM(p_micro) AS BIGINT) AS s_b
        FROM binned GROUP BY bin
    )
    SELECT CAST(SUM(n_b) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(abs(s_b - 1000000 * pos_b)) AS DOUBLE)
               / (1000000.0 * SUM(n_b)) AS ece,
           MAX(CAST(abs(s_b - 1000000 * pos_b) AS DOUBLE)
               / (1000000.0 * n_b)) AS mce
    FROM bins
    """,
)
def calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error (M202): the single-number summary of
    M142's reliability diagram — ECE = Σ_b (n_b/N)·|mean_pred_b −
    frac_pos_b| plus MCE (the worst bin) — the accept/refit gate a
    calibration pipeline actually thresholds on (the diagram is for
    humans; this is for the CI check).  Same stand-in sigmoid score
    and purchase label as M142; swap in the model's score column and
    both queries move together.

    Exactness: the weighted-gap algebra telescopes — per-bin
    |mean_pred − frac_pos|·n_b/N = |S_b − 1e6·pos_b| / (1e6·N) with
    S_b the exact micro-unit prediction sum — so ECE is ONE IEEE
    division of an exact BIGINT absolute-difference sum, and MCE a
    max over per-bin single divisions of exact integers.  No float
    accumulation anywhere (the sigmoid's low bits are quantized away
    before any sum, M142's discipline).

    Scale: one 10-key map-side-combined aggregate then 10-row math.
    """
    ev = load_table(spark, sf_dir, "events")
    p = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.col("value") - F.lit(50.0)) / F.lit(25.0))
    )
    binned = ev.select(
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        F.least(F.floor(p * 10).cast("int"), F.lit(9)).alias("bin"),
        F.floor(p * 1000000 + F.lit(0.5)).cast("long").alias("p_micro"),
    )
    bins = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_b"),
        F.sum("y").cast("long").alias("pos_b"),
        F.sum("p_micro").cast("long").alias("s_b"),
    )
    gap = F.abs(F.col("s_b") - F.lit(1000000) * F.col("pos_b"))
    return bins.agg(
        F.sum("n_b").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_bins"),
        (
            F.sum(gap).cast("double")
            / (F.lit(1000000.0) * F.sum("n_b"))
        ).alias("ece"),
        F.max(gap.cast("double") / (F.lit(1000000.0) * F.col("n_b"))).alias(
            "mce"
        ),
    )


@query(
    "conversion_wilson_ci",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(count_if(event_type = 'purchase') AS BIGINT) AS x
        FROM events GROUP BY 1
    )
    SELECT day, n, x,
           CAST(x AS DOUBLE) / n AS rate,
           ((CAST(x AS DOUBLE) / n) + 3.8416 / (2 * n)
            - 1.96 * sqrt((CAST(x AS DOUBLE) / n)
                          * (1.0 - CAST(x AS DOUBLE) / n) / n
                          + 3.8416 / (4.0 * n * n)))
               / (1.0 + 3.8416 / n) AS wilson_lo,
           ((CAST(x AS DOUBLE) / n) + 3.8416 / (2 * n)
            + 1.96 * sqrt((CAST(x AS DOUBLE) / n)
                          * (1.0 - CAST(x AS DOUBLE) / n) / n
                          + 3.8416 / (4.0 * n * n)))
               / (1.0 + 3.8416 / n) AS wilson_hi
    FROM daily
    """,
)
def conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily conversion rate with Wilson score interval (M204): the
    error bars every conversion dashboard should draw — the Wilson
    interval stays inside [0,1] and behaves at small n and extreme
    rates where the naive ±1.96·√(p(1−p)/n) Wald bars are simply
    wrong (x = 0 gives Wald width 0; Wilson correctly says "could be
    anything under ~z²/(n+z²)").  z = 1.96 (95%).

    Parity: n and x are exact BIGINTs; the interval is one shared
    expression tree of IEEE ops (divisions, one correctly-rounded
    sqrt) over those exact inputs with z and z² as pre-computed
    literals (3.8416 exactly — no libm in the constant path), so both
    engines produce bit-identical doubles.

    Scale: one day-keyed map-side-combined conditional aggregate;
    |days| rows of math after.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.count_if(F.col("event_type") == "purchase")
        .cast("long")
        .alias("x"),
    )
    n = F.col("n")
    p = F.col("x").cast("double") / n
    z2 = F.lit(3.8416)
    half = F.lit(1.96) * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    denom = F.lit(1.0) + z2 / n
    center = p + z2 / (2 * n)
    return daily.select(
        "day",
        "n",
        "x",
        p.alias("rate"),
        ((center - half) / denom).alias("wilson_lo"),
        ((center + half) / denom).alias("wilson_hi"),
    )


@query(
    "decision_stump_split",
    oracle="""
    WITH scored AS (
        SELECT CAST(floor(value * 10 + 0.5) AS BIGINT) AS b,
               CAST(event_type = 'purchase' AS INT) AS y
        FROM events
    ),
    buckets AS (
        SELECT b,
               CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(y) AS BIGINT) AS p_b
        FROM scored GROUP BY b
    ),
    tot AS (
        SELECT CAST(SUM(n_b) AS BIGINT) AS tn,
               CAST(SUM(p_b) AS BIGINT) AS tp
        FROM buckets
    ),
    cum AS (
        SELECT b,
               CAST(SUM(n_b) OVER w AS BIGINT) AS ln,
               CAST(SUM(p_b) OVER w AS BIGINT) AS lp
        FROM buckets
        WINDOW w AS (ORDER BY b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    splits AS (
        SELECT b AS threshold_deci, ln, lp,
               tn - ln AS rn, tp - lp AS rp,
               CAST(floor(1000000000.0
                   * (CAST(lp * (ln - lp) AS DOUBLE) * (tn - ln)
                      + CAST((tp - lp) * ((tn - ln) - (tp - lp))
                             AS DOUBLE) * ln)
                   / (CAST(ln AS DOUBLE) * (tn - ln) * tn)
                   + 0.5) AS BIGINT) AS cost_nano
        FROM cum, tot
        WHERE ln > 0 AND tn - ln > 0
    )
    SELECT threshold_deci, ln AS left_n, lp AS left_pos,
           rn AS right_n, rp AS right_pos, cost_nano
    FROM splits
    ORDER BY cost_nano, threshold_deci
    LIMIT 1
    """,
)
def decision_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split finder (M206): the best single threshold
    on the (deci-binned) score that separates the purchase label,
    by weighted Gini impurity — the inner loop of every tree/GBM
    learner, run as ONE aggregate + bounded-window pass instead of
    the per-candidate rescans a naive trainer does.  The returned
    row is the stump: predict by `score <= threshold` with the
    left/right class counts as leaf distributions.

    Exactness: the weighted-impurity objective is normalized to the
    common denominator Ln·Rn·N — cost(t) ∝ (Lp·(Ln−Lp)·Rn +
    Rp·(Rn−Rp)·Ln) / (Ln·Rn·N) — whose numerator terms are exact
    BIGINT products (≤ n³ — the doubles multiply exact integers well
    under 2⁵³ per factor); each candidate's cost is nano-quantized
    by the SAME single expression both engines, and the argmin runs
    on (cost_nano, threshold) — an exact total order.  Degenerate
    empty-side splits are excluded (the objective is undefined
    there).

    Scale: one map-side-combined histogram aggregate (the
    `roc_auc_binned` shape), a running-count window over |buckets|
    rows bounded by the score range (documented exemption), and a
    TakeOrdered(1).
    """
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.floor(F.col("value") * 10 + F.lit(0.5)).cast("long").alias("b"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    buckets = scored.groupBy("b").agg(
        F.count("*").cast("long").alias("n_b"),
        F.sum("y").cast("long").alias("p_b"),
    )
    tot = buckets.agg(
        F.sum("n_b").cast("long").alias("tn"),
        F.sum("p_b").cast("long").alias("tp"),
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.select(
        "b",
        F.sum("n_b").over(w).cast("long").alias("ln"),
        F.sum("p_b").over(w).cast("long").alias("lp"),
    )
    ln, lp = F.col("ln"), F.col("lp")
    rn = F.col("tn") - ln
    rp = F.col("tp") - lp
    cost = F.floor(
        F.lit(1000000000.0)
        * (
            (lp * (ln - lp)).cast("double") * rn
            + (rp * (rn - rp)).cast("double") * ln
        )
        / (ln.cast("double") * rn * F.col("tn"))
        + F.lit(0.5)
    ).cast("long")
    splits = (
        cum.crossJoin(F.broadcast(tot))
        .where((ln > 0) & (rn > 0))
        .select(
            F.col("b").alias("threshold_deci"),
            ln.alias("left_n"),
            lp.alias("left_pos"),
            rn.alias("right_n"),
            rp.alias("right_pos"),
            cost.alias("cost_nano"),
        )
    )
    return splits.orderBy("cost_nano", "threshold_deci").limit(1)


@query(
    "diff_in_diff_estimate",
    oracle="""
    WITH cells AS (
        SELECT CAST(user_id % 2 = 1 AS INTEGER) AS treated,
               CAST(ts >= TIMESTAMP '2024-01-16 00:00:00' AS INTEGER)
                   AS post,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,6))
                   AS s
        FROM events
        GROUP BY 1, 2
    ),
    means AS (
        SELECT
            (SELECT CAST(s AS DOUBLE) / n FROM cells
             WHERE treated = 1 AND post = 0) AS t_pre,
            (SELECT CAST(s AS DOUBLE) / n FROM cells
             WHERE treated = 1 AND post = 1) AS t_post,
            (SELECT CAST(s AS DOUBLE) / n FROM cells
             WHERE treated = 0 AND post = 0) AS c_pre,
            (SELECT CAST(s AS DOUBLE) / n FROM cells
             WHERE treated = 0 AND post = 1) AS c_post,
            (SELECT CAST(SUM(n) AS BIGINT) FROM cells) AS n_events
    )
    SELECT t_pre, t_post, c_pre, c_post, n_events,
           (t_post - t_pre) - (c_post - c_pre) AS did_estimate
    FROM means
    """,
)
def diff_in_diff_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator (M222) — the quasi-
    experimental counterpart of `ab_srm_check`/`conversion_wilson_ci`
    for when assignment wasn't randomized: treated cohort (odd user
    ids as the deterministic fixture proxy) vs control, before vs
    after a known intervention date; the DiD = (T_post − T_pre) −
    (C_post − C_pre) nets out both the stable cohort gap and the
    common time shock — the workhorse readout for staged feature
    rollouts.

    Exactness: the four cell means are exact DECIMAL sums over exact
    counts with ONE identical division each; the estimate adds only
    +/− on those doubles — bit-stable cross-engine.  Scale: one
    map-side-combined aggregate over 4 cells, then scalar algebra; no
    joins, no windows, no driver state.
    """
    ev = load_table(spark, sf_dir, "events")
    treated = F.col("user_id") % 2 == 1
    post = F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp")

    def mean_of(cond) -> F.Column:
        s = F.sum(
            F.when(cond, F.col("value").cast("decimal(38,6)"))
        ).cast("decimal(38,6)")
        n = F.count_if(cond)
        return s.cast("double") / n

    agg = ev.agg(
        mean_of(treated & ~post).alias("t_pre"),
        mean_of(treated & post).alias("t_post"),
        mean_of(~treated & ~post).alias("c_pre"),
        mean_of(~treated & post).alias("c_post"),
        F.count("*").alias("n_events"),
    )
    return agg.select(
        "t_pre",
        "t_post",
        "c_pre",
        "c_post",
        "n_events",
        (
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre"))
        ).alias("did_estimate"),
    )


@query(
    "per_type_trend_slopes",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    sums AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           sy AS total_events,
           n * sxy - sx * sy AS slope_num,
           n * sxx - sx * sx AS slope_den,
           CAST(1000000 * (n * sxy - sx * sy) // (n * sxx - sx * sx)
                AS BIGINT) AS slope_ppm
    FROM sums
    """,
)
def per_type_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend slope (M232): daily event counts per type
    regressed on the day index, in EXACT integer arithmetic — the
    numerator nΣxy−ΣxΣy and denominator nΣx²−(Σx)² ride in the hash
    as BIGINTs with the ratio as integer ppm, so there is no float
    anywhere (the per-group closed form `theil_sen_trend` trades
    robustness for; OLS is the volume-weighted default).  A negative
    slope on a source/type is the ingestion-decay alarm the mixing
    stage reads before re-weighting.

    Scale: one (type, day) aggregate (map-side combined), then a
    |types|-group reduce — two shuffles of bounded key sets, no
    windows, no driver state.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("x"),
    ).agg(F.count("*").alias("y"))
    sums = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("sy").alias("total_events"),
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.expr(
            "1000000 * (n * sxy - sx * sy) div (n * sxx - sx * sx)"
        ).alias("slope_ppm"),
    )


@query(
    "data_contract_audit",
    oracle="""
    SELECT 'orders.custkey_not_null' AS check_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_checked,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_custkey IS NULL) AS n_violations
    UNION ALL
    SELECT 'orders.totalprice_positive',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_totalprice <= 0)
    UNION ALL
    SELECT 'orders.orderkey_unique',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
           (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
            FROM (SELECT COUNT(*) AS n FROM orders
                  GROUP BY o_orderkey) WHERE n > 1)
    UNION ALL
    SELECT 'orders.custkey_fk_customer',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem.orderkey_fk_orders',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    """,
)
def data_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract validation table (M233) — the dbt-style test
    suite as ONE query: not-null, range, uniqueness, and referential-
    integrity checks each reporting (checked, violations), so a
    single value hash certifies the whole contract and any violation
    count > 0 names its failed check.  This is the gate a 100 TB
    ingest runs BEFORE publishing a manifest version — the counts are
    cheap aggregates; the FK legs are anti-join shapes (broadcast the
    dimension side), never row-by-row lookups.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    n_orders = orders.count()
    n_lineitem = lineitem.count()

    not_null = orders.agg(
        F.lit("orders.custkey_not_null").alias("check_name"),
        F.lit(n_orders).alias("n_checked"),
        F.count_if(F.col("o_custkey").isNull()).alias("n_violations"),
    )
    rng = orders.agg(
        F.lit("orders.totalprice_positive").alias("check_name"),
        F.lit(n_orders).alias("n_checked"),
        F.count_if(F.col("o_totalprice") <= 0).alias("n_violations"),
    )
    uniq = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .agg(
            F.lit("orders.orderkey_unique").alias("check_name"),
            F.lit(n_orders).alias("n_checked"),
            F.coalesce(
                F.sum(F.when(F.col("n") > 1, F.col("n") - 1)), F.lit(0)
            )
            .cast("long")
            .alias("n_violations"),
        )
    )
    fk_cust = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        ).agg(
            F.lit("orders.custkey_fk_customer").alias("check_name"),
            F.lit(n_orders).alias("n_checked"),
            F.count("*").alias("n_violations"),
        )
    )
    fk_ord = (
        lineitem.join(
            F.broadcast(orders.select("o_orderkey")),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
            "left_anti",
        ).agg(
            F.lit("lineitem.orderkey_fk_orders").alias("check_name"),
            F.lit(n_lineitem).alias("n_checked"),
            F.count("*").alias("n_violations"),
        )
    )
    return (
        not_null.unionByName(rng)
        .unionByName(uniq)
        .unionByName(fk_cust)
        .unionByName(fk_ord)
    )


@query(
    "event_runlength_islands",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
        SELECT user_id, event_type,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY rn) AS run_id
        FROM (SELECT *, row_number() OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM (SELECT user_id, event_type, chg, ts, event_id
                    FROM (SELECT user_id, event_type, ts, event_id,
                                 CASE WHEN lag(event_type) OVER
                                          (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                                      IS DISTINCT FROM event_type
                                      THEN 1 ELSE 0 END AS chg
                          FROM events)))
    ),
    per_run AS (
        SELECT user_id, run_id, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id,
           CAST(SUM(run_len) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(MAX(run_len) AS BIGINT) AS longest_run,
           CAST(1000000 * COUNT(*) // SUM(run_len) AS BIGINT)
               AS rle_ratio_ppm
    FROM per_run GROUP BY user_id
    """,
)
def event_runlength_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length islands per user stream (M235) — the classic
    gaps-and-islands decomposition the registry's window surface
    lacked: consecutive same-type events collapse into runs (change
    flag via lag, run id via the change flag's running sum), then
    per-user run statistics.  The RLE ratio is the session-replay
    compressibility signal (a user whose stream is one long run is a
    bot/retry smell; `top_ngram_repetition` is the text-side twin).

    Both engines share the ordering (ts, event_id — unique tie-break)
    and the lag/cumsum island construction; the ratio is exact
    integer ppm.  One partitioned-window shuffle + one bounded
    aggregate — the sessionize plan shape.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    runs = flagged.select(
        "user_id",
        "event_type",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("run_id"),
    )
    per_run = runs.groupBy("user_id", "run_id").agg(
        F.count("*").alias("run_len")
    )
    return per_run.groupBy("user_id").agg(
        F.sum("run_len").alias("n_events"),
        F.count("*").alias("n_runs"),
        F.max("run_len").alias("longest_run"),
        F.expr("1000000 * count(*) div sum(run_len)").alias(
            "rle_ratio_ppm"
        ),
    )


#: Cumulative Poisson(1) thresholds for hash-bootstrap weights
#: (truncated at 4), as shared literals so both engines compare the
#: same doubles: P(W=0)=e^-1, +P(1), +P(2), +P(3).
_BOOT_C0 = "0.36787944117144233"
_BOOT_C1 = "0.7357588823428847"
_BOOT_C2 = "0.9196986029286058"
_BOOT_C3 = "0.9810118431238462"
_BOOT_B = 32


@query(
    "bootstrap_mean_ci",
    oracle=f"""
    WITH reps AS (
        SELECT e.event_id, e.value, b.b,
               CAST(CAST(('0x' || substr(md5(CAST(e.event_id AS VARCHAR)
                                             || ':' || CAST(b.b AS VARCHAR)),
                                         1, 8)) AS BIGINT) AS DOUBLE)
                   / 4294967296 AS u
        FROM events e
        CROSS JOIN (SELECT CAST(unnest(range({_BOOT_B})) AS BIGINT) AS b) b
    ),
    weighted AS (
        SELECT b, value,
               CASE WHEN u < {_BOOT_C0} THEN 0
                    WHEN u < {_BOOT_C1} THEN 1
                    WHEN u < {_BOOT_C2} THEN 2
                    WHEN u < {_BOOT_C3} THEN 3
                    ELSE 4 END AS w
        FROM reps
    ),
    means AS (
        SELECT b,
               CAST(CAST(SUM(w * CAST(value AS DECIMAL(38,6)))
                         AS DECIMAL(38,6)) AS DOUBLE)
                   / CAST(SUM(w) AS BIGINT) AS m
        FROM weighted GROUP BY b
    ),
    ordered AS (SELECT list(m ORDER BY m) AS ms FROM means),
    point AS (
        SELECT CAST(CAST(SUM(CAST(value AS DECIMAL(38,6)))
                         AS DECIMAL(38,6)) AS DOUBLE)
                   / COUNT(*) AS mean_value,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
    )
    SELECT point.mean_value, point.n,
           CAST({_BOOT_B} AS INTEGER) AS n_resamples,
           ordered.ms[2] AS ci_lo, ordered.ms[{_BOOT_B} - 1] AS ci_hi
    FROM point, ordered
    """,
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap confidence interval (M236): the
    assumption-free uncertainty readout for ANY metric — 32 resamples
    whose per-row multiplicity is a Poisson(1) draw taken from a
    KEYED HASH of (event_id, resample), not an RNG, so both engines
    (and every re-run) materialize the identical resamples; the CI is
    the 2nd/31st order statistic of the resample means (~94% interval
    by the order-statistic rule).  This is how 100 TB pipelines
    bootstrap: Poisson weights stream map-side (no resampling
    shuffle), B means aggregate in one pass.

    Exactness: the uniform is the first 8 md5 hex digits of
    "(event_id):(resample)" — keyed, decorrelated across resamples
    (a shifted multiplicative hash is NOT: the shared shift moves
    every row's draw together and biases the order statistics);
    Poisson thresholds are shared literals; each
    resample mean is a DECIMAL sum with one division; the order
    statistics come from a 32-element sorted array, not a window.
    """
    ev = load_table(spark, sf_dir, "events")
    bs = spark.range(_BOOT_B).select(F.col("id").alias("b"))
    reps = ev.select("event_id", "value").crossJoin(F.broadcast(bs))
    # md5-keyed uniform (NOT a shifted multiplicative hash: a shared
    # shift per resample correlates the B draws and biases the order
    # statistics — caught by the bracket property test)
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("event_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long").cast("double") / F.lit(4294967296)
    w = (
        F.when(u < float(_BOOT_C0), 0)
        .when(u < float(_BOOT_C1), 1)
        .when(u < float(_BOOT_C2), 2)
        .when(u < float(_BOOT_C3), 3)
        .otherwise(4)
    )
    means = (
        reps.select("b", "value", w.alias("w"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("value").cast("decimal(38,6)"))
                .cast("decimal(38,6)")
                .cast("double")
                / F.sum("w").cast("long")
            ).alias("m")
        )
    )
    ordered = means.agg(
        F.sort_array(F.collect_list("m")).alias("ms")
    )
    point = ev.agg(
        (
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("decimal(38,6)")
            .cast("double")
            / F.count("*")
        ).alias("mean_value"),
        F.count("*").alias("n"),
    )
    return point.crossJoin(ordered).select(
        "mean_value",
        "n",
        F.lit(_BOOT_B).cast("int").alias("n_resamples"),
        F.element_at("ms", 2).alias("ci_lo"),
        F.element_at("ms", _BOOT_B - 1).alias("ci_hi"),
    )


@query(
    "trimmed_mean_robust",
    oracle="""
    WITH th AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(CAST(SUM(CAST(e.value AS DECIMAL(38,6)))
                     AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*)
               AS trimmed_mean,
           th.p05, th.p95
    FROM events e JOIN th USING (event_type)
    WHERE e.value >= th.p05 AND e.value <= th.p95
    GROUP BY e.event_type, th.p05, th.p95
    """,
)
def trimmed_mean_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 5% trimmed mean (M237) — the robust central-tendency
    readout between mean (outlier-hostage) and median (throws away
    90% of the data): drop everything outside the exact [p05, p95]
    interpolated percentiles, average the rest.  The metric dashboards
    move to when `mad_outliers` says the tails are polluting the mean.

    Exactness: Spark ``percentile`` and DuckDB ``quantile_cont`` share
    the linear-interpolation definition (pinned by
    `value_percentiles`), so the thresholds are bit-equal doubles and
    the kept row set identical; the trimmed mean is a DECIMAL sum
    with one division.  Scale: one percentile aggregate per group
    (broadcast back), one filtered aggregate — two passes, no
    windows, no sort.
    """
    ev = load_table(spark, sf_dir, "events")
    th = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("p05"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    )
    kept = ev.join(F.broadcast(th), "event_type").filter(
        (F.col("value") >= F.col("p05")) & (F.col("value") <= F.col("p95"))
    )
    return kept.groupBy("event_type", "p05", "p95").agg(
        F.count("*").alias("n_kept"),
        (
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("decimal(38,6)")
            .cast("double")
            / F.count("*")
        ).alias("trimmed_mean"),
    ).select("event_type", "n_kept", "trimmed_mean", "p05", "p95")


@query(
    "interarrival_median_gap",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    ),
    g AS (SELECT user_id, gap_us FROM gaps WHERE gap_us IS NOT NULL)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           quantile_cont(gap_us, 0.5) AS median_gap_us,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM g GROUP BY user_id
    """,
)
def interarrival_median_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival cadence (M238): the median gap between a
    user's consecutive events in exact epoch-microseconds — the
    behavioral-rhythm feature `sessionize` thresholds SHOULD be tuned
    from (a session gap below the population's typical inter-arrival
    median merges everything; far above it splits nothing), and the
    bot detector's favorite input (machine traffic has a near-zero,
    near-constant median gap).

    Exactness: gaps are BIGINT microsecond differences over the
    unique (ts, event_id) ordering; the median is the shared
    interpolated-percentile definition on those exact integers.
    Scale: one partitioned-window shuffle (the sessionize shape) +
    one per-user aggregate.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.percentile("gap_us", F.lit(0.5)).alias("median_gap_us"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


@query(
    "cuped_adjusted_lift",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 = 1 AS INTEGER) AS treated,
               CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP
                        '2024-01-16 00:00:00'
                        THEN CAST(value AS DECIMAL(38,6)) END), 0)
                    * 1000000 AS BIGINT) AS pre_u,
               CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP
                        '2024-01-16 00:00:00'
                        THEN CAST(value AS DECIMAL(38,6)) END), 0)
                    * 1000000 AS BIGINT) AS post_u
        FROM events GROUP BY user_id
    ),
    pooled AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(CAST(pre_u AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(SUM(CAST(post_u AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(SUM(CAST(pre_u AS HUGEINT) * pre_u) AS HUGEINT)
                   AS sxx,
               CAST(SUM(CAST(pre_u AS HUGEINT) * post_u) AS HUGEINT)
                   AS sxy,
               CAST(SUM(CAST(post_u AS HUGEINT) * post_u) AS HUGEINT)
                   AS syy
        FROM per_user
    ),
    arms AS (
        SELECT treated, CAST(COUNT(*) AS BIGINT) AS n_a,
               CAST(SUM(CAST(pre_u AS HUGEINT)) AS HUGEINT) AS sx_a,
               CAST(SUM(CAST(post_u AS HUGEINT)) AS HUGEINT) AS sy_a
        FROM per_user GROUP BY treated
    ),
    th AS (
        SELECT CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
               (CAST(n * sxy - sx * sy AS DOUBLE)
                * CAST(n * sxy - sx * sy AS DOUBLE))
               / (CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)) AS rho2,
               CAST(n AS BIGINT) AS n_users
        FROM pooled
    ),
    lifts AS (
        SELECT
            (SELECT CAST(sy_a AS DOUBLE) / n_a / 1000000
             FROM arms WHERE treated = 1)
          - (SELECT CAST(sy_a AS DOUBLE) / n_a / 1000000
             FROM arms WHERE treated = 0) AS lift_raw,
            (SELECT CAST(sx_a AS DOUBLE) / n_a / 1000000
             FROM arms WHERE treated = 1)
          - (SELECT CAST(sx_a AS DOUBLE) / n_a / 1000000
             FROM arms WHERE treated = 0) AS pre_gap
    )
    SELECT th.n_users, th.theta,
           lifts.lift_raw,
           lifts.lift_raw - th.theta * lifts.pre_gap AS lift_cuped,
           CAST(floor(1000000 * th.rho2 + 0.5) AS BIGINT)
               AS var_reduction_ppm
    FROM th, lifts
    """,
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (M241) — the
    industry-standard covariate adjustment completing the experiment
    family (M192 SRM, M204 Wilson, M222 DiD): regress each user's
    post-period metric on their PRE-period metric (θ = cov/var,
    pooled), subtract θ·(pre gap) from the raw lift, and report the
    theoretical variance reduction ρ² — the factor by which the
    experiment's effective sample size grows for free (Deng et al.,
    WSDM 2013).

    Exactness: per-user pre/post sums are DECIMAL→exact micro BIGINTs;
    the pooled moments are HUGEINT/DECIMAL(38,0) products (per-user
    micro values reach ~3e9, squares ~9e18 — past int64, inside 38
    digits); θ, lifts, ρ² are identical double expression trees over
    those exact numerators.  Scale: one user-keyed aggregate + one
    6-sum reduce + a 2-row arm aggregate — no windows, no joins on
    data, no driver state.
    """
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    vdec = F.col("value").cast("decimal(38,6)")
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2 == 1).cast("int").alias("treated"),
        (
            F.coalesce(
                F.sum(F.when(F.col("ts") < cutoff, vdec)), F.lit(0)
            ).cast("decimal(38,6)")
            * 1000000
        )
        .cast("long")
        .alias("pre_u"),
        (
            F.coalesce(
                F.sum(F.when(F.col("ts") >= cutoff, vdec)), F.lit(0)
            ).cast("decimal(38,6)")
            * 1000000
        )
        .cast("long")
        .alias("post_u"),
    )
    dec = "decimal(38,0)"
    pooled = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pre_u").cast(dec).alias("sx"),
        F.sum("post_u").cast(dec).alias("sy"),
        F.sum(F.col("pre_u").cast(dec) * F.col("pre_u")).alias("sxx"),
        F.sum(F.col("pre_u").cast(dec) * F.col("post_u")).alias("sxy"),
        F.sum(F.col("post_u").cast(dec) * F.col("post_u")).alias("syy"),
    )
    arms = per_user.groupBy("treated").agg(
        F.count("*").cast("long").alias("n_a"),
        F.sum("pre_u").cast(dec).alias("sx_a"),
        F.sum("post_u").cast(dec).alias("sy_a"),
    )
    covn = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    varxn = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    varyn = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    th = pooled.select(
        F.col("n").alias("n_users"),
        (covn / varxn).alias("theta"),
        ((covn * covn) / (varxn * varyn)).alias("rho2"),
    )
    t_arm = arms.filter(F.col("treated") == 1).select(
        (F.col("sy_a").cast("double") / F.col("n_a") / 1000000).alias(
            "post_t"
        ),
        (F.col("sx_a").cast("double") / F.col("n_a") / 1000000).alias(
            "pre_t"
        ),
    )
    c_arm = arms.filter(F.col("treated") == 0).select(
        (F.col("sy_a").cast("double") / F.col("n_a") / 1000000).alias(
            "post_c"
        ),
        (F.col("sx_a").cast("double") / F.col("n_a") / 1000000).alias(
            "pre_c"
        ),
    )
    lifts = t_arm.crossJoin(c_arm).select(
        (F.col("post_t") - F.col("post_c")).alias("lift_raw"),
        (F.col("pre_t") - F.col("pre_c")).alias("pre_gap"),
    )
    return th.crossJoin(lifts).select(
        "n_users",
        "theta",
        "lift_raw",
        (F.col("lift_raw") - F.col("theta") * F.col("pre_gap")).alias(
            "lift_cuped"
        ),
        F.floor(1000000 * F.col("rho2") + F.lit(0.5))
        .cast("long")
        .alias("var_reduction_ppm"),
    )


@query(
    "beta_posterior_arms",
    oracle="""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(MAX(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_success
        FROM per_user GROUP BY arm
    ),
    post AS (
        SELECT arm, n_users, n_success,
               1 + n_success AS a,
               1 + n_users - n_success AS b
        FROM arms
    )
    SELECT arm, n_users, n_success,
           a AS post_alpha, b AS post_beta,
           CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE) AS post_mean,
           sqrt(CAST(a * b AS DOUBLE)
                / (CAST(a + b AS DOUBLE) * CAST(a + b AS DOUBLE)
                   * CAST(a + b + 1 AS DOUBLE))) AS post_sd,
           CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE)
             - 1.96 * sqrt(CAST(a * b AS DOUBLE)
                / (CAST(a + b AS DOUBLE) * CAST(a + b AS DOUBLE)
                   * CAST(a + b + 1 AS DOUBLE))) AS ci_lo,
           CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE)
             + 1.96 * sqrt(CAST(a * b AS DOUBLE)
                / (CAST(a + b AS DOUBLE) * CAST(a + b AS DOUBLE)
                   * CAST(a + b + 1 AS DOUBLE))) AS ci_hi
    FROM post
    """,
)
def beta_posterior_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B readout (M246): per-arm Beta(1+s, 1+n-s) posterior
    over the user-level conversion rate — mean, sd, and normal-approx
    95% credible interval; the Bayesian leg completing the experiment
    family (M192 SRM, M204 Wilson, M222 DiD, M241 CUPED).  With a
    uniform prior the posterior mean is the Laplace-smoothed rate, and
    the interval is what a Thompson sampler thresholds on.

    Exactness: n/s/alpha/beta are exact BIGINTs from a per-user
    dedup-then-count; mean and sd are identical double expression
    trees over those integers (sqrt is IEEE correctly-rounded, unlike
    libm log/exp which stay banned from hashed paths); alpha*beta
    stays inside int64 for any realistic user count (~5.6e13 at 15M
    users/arm).  Scale: one user-keyed aggregate + a 2-row arm
    aggregate — the cuped_adjusted_lift shape, no windows, no joins.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("arm"),
        F.max((F.col("event_type") == "purchase").cast("int"))
        .cast("long")
        .alias("converted"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_success"),
    )
    post = arms.select(
        "*",
        (F.lit(1) + F.col("n_success")).alias("a"),
        (F.lit(1) + F.col("n_users") - F.col("n_success")).alias("b"),
    )
    ab = F.col("a") + F.col("b")
    mean = F.col("a").cast("double") / ab.cast("double")
    sd = F.sqrt(
        (F.col("a") * F.col("b")).cast("double")
        / (
            ab.cast("double")
            * ab.cast("double")
            * (ab + 1).cast("double")
        )
    )
    return post.select(
        "arm",
        "n_users",
        "n_success",
        F.col("a").alias("post_alpha"),
        F.col("b").alias("post_beta"),
        mean.alias("post_mean"),
        sd.alias("post_sd"),
        (mean - 1.96 * sd).alias("ci_lo"),
        (mean + 1.96 * sd).alias("ci_hi"),
    )


@query(
    "pr_curve_thresholds",
    oracle="""
    WITH scored AS (
        SELECT CAST(floor(value * 10 + 0.5) AS BIGINT) AS b,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    buckets AS (
        SELECT b,
               CAST(SUM(y) AS BIGINT) AS np,
               CAST(SUM(1 - y) AS BIGINT) AS nn
        FROM scored GROUP BY b
    ),
    th AS (SELECT unnest([50, 100, 200, 400, 800, 1600]) AS threshold),
    cm AS (
        SELECT th.threshold,
               CAST(SUM(CASE WHEN b >= th.threshold THEN np ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN b >= th.threshold THEN nn ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN b < th.threshold THEN np ELSE 0 END)
                    AS BIGINT) AS fn
        FROM buckets CROSS JOIN th GROUP BY th.threshold
    )
    SELECT CAST(threshold AS BIGINT) AS threshold, tp, fp, fn,
           CASE WHEN tp + fp = 0 THEN NULL
                ELSE (2000000 * tp + (tp + fp)) // (2 * (tp + fp))
           END AS precision_ppm,
           CASE WHEN tp + fn = 0 THEN NULL
                ELSE (2000000 * tp + (tp + fn)) // (2 * (tp + fn))
           END AS recall_ppm,
           CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                ELSE (2000000 * 2 * tp + (2 * tp + fp + fn))
                     // (2 * (2 * tp + fp + fn))
           END AS f1_ppm
    FROM cm
    """,
)
def pr_curve_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve at fixed decision thresholds (M247): the
    classifier-eval twin of roc_auc_binned (M181) — same deci-quantized
    score histogram and purchase labels, but reporting the operating
    points (TP/FP/FN, precision, recall, F1) a deploy gate actually
    picks from, where AUC alone hides the threshold choice.

    Exactness: confusion cells are exact BIGINT sums over the bounded
    score histogram; precision/recall/F1 are engine-neutral half-up
    integer ppm ((2e6*num + den) div (2*den)), NULL-guarded where the
    denominator can vanish (an above-max threshold).  Scale: one
    map-side-combined histogram aggregate, then a |buckets| x 6
    broadcast cross join — bounded by the score range, never data
    size; no windows.
    """
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.floor(F.col("value") * 10 + F.lit(0.5)).cast("long").alias("b"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    buckets = scored.groupBy("b").agg(
        F.sum("y").cast("long").alias("np"),
        F.sum(1 - F.col("y")).cast("long").alias("nn"),
    )
    th = spark.createDataFrame(
        [(t,) for t in (50, 100, 200, 400, 800, 1600)], "threshold long"
    )
    cm = (
        buckets.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when(F.col("b") >= F.col("threshold"), F.col("np"))
                .otherwise(0)
            ).cast("long").alias("tp"),
            F.sum(
                F.when(F.col("b") >= F.col("threshold"), F.col("nn"))
                .otherwise(0)
            ).cast("long").alias("fp"),
            F.sum(
                F.when(F.col("b") < F.col("threshold"), F.col("np"))
                .otherwise(0)
            ).cast("long").alias("fn"),
        )
    )

    def _ppm(num, den):
        return F.when(
            F.expr(f"({den}) = 0"), F.lit(None).cast("long")
        ).otherwise(
            F.expr(f"(2000000 * ({num}) + ({den})) div (2 * ({den}))")
        )

    return cm.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        _ppm("tp", "tp + fp").alias("precision_ppm"),
        _ppm("tp", "tp + fn").alias("recall_ppm"),
        _ppm("2 * tp", "2 * tp + fp + fn").alias("f1_ppm"),
    )


@query(
    "xcorr_hourly_lags",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) * 1000000
                    AS BIGINT) AS y
        FROM events GROUP BY date_trunc('hour', ts)
    ),
    idx AS (
        SELECT x, y,
               CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS i
        FROM hourly
    ),
    lags AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS k),
    pairs AS (
        SELECT k, a.x AS xt, b.y AS yl
        FROM idx a CROSS JOIN lags
        JOIN idx b ON b.i = a.i - k
    ),
    m AS (
        SELECT k,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(xt) AS HUGEINT) AS sx,
               CAST(SUM(CAST(yl AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(SUM(CAST(xt AS HUGEINT) * xt) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(xt AS HUGEINT) * yl) AS HUGEINT) AS sxy,
               CAST(SUM(CAST(yl AS HUGEINT) * yl) AS HUGEINT) AS syy
        FROM pairs GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS lag, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS xcorr
    FROM m
    """,
)
def xcorr_hourly_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation (M248) between the hourly event-count
    series and the hourly value-sum series at lags -3..+3 — the
    two-signal twin of acf_hourly_lags (M177): does volume LEAD value
    (marketing spend before revenue), LAG it, or move with it?  The
    argmax lag is the offset an attribution or forecast model should
    shift its regressor by.

    Exactness: hourly y is a DECIMAL->micro BIGINT sum; all six moment
    sums are DECIMAL(38,0)/HUGEINT products of exact integers (y² per
    hour passes int64 at scale); each correlation is the exact integer
    Pearson numerator over the product of two IEEE sqrts of exact
    factors — identical trees, bit-equal.  Scale: the per-hour
    pre-aggregate is the only data-sized shuffle; the index window and
    7-lag join run on |hours| rows (BOUNDED_GLOBAL_WINDOW_OK, the
    acf_hourly_lags pattern).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").cast("long").alias("x"),
        (F.sum(F.col("value").cast("decimal(38,6)")) * 1000000)
        .cast("long")
        .alias("y"),
    )
    w = Window.orderBy("h")
    idx = hourly.select(
        "x", "y", F.row_number().over(w).cast("long").alias("i")
    )
    lags = spark.createDataFrame([(k,) for k in range(-3, 4)], "k long")
    a = idx.alias("a")
    b = idx.select(
        F.col("y").alias("yl"), F.col("i").alias("ib")
    ).alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.ib") == F.col("a.i") - F.col("k"))
        .select("k", F.col("a.x").alias("xt"), "yl")
    )
    dec = "decimal(38,0)"
    m = pairs.groupBy("k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xt").cast(dec).alias("sx"),
        F.sum(F.col("yl").cast(dec)).alias("sy"),
        F.sum(F.col("xt").cast(dec) * F.col("xt")).alias("sxx"),
        F.sum(F.col("xt").cast(dec) * F.col("yl")).alias("sxy"),
        F.sum(F.col("yl").cast(dec) * F.col("yl")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.select(
        F.col("k").alias("lag"),
        "n",
        (num / (F.sqrt(dx) * F.sqrt(dy))).alias("xcorr"),
    )


@query(
    "markov_next_event_accuracy",
    oracle="""
    WITH pairs AS (
        SELECT user_id, ts, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    train AS (
        SELECT event_type, nxt, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs
        WHERE nxt IS NOT NULL AND ts < TIMESTAMP '2024-01-16 00:00:00'
        GROUP BY event_type, nxt
    ),
    pred AS (
        SELECT event_type, nxt AS pred_next
        FROM (SELECT event_type, nxt,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY n DESC, nxt) AS rk
              FROM train)
        WHERE rk = 1
    ),
    ev AS (
        SELECT p.event_type, p.nxt, pr.pred_next
        FROM pairs p LEFT JOIN pred pr ON p.event_type = pr.event_type
        WHERE p.nxt IS NOT NULL
          AND p.ts >= TIMESTAMP '2024-01-16 00:00:00'
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_eval_pairs,
               CAST(SUM(CASE WHEN pred_next IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
               CAST(SUM(CASE WHEN pred_next = nxt
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        FROM ev
    )
    SELECT n_eval_pairs, n_covered, n_correct,
           CASE WHEN n_covered = 0 THEN NULL
                ELSE (2000000 * n_correct + n_covered) // (2 * n_covered)
           END AS accuracy_ppm,
           CASE WHEN n_eval_pairs = 0 THEN NULL
                ELSE (2000000 * n_covered + n_eval_pairs)
                     // (2 * n_eval_pairs)
           END AS coverage_ppm
    FROM agg
    """,
)
def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction eval (M251): train the argmax first-order
    Markov predictor (markov_transitions M106's model) on transitions
    whose first event precedes the time cutoff, then score top-1
    accuracy on post-cutoff transitions — the proper TEMPORAL
    train/eval split (leakage_safe_split's lesson applied to sequence
    models): a random split would let the model memorize each user's
    future.

    Exactness: transition counts over the unique (ts, event_id)
    per-user ordering; argmax tie-breaks (count DESC, next ASC);
    accuracy/coverage as engine-neutral half-up integer ppm with
    NULL-guarded denominators.  Scale: one sessionize-shaped window
    shuffle builds the pairs; the model is a |types|² aggregate that
    broadcasts; eval is one map-side join + a 1-row reduce.
    """
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    train = (
        pairs.filter(F.col("ts") < cutoff)
        .groupBy("event_type", "nxt")
        .agg(F.count("*").cast("long").alias("n"))
    )
    pred = (
        train.groupBy("event_type")
        .agg(F.min(F.struct((-F.col("n")).alias("neg"),
                            F.col("nxt").alias("p"))).alias("b"))
        .select("event_type", F.col("b.p").alias("pred_next"))
    )
    ev_pairs = pairs.filter(F.col("ts") >= cutoff).join(
        F.broadcast(pred), "event_type", "left"
    )
    agg = ev_pairs.agg(
        F.count("*").cast("long").alias("n_eval_pairs"),
        F.sum(F.col("pred_next").isNotNull().cast("int"))
        .cast("long")
        .alias("n_covered"),
        F.sum((F.col("pred_next") == F.col("nxt")).cast("int"))
        .cast("long")
        .alias("n_correct"),
    )
    return agg.select(
        "n_eval_pairs",
        "n_covered",
        "n_correct",
        F.when(F.col("n_covered") == 0, F.lit(None).cast("long"))
        .otherwise(
            F.expr(
                "(2000000 * n_correct + n_covered) div (2 * n_covered)"
            )
        )
        .alias("accuracy_ppm"),
        F.when(F.col("n_eval_pairs") == 0, F.lit(None).cast("long"))
        .otherwise(
            F.expr(
                "(2000000 * n_covered + n_eval_pairs)"
                " div (2 * n_eval_pairs)"
            )
        )
        .alias("coverage_ppm"),
    )


@query(
    "anova_f_groups",
    oracle="""
    WITH x AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                   AS xu
        FROM events
    ),
    g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(xu) AS BIGINT) AS s_g,
               CAST(SUM(CAST(xu AS HUGEINT) * xu) AS HUGEINT) AS q_g
        FROM x GROUP BY event_type
    ),
    tot AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(s_g) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g
    ),
    terms AS (
        SELECT
            CAST(floor(1000 * (CAST(n_g AS DOUBLE)
                 * ((CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) / 1000000)
                    - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000))
                 * ((CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) / 1000000)
                    - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000)))
                 + 0.5) AS BIGINT) AS ssb_milli,
            CAST(floor(1000 * (CAST(q_g AS DOUBLE) / 1000000000000
                 - CAST(n_g AS DOUBLE)
                   * (CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) / 1000000)
                   * (CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) / 1000000))
                 + 0.5) AS BIGINT) AS ssw_milli
        FROM g CROSS JOIN tot
    ),
    agg AS (
        SELECT CAST(SUM(ssb_milli) AS BIGINT) AS ssb_milli,
               CAST(SUM(ssw_milli) AS BIGINT) AS ssw_milli
        FROM terms
    )
    SELECT tot.k AS k_groups, tot.n AS n_total,
           agg.ssb_milli, agg.ssw_milli,
           (CAST(agg.ssb_milli AS DOUBLE) * CAST(tot.n - tot.k AS DOUBLE))
           / (CAST(agg.ssw_milli AS DOUBLE)
              * CAST(tot.k - 1 AS DOUBLE)) AS f_stat
    FROM agg CROSS JOIN tot
    """,
)
def anova_f_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic (M255): does mean event value differ
    across event types?  F = [SSB/(k-1)] / [SSW/(n-k)] — the k-group
    generalization the experiment family lacked (SRM/Wilson/CUPED are
    two-arm; chi2 M168 is categorical): one number that says whether
    ANY group's mean departs, read against the F critical value before
    pairwise digging.

    Exactness: per-row micro BIGINTs; per-group (n, s, q) with q as
    DECIMAL(38,0)/HUGEINT (micro² passes int64); each group's SSB/SSW
    term is an identical double tree over those exact integers,
    quantized to milli BIGINT BEFORE the cross-group sum (the
    split_label_shift_chi2 / psi_drift discipline — sum order cannot
    move the result); F is one division of exact-integer-anchored
    doubles, cast-before-multiply (the benford overflow discipline).
    Scale: one map-side-combined group aggregate (k groups), a 1-row
    totals reduce, term math on k rows — no windows, no data joins.
    """
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        (F.col("value").cast("decimal(38,6)") * 1000000)
        .cast("long")
        .alias("xu"),
    )
    dec = "decimal(38,0)"
    g = x.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("xu").cast("long").alias("s_g"),
        F.sum(F.col("xu").cast(dec) * F.col("xu")).alias("q_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.count("*").cast("long").alias("k"),
    )
    m_g = F.col("s_g").cast("double") / F.col("n_g").cast("double") / 1000000
    m = F.col("s").cast("double") / F.col("n").cast("double") / 1000000
    ssb_term = F.floor(
        1000 * (F.col("n_g").cast("double") * (m_g - m) * (m_g - m))
        + F.lit(0.5)
    ).cast("long")
    ssw_term = F.floor(
        1000
        * (
            F.col("q_g").cast("double") / 1000000000000
            - F.col("n_g").cast("double") * m_g * m_g
        )
        + F.lit(0.5)
    ).cast("long")
    terms = g.crossJoin(F.broadcast(tot)).select(
        ssb_term.alias("ssb_milli"), ssw_term.alias("ssw_milli")
    )
    agg = terms.agg(
        F.sum("ssb_milli").cast("long").alias("ssb_milli"),
        F.sum("ssw_milli").cast("long").alias("ssw_milli"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_total"),
        "ssb_milli",
        "ssw_milli",
        (
            F.col("ssb_milli").cast("double")
            * (F.col("n") - F.col("k")).cast("double")
            / (
                F.col("ssw_milli").cast("double")
                * (F.col("k") - 1).cast("double")
            )
        ).alias("f_stat"),
    )


@query(
    "cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP)
                   AS cohort_week
        FROM events GROUP BY user_id
    ),
    sized AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
        FROM firsts GROUP BY cohort_week
    ),
    rev AS (
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                    CAST(date_trunc('week', e.ts) AS TIMESTAMP)) // 7
                    AS BIGINT) AS age_week,
               CAST(SUM(CAST(e.value AS DECIMAL(38,6))) * 1000000
                    AS BIGINT) AS rev_u
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2
    ),
    curve AS (
        SELECT cohort_week, age_week,
               CAST(SUM(rev_u) OVER (PARTITION BY cohort_week
                                     ORDER BY age_week) AS BIGINT)
                   AS cum_rev_u
        FROM rev
    )
    SELECT c.cohort_week, c.age_week, s.cohort_users, c.cum_rev_u,
           (2 * c.cum_rev_u + s.cohort_users) // (2 * s.cohort_users)
               AS ltv_micro_per_user
    FROM curve c JOIN sized s ON c.cohort_week = s.cohort_week
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve (M260): cumulative purchase revenue per user by
    cohort age in weeks — the money-side twin of retention_cohorts
    (M102): retention says who CAME BACK, LTV says what they were
    WORTH, and the curve's flattening point is where acquisition spend
    must be recouped.  Cohort = first-event week; age = whole weeks
    between the purchase's week and the cohort week.

    Exactness: DECIMAL->micro BIGINT revenue; week truncation shared
    (DuckDB date_trunc('week') returns DATE -> CAST TIMESTAMP, the
    SCALE.md day-grain gotcha); LTV is half-up integer micro per
    cohort user.  Scale: one user-keyed first-event aggregate, one
    (cohort, age) revenue aggregate, and the cumulative window runs
    per cohort over |ages| rows — bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    sized = firsts.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_users")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.expr(
                "CAST(datediff(date_trunc('week', ts), cohort_week)"
                " div 7 AS BIGINT)"
            ).alias("age_week"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(38,6)")) * 1000000)
            .cast("long")
            .alias("rev_u")
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = rev.select(
        "cohort_week",
        "age_week",
        F.sum("rev_u").over(w).cast("long").alias("cum_rev_u"),
    )
    return curve.join(F.broadcast(sized), "cohort_week").select(
        "cohort_week",
        "age_week",
        "cohort_users",
        "cum_rev_u",
        F.expr(
            "(2 * cum_rev_u + cohort_users) div (2 * cohort_users)"
        ).alias("ltv_micro_per_user"),
    )


@query(
    "quantile_treatment_effect",
    oracle="""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) * 1000000
                    AS BIGINT) AS v
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT arm,
               quantile_cont(v, 0.1) AS q10,
               quantile_cont(v, 0.25) AS q25,
               quantile_cont(v, 0.5) AS q50,
               quantile_cont(v, 0.75) AS q75,
               quantile_cont(v, 0.9) AS q90
        FROM per_user GROUP BY arm
    ),
    t AS (SELECT * FROM arms WHERE arm = 1),
    c AS (SELECT * FROM arms WHERE arm = 0)
    SELECT p, q_treat, q_control, q_treat - q_control AS qte
    FROM (
        SELECT CAST(0.10 AS DOUBLE) AS p, t.q10 AS q_treat, c.q10 AS q_control FROM t, c
        UNION ALL
        SELECT CAST(0.25 AS DOUBLE), t.q25, c.q25 FROM t, c
        UNION ALL
        SELECT CAST(0.50 AS DOUBLE), t.q50, c.q50 FROM t, c
        UNION ALL
        SELECT CAST(0.75 AS DOUBLE), t.q75, c.q75 FROM t, c
        UNION ALL
        SELECT CAST(0.90 AS DOUBLE), t.q90, c.q90 FROM t, c
    )
    """,
)
def quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects (M262): the per-quantile lift between
    arms at p10/p25/p50/p75/p90 of per-user value — the
    DISTRIBUTIONAL experiment readout the mean-based family (CUPED
    M241, DiD M222) hides: a treatment that helps the median user but
    hurts the tail shows a zero mean lift and a loud QTE curve.

    Exactness: per-user outcomes are exact micro BIGINTs; both engines
    share the linear-interpolation percentile definition (the
    value_percentiles pin), so each quantile is a bit-equal double
    over exact integers and the QTE is one subtraction of identical
    trees.  Scale: one user-keyed aggregate + a 2-row per-arm
    percentile aggregate + constant-size reshaping.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("arm"),
        (F.sum(F.col("value").cast("decimal(38,6)")) * 1000000)
        .cast("long")
        .alias("v"),
    )
    probes = [0.10, 0.25, 0.50, 0.75, 0.90]
    arms = per_user.groupBy("arm").agg(
        *[
            F.percentile("v", F.lit(p)).alias(f"q{int(p * 100)}")
            for p in probes
        ]
    )
    t = arms.filter(F.col("arm") == 1).select(
        *[F.col(f"q{int(p * 100)}").alias(f"t{int(p * 100)}") for p in probes]
    )
    c = arms.filter(F.col("arm") == 0).select(
        *[F.col(f"q{int(p * 100)}").alias(f"c{int(p * 100)}") for p in probes]
    )
    wide = t.crossJoin(c)
    rows = [
        wide.select(
            F.lit(p).alias("p"),
            F.col(f"t{int(p * 100)}").alias("q_treat"),
            F.col(f"c{int(p * 100)}").alias("q_control"),
        )
        for p in probes
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select(
        "p",
        "q_treat",
        "q_control",
        (F.col("q_treat") - F.col("q_control")).alias("qte"),
    )


@query(
    "conformal_interval_coverage",
    oracle="""
    WITH tagged AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                   AS v,
               CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
                         <= '7' THEN 0
                    WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
                         <= 'b' THEN 1
                    ELSE 2 END AS split
        FROM events
    ),
    model AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_train,
               CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS pred
        FROM tagged WHERE split = 0 GROUP BY event_type
    ),
    cal AS (
        SELECT t.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_cal,
               quantile_cont(abs(CAST(t.v AS DOUBLE) - m.pred), 0.9)
                   AS qhat
        FROM tagged t JOIN model m ON t.event_type = m.event_type
        WHERE t.split = 1 GROUP BY t.event_type
    ),
    ev AS (
        SELECT t.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(SUM(CASE WHEN abs(CAST(t.v AS DOUBLE) - m.pred)
                                  <= c.qhat
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_inside
        FROM tagged t
        JOIN model m ON t.event_type = m.event_type
        JOIN cal c ON t.event_type = c.event_type
        WHERE t.split = 2 GROUP BY t.event_type
    )
    SELECT m.event_type, m.n_train, c.n_cal, ev.n_eval, m.pred, c.qhat,
           (2000000 * ev.n_inside + ev.n_eval) // (2 * ev.n_eval)
               AS coverage_ppm
    FROM model m
    JOIN cal c ON m.event_type = c.event_type
    JOIN ev ON m.event_type = ev.event_type
    """,
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (M263): train a naive
    per-type mean predictor on the train split, take the 90th
    percentile of absolute residuals on a held-out CALIBRATION split
    (qhat), and measure on the EVAL split how often the true value
    lands inside pred ± qhat — the distribution-free uncertainty
    wrapper modern ML serving puts around ANY point model; coverage
    near 900 000 ppm certifies the calibration regardless of the
    predictor's quality.

    Exactness: the 8/4/4 md5 split and micro BIGINT values are shared
    predicates; pred is one division of exact integers; residuals and
    qhat are identical double trees (shared interpolated-percentile
    definition); coverage is half-up integer ppm over exact counts.
    Scale: three passes over the scan with a broadcast |types|-row
    model — no windows, no data-sized joins.
    """
    ev = load_table(spark, sf_dir, "events")
    hexc = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
    tagged = ev.select(
        "event_type",
        (F.col("value").cast("decimal(38,6)") * 1000000)
        .cast("long")
        .alias("v"),
        F.when(hexc <= "7", 0).when(hexc <= "b", 1).otherwise(2).alias(
            "split"
        ),
    )
    model = (
        tagged.filter(F.col("split") == 0)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_train"),
            (F.sum("v").cast("double") / F.count("*").cast("double")).alias(
                "pred"
            ),
        )
    )
    resid = F.abs(F.col("v").cast("double") - F.col("pred"))
    cal = (
        tagged.filter(F.col("split") == 1)
        .join(F.broadcast(model), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_cal"),
            F.percentile(resid, F.lit(0.9)).alias("qhat"),
        )
    )
    evl = (
        tagged.filter(F.col("split") == 2)
        .join(F.broadcast(model), "event_type")
        .join(F.broadcast(cal.select("event_type", "qhat")), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_eval"),
            F.sum((resid <= F.col("qhat")).cast("int"))
            .cast("long")
            .alias("n_inside"),
        )
    )
    return (
        model.join(cal, "event_type")
        .join(evl, "event_type")
        .select(
            "event_type",
            "n_train",
            "n_cal",
            "n_eval",
            "pred",
            "qhat",
            F.expr(
                "(2000000 * n_inside + n_eval) div (2 * n_eval)"
            ).alias("coverage_ppm"),
        )
    )


@query(
    "experiment_cumulative_lift",
    oracle="""
    WITH seen AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS d
        FROM events GROUP BY user_id
    ),
    conv AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS d
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    bounds AS (
        SELECT MIN(d) AS d0, MAX(d) AS d1 FROM seen
    ),
    grid AS (
        SELECT a.arm,
               CAST(unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY))
                    AS TIMESTAMP) AS day
        FROM bounds b CROSS JOIN (SELECT 0 AS arm UNION ALL SELECT 1) a
    ),
    seen_d AS (
        SELECT arm, d AS day, CAST(COUNT(*) AS BIGINT) AS nu
        FROM seen GROUP BY arm, d
    ),
    conv_d AS (
        SELECT arm, d AS day, CAST(COUNT(*) AS BIGINT) AS nc
        FROM conv GROUP BY arm, d
    ),
    cum AS (
        SELECT g.arm, g.day,
               CAST(SUM(COALESCE(s.nu, 0)) OVER w AS BIGINT) AS users,
               CAST(SUM(COALESCE(c.nc, 0)) OVER w AS BIGINT) AS convs
        FROM grid g
        LEFT JOIN seen_d s ON g.arm = s.arm AND g.day = s.day
        LEFT JOIN conv_d c ON g.arm = c.arm AND g.day = c.day
        WINDOW w AS (PARTITION BY g.arm ORDER BY g.day)
    ),
    t AS (SELECT day, users AS users_t, convs AS convs_t
          FROM cum WHERE arm = 1),
    c AS (SELECT day, users AS users_c, convs AS convs_c
          FROM cum WHERE arm = 0)
    SELECT t.day, t.users_t, t.convs_t, c.users_c, c.convs_c,
           CASE WHEN t.users_t = 0 OR c.users_c = 0 THEN NULL
                ELSE (2000000 * t.convs_t + t.users_t)
                         // (2 * t.users_t)
                   - (2000000 * c.convs_c + c.users_c)
                         // (2 * c.users_c)
           END AS lift_ppm
    FROM t JOIN c ON t.day = c.day
    """,
)
def experiment_cumulative_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative experiment monitor (M264): per calendar day, the
    RUNNING per-arm user and converter counts and the running
    conversion-rate lift — the "peeking dashboard" every experiment
    platform renders (and the reason sequential corrections exist:
    early days swing wildly on small cumulative denominators; this
    table is the exhibit).  Users enter at their first event, convert
    at their first purchase — both monotone, so every day's row is a
    valid photograph of the experiment so far.

    Exactness: first-seen/first-converted days from exact MIN(ts)
    day-truncation (DATE->TIMESTAMP gotcha handled); cumulative sums
    over the dense day grid; lift is a difference of half-up integer
    ppms, NULL-guarded zero denominators.  Scale: two user-keyed
    aggregates, a bounded |days|x2 grid, and cumulative windows per
    arm over |days| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    seen = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("arm"),
        F.date_trunc("day", F.min("ts")).alias("d"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            (F.col("user_id") % 2).alias("arm"),
            F.date_trunc("day", F.min("ts")).alias("d"),
        )
    )
    bounds = seen.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    arms = spark.createDataFrame([(0,), (1,)], "arm long")
    grid = (
        bounds.crossJoin(arms)
        .select(
            "arm",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    seen_d = seen.groupBy("arm", F.col("d").alias("day")).agg(
        F.count("*").cast("long").alias("nu")
    )
    conv_d = conv.groupBy("arm", F.col("d").alias("day")).agg(
        F.count("*").cast("long").alias("nc")
    )
    w = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        grid.join(seen_d, ["arm", "day"], "left")
        .join(conv_d, ["arm", "day"], "left")
        .select(
            "arm",
            "day",
            F.sum(F.coalesce(F.col("nu"), F.lit(0)))
            .over(w)
            .cast("long")
            .alias("users"),
            F.sum(F.coalesce(F.col("nc"), F.lit(0)))
            .over(w)
            .cast("long")
            .alias("convs"),
        )
    )
    t = cum.filter(F.col("arm") == 1).select(
        "day",
        F.col("users").alias("users_t"),
        F.col("convs").alias("convs_t"),
    )
    c = cum.filter(F.col("arm") == 0).select(
        "day",
        F.col("users").alias("users_c"),
        F.col("convs").alias("convs_c"),
    )
    joined = t.join(c, "day")
    return joined.select(
        "day",
        "users_t",
        "convs_t",
        "users_c",
        "convs_c",
        F.when(
            (F.col("users_t") == 0) | (F.col("users_c") == 0),
            F.lit(None).cast("long"),
        )
        .otherwise(
            F.expr(
                "(2000000 * convs_t + users_t) div (2 * users_t)"
                " - (2000000 * convs_c + users_c) div (2 * users_c)"
            )
        )
        .alias("lift_ppm"),
    )


@query(
    "mann_whitney_u",
    oracle="""
    WITH x AS (
        SELECT CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                   AS xu,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    h AS (
        SELECT xu, CAST(COUNT(*) AS BIGINT) AS t,
               CAST(SUM(g1) AS BIGINT) AS t1
        FROM x GROUP BY xu
    ),
    r AS (
        SELECT t, t1,
               2 * CAST(COALESCE(SUM(t) OVER (
                       ORDER BY xu
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) + t + 1 AS rank2
        FROM h
    ),
    a AS (
        SELECT CAST(SUM(t1) AS BIGINT) AS n1,
               CAST(SUM(t) - SUM(t1) AS BIGINT) AS n2,
               CAST(SUM(CAST(t1 AS HUGEINT) * rank2) AS HUGEINT) AS r2x1,
               CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT)
                   AS tie_t
        FROM r
    )
    SELECT n1, n2,
           CAST(r2x1 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0
               AS u1,
           CAST(r2x1 - CAST(n1 AS HUGEINT) * (n1 + 1)
                - CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
           / (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                * (CAST(n1 + n2 + 1 AS DOUBLE)
                   - CAST(tie_t AS DOUBLE)
                     / (CAST(n1 + n2 AS DOUBLE)
                        * CAST(n1 + n2 - 1 AS DOUBLE)))))
               AS z_tie
    FROM a
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (M265): do `purchase` values come
    from a stochastically larger distribution than `click` values?
    The nonparametric two-sample complement of the experiment family
    (Wilson/CUPED assume means behave; ANOVA M255 assumes normal-ish
    residuals): U depends only on ranks, so heavy tails and outliers
    — the norm for revenue-like metrics — cannot distort it.  Emits
    exact U plus the tie-corrected normal z.

    Exactness: values micro-quantized via DECIMAL(38,6) (the anova
    discipline — integral, so truncate==round); ranks of a tied group
    enter as DOUBLED average ranks (2·cum_less + t + 1, an exact
    integer — no .5 ever materializes); rank-sum and the tie term
    Σ(t³−t) accumulate in DECIMAL(38,0)/HUGEINT; u1 and z are ONE
    shared IEEE tree over those exact integers (divisions, one
    correctly-rounded sqrt) — bit-identical doubles both engines.

    Scale: ranking needs value order, but only over the DISTINCT
    value histogram — one map-side-combined groupBy(xu) whose
    cardinality is bounded by the value domain (2-dp money in
    [0, 500) → ≤5·10⁴ keys at ANY corpus size, the roc_auc_binned
    argument), then the cumulative window runs on that bounded
    histogram (documented BOUNDED_GLOBAL_WINDOW_OK entry), never on
    rows.  Final reduce is a 1-row aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    x = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        (F.col("value").cast("decimal(38,6)") * 1000000)
        .cast("long")
        .alias("xu"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("g1"),
    )
    h = x.groupBy("xu").agg(
        F.count("*").cast("long").alias("t"),
        F.sum("g1").cast("long").alias("t1"),
    )
    w = Window.orderBy("xu").rowsBetween(Window.unboundedPreceding, -1)
    r = h.select(
        "t",
        "t1",
        (
            2 * F.coalesce(F.sum("t").over(w), F.lit(0)).cast("long")
            + F.col("t")
            + 1
        ).alias("rank2"),
    )
    dec = "decimal(38,0)"
    a = r.agg(
        F.sum("t1").cast("long").alias("n1"),
        (F.sum("t") - F.sum("t1")).cast("long").alias("n2"),
        F.sum(F.col("t1").cast(dec) * F.col("rank2")).alias("r2x1"),
        F.sum(
            F.col("t").cast(dec) * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie_t"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u2x = F.col("r2x1") - F.col("n1").cast(dec) * (F.col("n1") + 1)
    var = (
        n1d
        * n2d
        / F.lit(12.0)
        * (
            (F.col("n1") + F.col("n2") + 1).cast("double")
            - F.col("tie_t").cast("double")
            / (nd * (F.col("n1") + F.col("n2") - 1).cast("double"))
        )
    )
    return a.select(
        "n1",
        "n2",
        (u2x.cast("double") / F.lit(2.0)).alias("u1"),
        (
            (u2x - F.col("n1").cast(dec) * F.col("n2")).cast("double")
            / (F.lit(2.0) * F.sqrt(var))
        ).alias("z_tie"),
    )


@query(
    "spearman_nation_segment",
    oracle="""
    WITH bal AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6)) * 1000000)
                    AS BIGINT) AS x
        FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    rev AS (
        SELECT c.c_nationkey, c.c_mktsegment,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6)) * 1000000)
                    AS BIGINT) AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, c.c_mktsegment
    ),
    g AS (
        SELECT b.x, CAST(COALESCE(r.y, 0) AS BIGINT) AS y
        FROM bal b LEFT JOIN rev r
          ON b.c_nationkey = r.c_nationkey
         AND b.c_mktsegment = r.c_mktsegment
    ),
    rk AS (
        SELECT 2 * CAST(RANK() OVER (ORDER BY x) AS BIGINT)
                 + CAST(COUNT(*) OVER (PARTITION BY x) AS BIGINT) - 1
                   AS rx,
               2 * CAST(RANK() OVER (ORDER BY y) AS BIGINT)
                 + CAST(COUNT(*) OVER (PARTITION BY y) AS BIGINT) - 1
                   AS ry
        FROM g
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rx) AS BIGINT) AS sx,
               CAST(SUM(ry) AS BIGINT) AS sy,
               CAST(SUM(rx * ry) AS BIGINT) AS sxy,
               CAST(SUM(rx * rx) AS BIGINT) AS sxx,
               CAST(SUM(ry * ry) AS BIGINT) AS syy
        FROM rk
    )
    SELECT n AS n_groups,
           CAST(n * sxy - sx * sy AS DOUBLE)
           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)) AS rho
    FROM m
    """,
)
def spearman_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation across (nation, segment) groups
    (M266): do groups whose customers hold more account balance also
    generate more order revenue?  Rank correlation — monotone
    association free of the linearity/outlier assumptions Pearson
    (`corr_matrix`) carries, the right default when group totals span
    orders of magnitude.

    Exactness: both group measures are exact micro BIGINTs (DECIMAL
    money sums), so rank order is integer order — no float compare
    anywhere in the ranking; tied groups enter as DOUBLED average
    ranks (2·RANK() + t − 1, exact integers — the mann_whitney_u
    device); all five Pearson moments over those integer ranks are
    exact BIGINTs (≤125·250² — nowhere near overflow); rho is ONE
    shared IEEE tree (a division and a correctly-rounded sqrt of
    exact-integer products) — bit-identical doubles.

    Scale: two map-side-combined aggregates sharing the (nation,
    segment) key (≤ 25·5 = 125 groups at ANY data size), a 125-row
    join, rank windows on the 125-row group table (documented
    BOUNDED_GLOBAL_WINDOW_OK entry — metadata-scale, not data-scale),
    one 1-row reduce.  The fact tables are each scanned once.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum(F.col("c_acctbal").cast("decimal(38,6)") * 1000000)
        .cast("long")
        .alias("x")
    )
    rev = (
        orders.join(
            cust.select("c_custkey", "c_nationkey", "c_mktsegment"),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)") * 1000000)
            .cast("long")
            .alias("y")
        )
    )
    g = bal.join(rev, ["c_nationkey", "c_mktsegment"], "left").select(
        "x", F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y")
    )
    rk = g.select(
        (
            2 * F.rank().over(Window.orderBy("x")).cast("long")
            + F.count("*").over(Window.partitionBy("x")).cast("long")
            - 1
        ).alias("rx"),
        (
            2 * F.rank().over(Window.orderBy("y")).cast("long")
            + F.count("*").over(Window.partitionBy("y")).cast("long")
            - 1
        ).alias("ry"),
    )
    m = rk.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("n").alias("n_groups"),
        (
            num.cast("double")
            / F.sqrt(dx.cast("double") * dy.cast("double"))
        ).alias("rho"),
    )


@query(
    "chi2_independence_rc",
    oracle="""
    WITH x AS (
        SELECT event_type AS r,
               (datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4)
                   % 7 AS c
        FROM events
    ),
    obs AS (
        SELECT r, c, CAST(COUNT(*) AS BIGINT) AS o FROM x GROUP BY r, c
    ),
    rt AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS nr FROM x GROUP BY r),
    ct AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS nc FROM x GROUP BY c),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM x),
    cells AS (
        SELECT rt.r, ct.c, rt.nr, ct.nc,
               CAST(COALESCE(obs.o, 0) AS BIGINT) AS o
        FROM rt CROSS JOIN ct
        LEFT JOIN obs ON obs.r = rt.r AND obs.c = ct.c
    ),
    terms AS (
        SELECT CAST(floor(
                   (CAST(o AS DOUBLE) * n - CAST(nr AS DOUBLE) * nc)
                   * (CAST(o AS DOUBLE) * n - CAST(nr AS DOUBLE) * nc)
                   / (CAST(n AS DOUBLE) * nr * nc)
                   * 1000000000 + 0.5) AS BIGINT) AS t_nano
        FROM cells CROSS JOIN tot
    ),
    dims AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS n_r,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS n_c,
               (SELECT n FROM tot) AS n
    )
    SELECT d.n, d.n_r, d.n_c, (d.n_r - 1) * (d.n_c - 1) AS dof,
           CAST(SUM(t.t_nano) AS BIGINT) AS chi2_nano,
           CAST(SUM(t.t_nano) AS DOUBLE) / 1000000000.0 AS chi2
    FROM terms t CROSS JOIN dims d
    GROUP BY d.n, d.n_r, d.n_c
    """,
)
def chi2_independence_rc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General r×c chi-square independence test (M274): is event TYPE
    independent of DAY-OF-WEEK?  The full contingency-table test the
    2×k `split_label_shift_chi2` (M168) special-cases — the workhorse
    behind "does metric X depend on segment Y" questions, read
    against the chi-square critical value at (r−1)(c−1) dof.

    Exactness: day-of-week from exact epoch-day arithmetic
    ((days+4) % 7 — engine-neutral; dayofweek() DIALECTS DISAGREE:
    DuckDB is 0-Sunday, Spark 1-Sunday); the test statistic is
    rewritten per cell as (o·N − r·c)²/(N·r·c) so the numerator is a
    product of exact BIGINTs entering ONE identical double tree
    (cast-before-multiply — the benford overflow discipline); each
    cell's term is nano-quantized to BIGINT BEFORE the cross-cell sum
    (order cannot move the result — anova/psi discipline).  EMPTY
    cells are densified in (a missing cell still contributes
    (r·c)²/(N·r·c) — skipping them understates χ²).

    Scale: three map-side-combined aggregates off one scan shape +
    a |r|×|c| dense grid (≤ types×7 = 35 rows) + a 1-row reduce —
    metadata-scale after the single scan, no data joins.
    """
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        F.col("event_type").alias("r"),
        (
            (
                F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
                + 4
            )
            % 7
        )
        .cast("long")
        .alias("c"),
    )
    obs = x.groupBy("r", "c").agg(F.count("*").cast("long").alias("o"))
    rt = x.groupBy("r").agg(F.count("*").cast("long").alias("nr"))
    ct = x.groupBy("c").agg(F.count("*").cast("long").alias("nc"))
    tot = x.agg(F.count("*").cast("long").alias("n"))
    cells = (
        rt.crossJoin(F.broadcast(ct))
        .join(obs, ["r", "c"], "left")
        .select(
            "r",
            "c",
            "nr",
            "nc",
            F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("o"),
        )
    )
    od = F.col("o").cast("double")
    nrd = F.col("nr").cast("double")
    num = od * F.col("n") - nrd * F.col("nc")
    t_nano = F.floor(
        num * num / (F.col("n").cast("double") * F.col("nr") * F.col("nc"))
        * 1000000000
        + F.lit(0.5)
    ).cast("long")
    terms = cells.crossJoin(F.broadcast(tot)).select(
        t_nano.alias("t_nano"), "n"
    )
    dims = (
        rt.agg(F.count("*").cast("long").alias("n_r"))
        .crossJoin(ct.agg(F.count("*").cast("long").alias("n_c")))
    )
    return (
        terms.groupBy("n")
        .agg(F.sum("t_nano").cast("long").alias("chi2_nano"))
        .crossJoin(F.broadcast(dims))
        .select(
            "n",
            "n_r",
            "n_c",
            ((F.col("n_r") - 1) * (F.col("n_c") - 1)).alias("dof"),
            "chi2_nano",
            (F.col("chi2_nano").cast("double") / F.lit(1000000000.0)).alias(
                "chi2"
            ),
        )
    )


@query(
    "uplift_by_exposure_bucket",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               (strpos('0123456789abcdef',
                       substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                   % 2 AS arm,
               CAST(count_if(event_type = 'view') AS BIGINT) AS views,
               CAST(MAX(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS converted
        FROM events GROUP BY user_id
    ),
    b AS (
        SELECT least(views, 9) AS exposure_bucket, arm, converted
        FROM per_user
    ),
    g AS (
        SELECT exposure_bucket,
               CAST(count_if(arm = 1) AS BIGINT) AS n_t,
               CAST(count_if(arm = 0) AS BIGINT) AS n_c,
               CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                    AS BIGINT) AS conv_t,
               CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                    AS BIGINT) AS conv_c
        FROM b GROUP BY exposure_bucket
    )
    SELECT exposure_bucket, n_t, n_c, conv_t, conv_c,
           CAST(CASE WHEN n_t = 0 OR n_c = 0 THEN NULL
                ELSE (2000000 * conv_t + n_t) // (2 * n_t)
                     - (2000000 * conv_c + n_c) // (2 * n_c)
                END AS BIGINT) AS uplift_ppm
    FROM g
    """,
)
def uplift_by_exposure_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift by exposure depth (M278): conversion-rate lift
    (treatment − control) within buckets of view count — the
    model-free uplift table behind targeting decisions (`
    quantile_treatment_effect` asks WHERE in the outcome distribution
    the effect lands; this asks WHO — does the treatment only move
    heavy browsers?).  Arms from the md5 user hash (the `ab_srm_check`
    assignment, so the two audits share a randomization).

    Exactness: exposure bucket = least(views, 9) — exact integers, no
    quantile estimation (engine-neutral, and at 100 TB the bucket
    boundaries don't drift with data); per-bucket half-up ppm rates
    via the house integer identity (2·10⁶·x + n) div (2n); degenerate
    one-arm buckets emit NULL rather than a fake 0 lift.

    Scale: one user-keyed map-side-combined aggregate, then a
    ≤10-key reduce — the per-user table never leaves its shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "view").cast("long").alias("views"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("converted"),
    ).select(
        (
            (
                F.instr(
                    F.lit("0123456789abcdef"),
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
                )
                - 1
            )
            % 2
        ).alias("arm"),
        F.least(F.col("views"), F.lit(9)).alias("exposure_bucket"),
        "converted",
    )
    g = per_user.groupBy("exposure_bucket").agg(
        F.count_if(F.col("arm") == 1).cast("long").alias("n_t"),
        F.count_if(F.col("arm") == 0).cast("long").alias("n_c"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_t"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_c"),
    )
    return g.select(
        "exposure_bucket",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.when(
            (F.col("n_t") == 0) | (F.col("n_c") == 0), F.lit(None)
        )
        .otherwise(
            F.expr("(2000000 * conv_t + n_t) div (2 * n_t)")
            - F.expr("(2000000 * conv_c + n_c) div (2 * n_c)")
        )
        .cast("long")
        .alias("uplift_ppm"),
    )


@query(
    "concurrency_curve",
    oracle="""
    WITH sess AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               date_trunc('hour', MIN(ts)) AS h_start,
               date_trunc('hour', MAX(ts)) + INTERVAL 1 HOUR AS h_end
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    deltas AS (
        SELECT h_start AS h, CAST(1 AS BIGINT) AS delta FROM sess
        UNION ALL
        SELECT h_end AS h, CAST(-1 AS BIGINT) AS delta FROM sess
    ),
    dsum AS (SELECT h, CAST(SUM(delta) AS BIGINT) AS dd
             FROM deltas GROUP BY h),
    bounds AS (
        SELECT MIN(h_start) AS h0, MAX(h_end) AS h1 FROM sess
    ),
    grid AS (
        SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds
    )
    SELECT g.h AS hour_start,
           CAST(SUM(COALESCE(d.dd, 0)) OVER (
               ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS active_sessions
    FROM grid g LEFT JOIN dsum d ON d.h = g.h
    """,
)
def concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-session concurrency curve (M279): how many user-day
    sessions are simultaneously open at each hour — the capacity/
    provisioning read (peak concurrency sizes connection pools and
    executor fleets) and the classic INTERVAL-STABBING aggregate that
    naive SQL answers with an O(|intervals|·|hours|) range join.

    The scalable shape is the sweep-line identity: each interval
    contributes +1 at its start hour and −1 after its end hour;
    concurrency at h is the running sum of deltas — turning the range
    join into ONE grouped aggregate plus a cumulative over the hour
    GRID (the `gap_fill_hourly` sequence+explode grid, so empty hours
    report the correct carried count rather than vanishing).

    Exactness: all counts exact BIGINTs; hour bucketing by
    date_trunc; session bounds from exact MIN/MAX(ts).  Scale: the
    delta aggregate is |hours|-keyed and map-side combined; the
    cumulative window runs on the |hours|-row grid (documented
    BOUNDED_GLOBAL_WINDOW_OK entry — the acf_hourly_lags pattern),
    never on intervals.
    """
    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.date_trunc("hour", F.min("ts")).alias("h_start"),
        (F.date_trunc("hour", F.max("ts")) + F.expr("INTERVAL 1 HOUR")).alias(
            "h_end"
        ),
    )
    deltas = sess.select(
        F.col("h_start").alias("h"), F.lit(1).cast("long").alias("delta")
    ).unionAll(
        sess.select(
            F.col("h_end").alias("h"), F.lit(-1).cast("long").alias("delta")
        )
    )
    dsum = deltas.groupBy("h").agg(F.sum("delta").cast("long").alias("dd"))
    grid = (
        sess.agg(
            F.min("h_start").alias("h0"), F.max("h_end").alias("h1")
        )
        .select(
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h")
        )
    )
    w = Window.orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(dsum, "h", "left")
        .select("h", F.coalesce(F.col("dd"), F.lit(0)).alias("dd"))
        .select(
            F.col("h").alias("hour_start"),
            F.sum("dd").over(w).cast("long").alias("active_sessions"),
        )
    )


@query(
    "windowed_count_distinct",
    oracle="""
    WITH x AS (
        SELECT DISTINCT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               user_id
        FROM events
    ),
    days AS (SELECT DISTINCT event_type, d FROM x)
    SELECT dd.event_type, dd.d AS day,
           (SELECT CAST(COUNT(DISTINCT x2.user_id) AS BIGINT) FROM x x2
             WHERE x2.event_type = dd.event_type AND x2.d = dd.d)
               AS active_users,
           (SELECT CAST(COUNT(DISTINCT x3.user_id) AS BIGINT) FROM x x3
             WHERE x3.event_type = dd.event_type AND x3.d <= dd.d)
               AS cum_distinct_users
    FROM days dd
    """,
)
def windowed_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered window (M286): per
    event type and day, distinct users that day AND distinct users
    EVER SEEN up to that day — the cumulative-reach curve every
    growth dashboard draws.  Spark's window functions REJECT
    DISTINCT aggregates outright, so this implements the standard
    scalable rewrite: a user contributes to the cumulative count only
    on their FIRST day (per type), so running-distinct == running SUM
    of first-appearance counts — turning an unbounded distinct-state
    window into an additive cumulative over the |days| grid.

    The oracle formulates it INDEPENDENTLY (correlated
    COUNT(DISTINCT) subqueries — the O(days²) semantics spelled out
    directly), so the hash proves the rewrite, not just the
    arithmetic.

    Scale: first-day = one (type, user)-keyed MIN reduce; daily news
    = a (type, day)-keyed count; the cumulative runs PARTITIONED per
    type over |days| rows.  The O(N·days) state the naive window
    would hold never exists.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        "user_id",
    ).distinct()
    active = x.groupBy("event_type", "d").agg(
        F.countDistinct("user_id").cast("long").alias("active_users")
    )
    first = x.groupBy("event_type", "user_id").agg(F.min("d").alias("fd"))
    news = first.groupBy("event_type", F.col("fd").alias("d")).agg(
        F.count("*").cast("long").alias("n_new")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        active.join(news, ["event_type", "d"], "left")
        .select(
            "event_type",
            "d",
            "active_users",
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        )
        .select(
            "event_type",
            F.col("d").alias("day"),
            "active_users",
            F.sum("n_new").over(w).cast("long").alias("cum_distinct_users"),
        )
    )


@query(
    "impute_group_median",
    oracle="""
    WITH x AS (
        SELECT event_type, event_id,
               CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
                         IN ('0', '1')
                    THEN NULL
                    ELSE CAST(CAST(value AS DECIMAL(38,6)) * 1000000
                              AS BIGINT)
               END AS vu
        FROM events
    ),
    ranked AS (
        SELECT event_type, vu,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY vu, event_id) AS rn,
               COUNT(vu) OVER (PARTITION BY event_type) AS n_obs
        FROM x WHERE vu IS NOT NULL
    ),
    med AS (
        SELECT event_type, CAST(vu AS BIGINT) AS med_micro
        FROM ranked WHERE rn = (n_obs + 1) // 2
    )
    SELECT x.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(count_if(x.vu IS NULL) AS BIGINT) AS n_imputed,
           m.med_micro,
           CAST(SUM(COALESCE(x.vu, m.med_micro)) AS BIGINT)
               AS sum_micro_after
    FROM x JOIN med m ON x.event_type = m.event_type
    GROUP BY x.event_type, m.med_micro
    """,
)
def impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation audit (M287): fill missing metric
    values with their group's LOWER MEDIAN and account for every
    imputation — the feature-engineering repair step run before any
    trainer that can't eat NULLs (median, not mean, because the
    imputed value must be robust to the same tails `mad_outliers`
    guards).  The fixture has no nulls, so an md5-keyed knockout
    (~1/8 of events — the M199 stand-in pattern) provides ground
    truth.

    Exactness: lower median = the ⌈n/2⌉-th smallest non-null,
    selected by the EXPLICIT rank formulation rn == (n+1) div 2 with
    (value, event_id) tie-break — integer div (the verify-skill
    pitfall: Spark `/` is float division), no interpolation, so the
    imputed value is an exact micro BIGINT and the post-impute sum is
    exact integer arithmetic with a hashable value.

    Scale: the rank window is PARTITIONED by group (data-scale but
    per-key ordered — the sessionize shape); the |types|-row median
    table broadcasts back onto one scan-shaped aggregate.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        "event_id",
        F.when(
            F.expr(
                "substr(md5(CAST(event_id AS STRING)), 1, 1) IN ('0', '1')"
            ),
            F.lit(None),
        )
        .otherwise(
            (F.col("value").cast("decimal(38,6)") * 1000000).cast("long")
        )
        .alias("vu"),
    )
    obs = x.filter(F.col("vu").isNotNull())
    wkey = Window.partitionBy("event_type")
    ranked = obs.select(
        "event_type",
        "vu",
        F.row_number()
        .over(wkey.orderBy("vu", "event_id"))
        .alias("rn"),
        F.count("vu").over(wkey).alias("n_obs"),
    )
    med = ranked.filter(
        F.col("rn") == F.expr("(n_obs + 1) div 2")
    ).select("event_type", F.col("vu").cast("long").alias("med_micro"))
    return (
        x.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med_micro")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.count_if(F.col("vu").isNull()).cast("long").alias("n_imputed"),
            F.sum(F.coalesce(F.col("vu"), F.col("med_micro")))
            .cast("long")
            .alias("sum_micro_after"),
        )
        .select(
            "event_type",
            "n_rows",
            "n_imputed",
            "med_micro",
            "sum_micro_after",
        )
    )


@query(
    "session_gap_sweep",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS gap_us
        FROM events
    ),
    th AS (SELECT unnest([600, 1800, 3600]) AS threshold_s)
    SELECT th.threshold_s,
           CAST(count_if(g.gap_us IS NULL
                         OR g.gap_us > CAST(th.threshold_s AS BIGINT) * 1000000)
                AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST((2000000 * COUNT(*)
                 + count_if(g.gap_us IS NULL
                            OR g.gap_us > CAST(th.threshold_s AS BIGINT) * 1000000))
                // (2 * count_if(g.gap_us IS NULL
                                 OR g.gap_us > CAST(th.threshold_s AS BIGINT) * 1000000))
                AS BIGINT) AS events_per_session_ppm
    FROM gaps g CROSS JOIN th
    GROUP BY th.threshold_s
    """,
)
def session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session idle-gap sweep (M288): session counts (and mean events
    per session) at 10/30/60-minute inactivity thresholds — the knob
    table behind `sessionize`'s gap parameter (the committed threshold
    is a policy; this is the curve the policy debate reads: a count
    that halves between 10 and 30 minutes says the corpus has a
    bimodal dwell pattern the single knob is splitting).

    The sweep computes the per-user LAG gap ONCE (exact epoch-µs
    integers, event_id tie-break) and evaluates all three thresholds
    against that one column — a session START under threshold t is
    simply gap IS NULL OR gap > t, so n_sessions needs no per-
    threshold re-sessionization, no session ids, no second window.

    Scale: one user-partitioned window exchange (the `sessionize`
    shuffle), a 3-row literal broadcast, one |thresholds|-keyed
    map-side-combined aggregate.  Exactness: µs integers, exact
    counts, half-up ppm division at output only.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")), F.col("event_id")
    )
    gaps = ev.select(
        (
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(w)
        ).alias("gap_us")
    )
    th = spark.createDataFrame(
        [(600,), (1800,), (3600,)], ["threshold_s"]
    )
    started = F.count_if(
        F.col("gap_us").isNull()
        | (F.col("gap_us") > F.col("threshold_s") * 1000000)
    )
    return (
        gaps.crossJoin(F.broadcast(th))
        .groupBy("threshold_s")
        .agg(
            started.cast("long").alias("n_sessions"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            "threshold_s",
            "n_sessions",
            "n_events",
            F.expr(
                "CAST((2000000 * n_events + n_sessions)"
                " div (2 * n_sessions) AS BIGINT)"
            ).alias("events_per_session_ppm"),
        )
    )


@query(
    "fd_discovery_audit",
    oracle="""
    SELECT 'customer' AS tbl, 'c_custkey' AS lhs, 'c_nationkey' AS rhs,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_lhs,
           CAST(COUNT(DISTINCT (c_custkey, c_nationkey)) AS BIGINT)
               AS n_pairs,
           CAST(COUNT(DISTINCT c_custkey)
                = COUNT(DISTINCT (c_custkey, c_nationkey)) AS INT)
               AS fd_holds
    FROM customer
    UNION ALL
    SELECT 'customer', 'c_nationkey', 'c_mktsegment',
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
           CAST(COUNT(DISTINCT (c_nationkey, c_mktsegment)) AS BIGINT),
           CAST(COUNT(DISTINCT c_nationkey)
                = COUNT(DISTINCT (c_nationkey, c_mktsegment)) AS INT)
    FROM customer
    UNION ALL
    SELECT 'orders', 'o_custkey', 'o_orderpriority',
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT (o_custkey, o_orderpriority)) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey)
                = COUNT(DISTINCT (o_custkey, o_orderpriority)) AS INT)
    FROM orders
    UNION ALL
    SELECT 'nation', 'n_nationkey', 'n_regionkey',
           CAST(COUNT(DISTINCT n_nationkey) AS BIGINT),
           CAST(COUNT(DISTINCT (n_nationkey, n_regionkey)) AS BIGINT),
           CAST(COUNT(DISTINCT n_nationkey)
                = COUNT(DISTINCT (n_nationkey, n_regionkey)) AS INT)
    FROM nation
    """,
)
def fd_discovery_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery audit (M290): does A → B hold?
    — the data-profiling primitive (Metanome/Tane family, public)
    behind normalization advice, key detection, and join-safety checks
    (an FD that 'mostly' holds is the classic silently-denormalized
    table).  The test is the exact counting identity:
    A → B  ⟺  |distinct A| == |distinct (A,B)|, evaluated here over
    four declared candidates spanning a true key FD, a PK-to-attr FD,
    and two deliberately failing ones (so the fixture exercises both
    verdicts).

    Scale: each candidate is ONE two-phase distinct aggregate (the
    `distinct_exact` shape — partial distinct map-side, exact
    global); candidates run independently and union 4 metadata rows.
    At 100 TB profiling sweeps batch many candidates over one scan
    per table exactly like this.  Exactness: all counts exact
    BIGINTs; the verdict an integer equality flag.
    """

    def probe(tbl: str, lhs: str, rhs: str) -> DataFrame:
        t = load_table(spark, sf_dir, tbl)
        return t.agg(
            F.countDistinct(lhs).cast("long").alias("n_lhs"),
            F.countDistinct(lhs, rhs).cast("long").alias("n_pairs"),
        ).select(
            F.lit(tbl).alias("tbl"),
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            "n_lhs",
            "n_pairs",
            (F.col("n_lhs") == F.col("n_pairs")).cast("int").alias(
                "fd_holds"
            ),
        )

    return (
        probe("customer", "c_custkey", "c_nationkey")
        .unionByName(probe("customer", "c_nationkey", "c_mktsegment"))
        .unionByName(probe("orders", "o_custkey", "o_orderpriority"))
        .unionByName(probe("nation", "n_nationkey", "n_regionkey"))
    )


@query(
    "hierarchy_subtree_rollup",
    oracle="""
    WITH anc AS (
        SELECT DISTINCT c_custkey,
               c_custkey // (CAST(1 AS BIGINT) << (3 * j)) AS node
        FROM customer, unnest(range(0, 12)) u(j)
    ),
    bal AS (
        SELECT c_custkey,
               CAST(CAST(c_acctbal AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                   AS bu
        FROM customer
    )
    SELECT a.node,
           CAST(COUNT(*) AS BIGINT) AS n_subtree,
           CAST(SUM(b.bu) AS BIGINT) AS subtree_bal_micro
    FROM anc a JOIN bal b ON a.c_custkey = b.c_custkey
    WHERE a.node < 64
    GROUP BY a.node
    """,
)
def hierarchy_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtree rollup (M291): per ancestor node of an
    8-ary key hierarchy (parent(k) = k div 8 — an org chart / category
    tree / account hierarchy stand-in), the size and total balance of
    its ENTIRE subtree — the org-rollup query a recursive CTE answers
    on small data and kills clusters on big data (per-level self-joins
    = depth × shuffle of the full table).

    The scalable rewrite: a node's ancestor list is CLOSED-FORM
    (k div 8^j, j = 0..11 — covering 8¹² ≈ 7·10¹³ keys), so every row
    expands map-side into ≤12 (row, ancestor) pairs and ONE aggregate
    produces every subtree total — the classic hierarchy
    denormalization, zero iterative joins, zero recursion (contrast
    `recursive_cte_walk`, which exists to exercise the iterative
    form).  Reported for the top of the tree (node < 64 — the two
    root levels), so output is bounded metadata.

    Exactness: ancestors by integer shifts (1<<3j — BIGINT, no float
    pow); DISTINCT de-dupes the repeating root 0; DECIMAL money
    micro-sums.  Scale: map-side explode ×12 + one (node)-keyed
    map-side-combined aggregate; no joins between data-scale tables
    (the acctbal join below is a self-equijoin the optimizer collapses
    onto the same scan shape).
    """
    cust = load_table(spark, sf_dir, "customer")
    anc = (
        cust.select(
            "c_custkey",
            F.explode(F.sequence(F.lit(0), F.lit(11))).alias("j"),
        )
        .select(
            "c_custkey",
            F.expr(
                "c_custkey div shiftleft(CAST(1 AS BIGINT), 3 * j)"
            ).alias("node"),
        )
        .distinct()
    )
    bal = cust.select(
        "c_custkey",
        (F.col("c_acctbal").cast("decimal(38,6)") * 1000000)
        .cast("long")
        .alias("bu"),
    )
    return (
        anc.filter(F.col("node") < 64)
        .join(bal, "c_custkey")
        .groupBy("node")
        .agg(
            F.count("*").cast("long").alias("n_subtree"),
            F.sum("bu").cast("long").alias("subtree_bal_micro"),
        )
    )


@query(
    "json_key_coverage",
    oracle="""
    WITH inj AS (
        SELECT event_type,
               CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
                         IN ('0', '1', '2', '3')
                    THEN replace(props, '}', ', "exp_variant": 2}')
                    ELSE props
               END AS p
        FROM events
    ),
    keys AS (
        SELECT event_type,
               unnest(json_keys(p)) AS key,
               (SELECT COUNT(*) FROM inj i2
                 WHERE i2.event_type = inj.event_type) AS n_type
        FROM inj
    )
    SELECT event_type, key,
           CAST(COUNT(*) AS BIGINT) AS n_present,
           CAST((2000000 * COUNT(*) + MAX(n_type))
                // (2 * MAX(n_type)) AS BIGINT) AS coverage_ppm
    FROM keys GROUP BY event_type, key
    """,
)
def json_key_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON key-coverage audit (M292): per event type, every top-level
    payload key with its presence count and coverage — schema
    INFERENCE over semi-structured payloads, the drift detector run
    before `json_extract_agg`-style consumers hard-code a path (a key
    at 25% coverage is a producer rollout in progress; a key that
    drops from 100% is a breaking change upstream).  Fixture payloads
    carry one stable key, so an md5-keyed injected variant key
    (~1/4 of events — the experiment-rollout pattern) gives the audit
    both a full-coverage and a partial-coverage key per type.

    Parity: key enumeration via each engine's native JSON key
    function (Spark json_object_keys vs DuckDB json_keys — both
    RFC-8259 top-level); the injection is literal string surgery,
    valid JSON by construction; counts exact, coverage the half-up
    ppm identity.

    Scale: map-only parse fused with the scan, explode by ≤|keys|,
    one (type, key)-keyed map-side-combined aggregate joined to the
    |types|-row totals broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    inj = ev.select(
        "event_type",
        F.when(
            F.expr(
                "substr(md5(CAST(event_id AS STRING)), 1, 1)"
                " IN ('0', '1', '2', '3')"
            ),
            F.replace(
                F.col("props"), F.lit("}"), F.lit(', "exp_variant": 2}')
            ),
        )
        .otherwise(F.col("props"))
        .alias("p"),
    )
    totals = inj.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_type")
    )
    keys = inj.select(
        "event_type",
        F.explode(F.expr("json_object_keys(p)")).alias("key"),
    )
    return (
        keys.groupBy("event_type", "key")
        .agg(F.count("*").cast("long").alias("n_present"))
        .join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "key",
            "n_present",
            F.expr(
                "CAST((2000000 * n_present + n_type)"
                " div (2 * n_type) AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


@query(
    "frequency_cap_waste",
    oracle="""
    WITH per_ud AS (
        SELECT event_type, user_id, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, user_id, CAST(ts AS DATE)
    )
    SELECT event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_user_days,
           CAST(SUM(greatest(n - 3, 0)) AS BIGINT) AS capped_events,
           CAST((2000000 * SUM(greatest(n - 3, 0)) + SUM(n))
                // (2 * SUM(n)) AS BIGINT) AS waste_ppm
    FROM per_ud GROUP BY event_type
    """,
)
def frequency_cap_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-cap waste audit (M293): per event type, how many
    events land BEYOND a 3-per-user-per-day cap — the adtech/
    notification accounting that prices a capping policy before it
    ships (capped_events is exactly the volume a cap-3 enforcement
    would suppress; waste_ppm is the spend share it saves).  The same
    shape prices API rate limits and push-fatigue rules.

    Exactness: everything is exact integer counting — the
    (type, user, day) histogram, the per-cell overage max(n−3, 0),
    and the half-up ppm at output.  Scale: ONE map-side-combined
    aggregate on (type, user, day) — the `sessionize`-grade shuffle —
    then a |types|-keyed reduce of the cell table; no windows, no
    joins.
    """
    ev = load_table(spark, sf_dir, "events")
    per_ud = ev.groupBy(
        "event_type", "user_id", F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("long").alias("n"))
    return per_ud.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_user_days"),
        F.sum(F.greatest(F.col("n") - 3, F.lit(0)))
        .cast("long")
        .alias("capped_events"),
        F.expr(
            "CAST((2000000 * SUM(greatest(n - 3, 0)) + SUM(n))"
            " div (2 * SUM(n)) AS BIGINT)"
        ).alias("waste_ppm"),
    )


@query(
    "kpi_delta_decomposition",
    oracle="""
    WITH p AS (
        SELECT CAST(count_if(o_orderdate >= TIMESTAMP '1996-01-01'
                             AND o_orderdate < TIMESTAMP '1997-01-01')
                    AS BIGINT) AS n1,
               CAST(count_if(o_orderdate >= TIMESTAMP '1997-01-01'
                             AND o_orderdate < TIMESTAMP '1998-01-01')
                    AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                              AND o_orderdate < TIMESTAMP '1997-01-01'
                             THEN CAST(CAST(o_totalprice AS DECIMAL(38,6))
                                       * 1000000 AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS s1,
               CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                              AND o_orderdate < TIMESTAMP '1998-01-01'
                             THEN CAST(CAST(o_totalprice AS DECIMAL(38,6))
                                       * 1000000 AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS s2
        FROM orders
    )
    SELECT n1, n2, s1, s2,
           CAST(s2 - s1 AS BIGINT) AS delta_micro,
           CAST(n2 - n1 AS DOUBLE)
           * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              + CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / 2.0
               AS volume_effect_micro,
           (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
           * CAST(n1 + n2 AS DOUBLE) / 2.0 AS rate_effect_micro
    FROM p
    """,
)
def kpi_delta_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI delta decomposition (M297): split the 1996→1997 revenue
    change into a VOLUME effect (order count moved) and a RATE effect
    (value per order moved) using the symmetric midpoint (Bennet)
    decomposition: Δrev = Δn·p̄ + n̄·Δp with p̄, n̄ the period
    midpoints — the "why did the metric move" arithmetic every metric
    tree / diagnosis layer runs, exact by construction (the two
    effects sum to Δrev ALGEBRAICALLY, no residual term to hide
    attribution in — property-pinned to fp tolerance).

    Exactness: period counts and micro sums exact BIGINTs off ONE
    conditional scan; the two effects are shared IEEE trees over
    those integers (each period mean ONE division).

    Scale: one map-side-combined 1-row aggregate — the cheapest
    query in the registry family; the same decomposition nests per
    segment by adding a GROUP BY.
    """
    o = load_table(spark, sf_dir, "orders")
    in1 = (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    in2 = (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    mu = (F.col("o_totalprice").cast("decimal(38,6)") * 1000000).cast("long")
    p = o.agg(
        F.count_if(in1).cast("long").alias("n1"),
        F.count_if(in2).cast("long").alias("n2"),
        F.sum(F.when(in1, mu).otherwise(0)).cast("long").alias("s1"),
        F.sum(F.when(in2, mu).otherwise(0)).cast("long").alias("s2"),
    )
    p1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    p2 = F.col("s2").cast("double") / F.col("n2").cast("double")
    return p.select(
        "n1",
        "n2",
        "s1",
        "s2",
        (F.col("s2") - F.col("s1")).cast("long").alias("delta_micro"),
        (
            (F.col("n2") - F.col("n1")).cast("double")
            * (p1 + p2)
            / F.lit(2.0)
        ).alias("volume_effect_micro"),
        (
            (p2 - p1)
            * (F.col("n1") + F.col("n2")).cast("double")
            / F.lit(2.0)
        ).alias("rate_effect_micro"),
    )


@query(
    "dispersion_index_check",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(n) AS BIGINT) AS s,
               CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS q
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n_days, s AS n_events,
           (CAST(n_days AS DOUBLE) * CAST(q AS DOUBLE)
            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
           / (CAST(n_days - 1 AS DOUBLE) * CAST(n_days AS DOUBLE))
           / (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
               AS dispersion_vmr,
           CAST((CAST(n_days AS DOUBLE) * CAST(q AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                / (CAST(n_days - 1 AS DOUBLE) * CAST(n_days AS DOUBLE))
                / (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
                > 1.5 AS INT) AS overdispersed
    FROM m WHERE n_days > 1
    """,
)
def dispersion_index_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson dispersion index per event type (M298): the
    variance-to-mean ratio of DAILY event counts — the one-number
    arrival-process diagnostic (a Poisson feed has VMR ≈ 1;
    VMR ≫ 1 means bursty/clumped arrivals, so every rate alert and
    capacity forecast built on Poisson assumptions — including
    `anomalous_hours`' z-scores — needs wider bands; VMR ≪ 1 means a
    rate-limited/scheduled producer).

    Exactness: the daily histogram and its (n, Σ, Σ²) moments are
    exact integers (HUGEINT/DECIMAL for the squares); the sample
    variance n·Q − S² numerator is formed cast-before-multiply
    (benford discipline) and the VMR is ONE shared IEEE tree; the
    flag compares those identical doubles.

    Scale: a (type, day)-keyed map-side-combined count, then a
    |types|-keyed moment reduce — |types|·|days| intermediate rows,
    metadata-scale.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").cast("long").alias("n")
    )
    dec = "decimal(38,0)"
    m = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("s"),
        F.sum(F.col("n").cast(dec) * F.col("n")).alias("q"),
    )
    var = (
        F.col("n_days").cast("double") * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    ) / (
        (F.col("n_days") - 1).cast("double")
        * F.col("n_days").cast("double")
    )
    vmr = var / (F.col("s").cast("double") / F.col("n_days").cast("double"))
    return m.filter(F.col("n_days") > 1).select(
        "event_type",
        "n_days",
        F.col("s").alias("n_events"),
        vmr.alias("dispersion_vmr"),
        (vmr > F.lit(1.5)).cast("int").alias("overdispersed"),
    )


@query(
    "burst_rate_audit",
    oracle="""
    WITH per_sec AS (
        SELECT event_type, user_id, date_trunc('second', ts) AS sec,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, user_id, date_trunc('second', ts)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_user_seconds,
           CAST(MAX(n) AS BIGINT) AS max_burst,
           CAST(count_if(n >= 3) AS BIGINT) AS burst_cells,
           CAST(SUM(CASE WHEN n >= 3 THEN n ELSE 0 END) AS BIGINT)
               AS burst_events
    FROM per_sec GROUP BY event_type
    """,
)
def burst_rate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst-rate audit (M299): per event type, how many
    (user, second) cells carry ≥3 events and the worst single-second
    burst — the bot/replay/retry-storm screen every telemetry intake
    runs (humans don't emit 3 purchases in one second; SDK retry
    loops and scrapers do), and the sizing input for any
    token-bucket rate limit (max_burst IS the bucket depth that
    would have passed all real traffic).

    Exactness: pure exact integer counting on second-truncated
    timestamps — no windows over raw rows, no self-joins on time.
    Scale: ONE (type, user, second)-keyed map-side-combined count
    (bursts collapse map-side by construction — the cell count is
    bounded by active user-seconds, not events), then a |types|-key
    reduce.
    """
    ev = load_table(spark, sf_dir, "events")
    per_sec = ev.groupBy(
        "event_type", "user_id", F.date_trunc("second", "ts").alias("sec")
    ).agg(F.count("*").cast("long").alias("n"))
    return per_sec.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_user_seconds"),
        F.max("n").cast("long").alias("max_burst"),
        F.count_if(F.col("n") >= 3).cast("long").alias("burst_cells"),
        F.sum(F.when(F.col("n") >= 3, F.col("n")).otherwise(0))
        .cast("long")
        .alias("burst_events"),
    )


@query(
    "bandit_replay_eval",
    oracle="""
    WITH train AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY user_id, event_type
    ),
    policy AS (
        SELECT user_id,
               max(struct_pack(n := n, t := event_type))['t'] AS rec
        FROM train GROUP BY user_id
    ),
    ev AS (
        SELECT e.user_id, e.event_type,
               CASE WHEN e.value >= 100 THEN 1 ELSE 0 END AS reward,
               CASE WHEN e.event_type = p.rec THEN 1 ELSE 0 END
                   AS matched
        FROM events e JOIN policy p ON e.user_id = p.user_id
        WHERE e.ts >= TIMESTAMP '2024-01-15 00:00:00'
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(matched) AS BIGINT) AS n_matched,
           CAST((2000000 * SUM(CASE WHEN matched = 1 THEN reward
                                    ELSE 0 END) + SUM(matched))
                // (2 * SUM(matched)) AS BIGINT) AS policy_value_ppm,
           CAST((2000000 * SUM(reward) + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS baseline_value_ppm
    FROM ev
    """,
)
def bandit_replay_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline bandit replay evaluation (M305): score a
    recommendation policy ("serve each user their historically most
    frequent event type") WITHOUT deploying it, by the replay method
    (Li et al. 2011, public): on held-out traffic, keep only the
    events where the logged action happens to equal the policy's
    action and average their reward — an unbiased estimate of the
    policy's online value when logging is uniform.  The table reads
    policy value vs the log's baseline value — the offline gate every
    recsys change passes before an A/B slot.

    Leakage discipline: the policy is fit strictly on pre-01-15
    traffic and evaluated strictly after (the `leakage_safe_split`
    rule); the argmax is a (count, type) struct max — deterministic
    tie-break, identical lexicographic semantics in both engines.

    Exactness: rewards and matches are integer flags (the value
    threshold compares the same double both sides); both value
    estimates are half-up ppm integer identities.  Scale: one
    (user, type) train aggregate → per-user struct-max (map-side
    combinable) → broadcast-joined onto the eval scan, 1-row reduce.
    """
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    train = (
        ev.filter(F.col("ts") < cut)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    policy = train.groupBy("user_id").agg(
        F.max(F.struct(F.col("n"), F.col("event_type")))
        .getField("event_type")
        .alias("rec")
    )
    scored = (
        ev.filter(F.col("ts") >= cut)
        .join(policy, "user_id")
        .select(
            F.when(F.col("value") >= 100, 1).otherwise(0).alias("reward"),
            F.when(F.col("event_type") == F.col("rec"), 1)
            .otherwise(0)
            .alias("matched"),
        )
    )
    return scored.agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum("matched").cast("long").alias("n_matched"),
        F.expr(
            "CAST((2000000 * SUM(CASE WHEN matched = 1 THEN reward"
            " ELSE 0 END) + SUM(matched)) div (2 * SUM(matched))"
            " AS BIGINT)"
        ).alias("policy_value_ppm"),
        F.expr(
            "CAST((2000000 * SUM(reward) + COUNT(*)) div (2 * COUNT(*))"
            " AS BIGINT)"
        ).alias("baseline_value_ppm"),
    )


@query(
    "max_drawdown_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(CAST(value AS DECIMAL(38,6))
                                       * 1000000 AS BIGINT)
                             ELSE -CAST(CAST(value AS DECIMAL(38,6))
                                        * 1000000 AS BIGINT)
                        END) AS BIGINT) AS flow
        FROM events WHERE event_type IN ('purchase', 'error')
        GROUP BY 1
    ),
    cum AS (
        SELECT d,
               CAST(SUM(flow) OVER (
                   ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS c
        FROM daily
    ),
    dd AS (
        SELECT d, c,
               CAST(MAX(c) OVER (
                   ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS peak
        FROM cum
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(peak) AS BIGINT) AS peak_cum_micro,
           CAST(MAX(peak - c) AS BIGINT) AS max_drawdown_micro
    FROM dd
    """,
)
def max_drawdown_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily net-value series (M307): treat
    purchase value as inflow and error-event value as outflow, build
    the cumulative daily series, and report the worst peak-to-trough
    decline — the risk statistic behind every equity-curve /
    burn-rate dashboard (`twap_user_value` prices the series, OHLC
    M277 bars it; this measures its worst sustained reversal), and a
    windowed-aggregate composition (running sum, then running max OF
    that, then max gap) plain aggregates cannot express.

    Exactness: daily flows are exact micro BIGINTs (DECIMAL sums);
    cumulative, running peak, and drawdown are all integer
    arithmetic — no floats anywhere.

    Scale: one day-keyed map-side-combined aggregate, then BOTH
    windows run over the |days| grid (documented
    BOUNDED_GLOBAL_WINDOW_OK entry — the acf_hourly_lags pattern);
    final 1-row reduce.  The raw event table never meets a window.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    mu = (F.col("value").cast("decimal(38,6)") * 1000000).cast("long")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", mu).otherwise(-mu)
        )
        .cast("long")
        .alias("flow")
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "d", F.sum("flow").over(w).cast("long").alias("c")
    )
    dd = cum.select(
        "c", F.max("c").over(w).cast("long").alias("peak")
    )
    return dd.agg(
        F.count("*").cast("long").alias("n_days"),
        F.max("peak").cast("long").alias("peak_cum_micro"),
        F.max(F.col("peak") - F.col("c"))
        .cast("long")
        .alias("max_drawdown_micro"),
    )


@query(
    "lateness_horizon_audit",
    oracle="""
    WITH arr AS (
        SELECT event_type, user_id, epoch_us(ts) AS tus,
               MAX(epoch_us(ts)) OVER (
                   PARTITION BY user_id
                   ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS seen_max
        FROM events
    ),
    late AS (
        SELECT event_type,
               greatest(seen_max - tus, 0) AS late_us
        FROM arr
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(count_if(late_us > 0) AS BIGINT) AS out_of_order,
           CAST(count_if(late_us > 60 * 1000000) AS BIGINT)
               AS later_than_1m,
           CAST(count_if(late_us > 3600 * CAST(1000000 AS BIGINT))
                AS BIGINT) AS later_than_1h,
           CAST(MAX(late_us) AS BIGINT) AS max_late_us
    FROM late GROUP BY event_type
    """,
)
def lateness_horizon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order lateness audit (M310): per event type, how far
    behind the per-user high-water mark events arrive (arrival order
    = event_id, the log sequence) — THE empirical input for sizing
    `withWatermark` in every K-family streaming query (a watermark
    shorter than the observed lateness horizon silently drops the
    `later_than_*` rows this table counts; one longer than needed
    holds state for nothing).  The streaming ops here use 24h-grade
    delays — this audit is how that number gets defended.

    Exactness: lateness = max(0, running-max(epoch_µs) − epoch_µs),
    all exact integers; threshold counts and max are exact.

    Scale: ONE user-partitioned running-max window (the `sessionize`
    exchange — per-key ordered, data-scale but partitioned), then a
    |types|-keyed map-side-combined aggregate.  No self-joins on
    time, no global anything.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tus = F.unix_micros(F.col("ts"))
    arr = ev.select(
        "event_type",
        F.greatest(
            F.max(tus).over(w) - tus, F.lit(0).cast("long")
        ).alias("late_us"),
    )
    return arr.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count_if(F.col("late_us") > 0).cast("long").alias("out_of_order"),
        F.count_if(F.col("late_us") > 60 * 1000000)
        .cast("long")
        .alias("later_than_1m"),
        F.count_if(F.col("late_us") > 3600 * 1000000)
        .cast("long")
        .alias("later_than_1h"),
        F.max("late_us").cast("long").alias("max_late_us"),
    )


@query(
    "digest_collision_risk",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
    SELECT n_docs,
           CAST(n_docs AS DOUBLE) * CAST(n_docs - 1 AS DOUBLE)
           / 36893488147419103232.0 AS p_collision_64,
           CAST(n_docs AS DOUBLE) * CAST(n_docs - 1 AS DOUBLE)
           / 6.805647338418769e38 AS p_collision_128,
           CAST(CAST(n_docs AS DOUBLE) * CAST(n_docs - 1 AS DOUBLE)
                / 36893488147419103232.0 > 1e-9 AS INT)
               AS need_128_at_1ppb
    FROM n
    """,
)
def digest_collision_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest collision-risk table (M311): the birthday bound
    p ≈ n(n−1)/2^(b+1) for 64- vs 128-bit content digests at the
    CURRENT corpus size — the one-row justification for
    `dedup_hash`'s 128-bit digests (at 10¹¹ documents a 64-bit digest
    collides with near-certainty — p caps at 1 — silently MERGING two
    distinct documents, the worst dedup failure mode because it
    deletes real data; 128 bits keeps p below 1e-15).  The
    need_128_at_1ppb flag operationalizes it: rerun per ingest, alarm
    when the corpus outgrows the narrow digest.

    Exactness: n exact; the bounds are ONE shared IEEE tree each —
    a product of exact-integer-derived doubles and a LITERAL
    power-of-two divisor (2⁶⁵ exactly representable; the 2¹²⁹
    literal is the correctly-rounded double both engines parse
    identically from the same decimal text).

    Scale: a 1-row count — the cheapest possible audit, run per
    ingest batch.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    nd = F.col("n_docs").cast("double")
    p64 = nd * (F.col("n_docs") - 1).cast("double") / F.lit(
        36893488147419103232.0
    )
    p128 = nd * (F.col("n_docs") - 1).cast("double") / F.lit(
        6.805647338418769e38
    )
    return n.select(
        "n_docs",
        p64.alias("p_collision_64"),
        p128.alias("p_collision_128"),
        (p64 > F.lit(1e-9)).cast("int").alias("need_128_at_1ppb"),
    )


@query(
    "conditional_quantile_profile",
    oracle="""
    SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(value, 0.5), 6) AS p50_value,
           ROUND(quantile_cont(value, 0.9), 6) AS p90_value
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def conditional_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional quantile profile (M312): median and p90 purchase
    value BY HOUR OF DAY — the distribution-seasonality view a mean
    profile (`events_hourly`) hides entirely (a flat hourly mean with
    a swinging p90 means the evening tail is heavy — pricing,
    fraud-threshold, and capacity decisions read the QUANTILE
    profile, not the mean).  The conditional-distribution cousin of
    `mad_outliers` (same exact-percentile machinery, keyed on a
    derived time bucket instead of the type).

    Parity: exact interpolated percentiles (Spark `percentile` vs
    DuckDB `quantile_cont` — the `mad_outliers`-established pairing)
    rounded at 6 dp; hour bucketing is exact integer extraction.

    Scale: ONE hour-of-day-keyed exact-percentile aggregate (24
    groups at any data size); Spark's percentile is a sort-based
    per-group aggregate — data-scale work but perfectly partitioned,
    no window, no join.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return ev.groupBy(
        F.hour("ts").cast("int").alias("hour_of_day")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50_value"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_value"),
    )


@query(
    "trend_fit_quality",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_per_day,
           (CAST(n * sxy - sx * sy AS DOUBLE)
            * CAST(n * sxy - sx * sy AS DOUBLE))
           / (CAST(n * sxx - sx * sx AS DOUBLE)
              * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
    FROM m WHERE n > 1
    """,
)
def trend_fit_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS trend fit QUALITY per event type (M313): the daily-count
    slope together with R² — `per_type_trend_slopes` reports the
    direction, this reports whether the line EXPLAINS anything (a
    slope with R² = 0.05 is noise a dashboard shouldn't annotate;
    the robust cross-check is `theil_sen_trend`).  R² for simple OLS
    is the squared Pearson correlation, so both numbers come from
    the same five moments.

    Exactness: day indices and daily counts exact integers; all five
    moments exact HUGEINT/DECIMAL; slope and R² are shared IEEE
    trees over those integers (cast-before-multiply — the benford
    discipline), each a ratio of exact-integer-derived doubles.

    Scale: a (type, day)-keyed map-side count, then a |types|-keyed
    moment reduce — metadata-scale, no window (the trend family's
    established shape).
    """
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)"
        ).alias("x"),
    ).agg(F.count("*").cast("long").alias("y"))
    m = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.filter(F.col("n") > 1).select(
        "event_type",
        F.col("n").alias("n_days"),
        (num.cast("double") / dx.cast("double")).alias("slope_per_day"),
        (
            (num.cast("double") * num.cast("double"))
            / (dx.cast("double") * dy.cast("double"))
        ).alias("r2"),
    )


@query(
    "p99_regression_probe",
    oracle="""
    WITH base AS (
        SELECT event_type, value FROM events
        WHERE ts < TIMESTAMP '2024-01-24 00:00:00'
    ),
    recent AS (
        SELECT event_type, value FROM events
        WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'
    )
    SELECT b.event_type,
           ROUND(quantile_cont(b.value, 0.99), 6) AS p99_baseline,
           (SELECT ROUND(quantile_cont(r.value, 0.99), 6)
            FROM recent r WHERE r.event_type = b.event_type)
               AS p99_recent,
           CAST((SELECT ROUND(quantile_cont(r.value, 0.99), 6)
                 FROM recent r WHERE r.event_type = b.event_type)
                > 1.2 * ROUND(quantile_cont(b.value, 0.99), 6) AS INT)
               AS regressed_20pct
    FROM base b GROUP BY b.event_type
    """,
)
def p99_regression_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-latency regression probe (M316): p99 of the metric over
    the most recent week vs the preceding baseline, with a >20%
    regression flag — the SRE alert shape for latency/cost tails
    (means hide tail regressions entirely; a p99 alert fires on the
    experience the slowest 1% actually get).  The windows are fixed
    calendar splits, so the probe is reproducible and the flag is a
    pure function of the data.

    Parity: both percentiles ROUND(…, 6) of the established exact
    interpolated pairing, and the flag compares those ROUNDED values
    (never the raw doubles) — the rank-on-rounded-score discipline.

    Scale: two |types|-keyed exact-percentile aggregates over
    complementary scan ranges (both push their date predicate to the
    scan), joined on |types| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-24 00:00:00").cast("timestamp")
    base = (
        ev.filter(F.col("ts") < cut)
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.99)"), 6).alias(
                "p99_baseline"
            )
        )
    )
    recent = (
        ev.filter(F.col("ts") >= cut)
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.99)"), 6).alias(
                "p99_recent"
            )
        )
    )
    return base.join(F.broadcast(recent), "event_type").select(
        "event_type",
        "p99_baseline",
        "p99_recent",
        (F.col("p99_recent") > 1.2 * F.col("p99_baseline"))
        .cast("int")
        .alias("regressed_20pct"),
    )


@query(
    "weekpart_seasonality",
    oracle="""
    WITH x AS (
        SELECT event_type,
               CASE WHEN (datediff('day', DATE '1970-01-01',
                                   CAST(ts AS DATE)) + 4) % 7 IN (0, 6)
                    THEN 1 ELSE 0 END AS is_weekend
        FROM events
    ),
    g AS (
        SELECT event_type,
               CAST(count_if(is_weekend = 1) AS BIGINT) AS n_weekend,
               CAST(count_if(is_weekend = 0) AS BIGINT) AS n_weekday
        FROM x GROUP BY event_type
    )
    SELECT event_type, n_weekend, n_weekday,
           CAST((2000000 * CAST(n_weekend AS HUGEINT) * 5
                 + CAST(n_weekday AS HUGEINT) * 2)
                // (2 * CAST(n_weekday AS HUGEINT) * 2) AS BIGINT)
               AS weekend_rate_ratio_ppm
    FROM g
    """,
)
def weekpart_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend/weekday seasonality ratio (M317): per event type, the
    DAILY-RATE ratio between weekend and weekday traffic (counts
    normalized by 2 weekend vs 5 weekday days — comparing raw counts
    would understate weekends 2.5×) — the first seasonality question
    every capacity plan and anomaly baseline asks, and the input that
    decides whether `anomalous_hours`-style alerts need separate
    weekend baselines (ratio far from 1e6 ppm ⇒ yes).

    Exactness: day-of-week from the exact epoch-day arithmetic of
    M274 ((days+4)%7 — Sunday=0/Saturday=6; dayofweek() dialects
    disagree); the normalized ratio is the half-up identity on
    cross-multiplied HUGEINT/DECIMAL counts — rate_we/rate_wd =
    (n_we/2)/(n_wd/5) = 5·n_we/(2·n_wd), all integer.

    Scale: map-only flagging + one |types|-keyed map-side aggregate.
    """
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    dow = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) + 4
    ) % 7
    x = ev.select(
        "event_type",
        F.when(dow.isin(0, 6), 1).otherwise(0).alias("is_weekend"),
    )
    g = x.groupBy("event_type").agg(
        F.count_if(F.col("is_weekend") == 1)
        .cast("long")
        .alias("n_weekend"),
        F.count_if(F.col("is_weekend") == 0)
        .cast("long")
        .alias("n_weekday"),
    )
    return g.select(
        "event_type",
        "n_weekend",
        "n_weekday",
        F.expr(
            f"CAST((2000000 * CAST(n_weekend AS {dec}) * 5"
            f" + CAST(n_weekday AS {dec}) * 2)"
            f" div (2 * CAST(n_weekday AS {dec}) * 2) AS BIGINT)"
        ).alias("weekend_rate_ratio_ppm"),
    )


@query(
    "ratio_metric_delta_var",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               (strpos('0123456789abcdef',
                       substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                   % 2 AS arm,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(CAST(value AS DECIMAL(38,6))
                                       * 100 AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        FROM per_user GROUP BY arm
    ),
    d AS (
        SELECT arm, n,
               CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
               CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
               CAST(syy AS DOUBLE) AS syyd, CAST(sxy AS DOUBLE) AS sxyd
        FROM m
    )
    SELECT arm, n,
           sxd / syd AS ratio_cents,
           ((sxxd - sxd * sxd / nd)
            + (sxd / syd) * (sxd / syd) * (syyd - syd * syd / nd)
            - 2.0 * (sxd / syd) * (sxyd - sxd * syd / nd))
           / ((nd - 1.0) * nd * (syd / nd) * (syd / nd)) AS var_delta
    FROM d
    """,
)
def ratio_metric_delta_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method variance for a RATIO metric (M319): revenue per
    EVENT (Σx/Σy across users) per experiment arm, with the
    linearization variance Var(R̂) ≈ (σ²_x + R²σ²_y − 2Rσ_xy)/(n·ȳ²)
    — the experimentation workhorse for ratio metrics, where the
    naive per-user-average variance is simply WRONG (the denominator
    is random too; ignoring its covariance with the numerator is the
    classic ratio-metric trap `ab_test_metrics`' count metrics don't
    hit).  Same md5 arms as `ab_srm_check`/M278, so the experiment
    audits share a randomization.

    Exactness: per-user (x, y) exact integers with money at CENTS
    (exact for the 2-dp domain) — deliberately NOT micro: Σx² must
    stay below 2⁶³ before its double cast, because DuckDB's
    HUGEINT→double conversion DOUBLE-ROUNDS above 2⁶³ (measured
    2-ulp drift building this query — a new entry in the float-
    parity rulebook); every moment is cast to double ONCE and the
    ratio/variance are pure-double shared trees after that.

    Scale: one user-keyed map-side aggregate, then a 2-arm moment
    reduce; nothing but 2 rows leaves the shuffle.
    """
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                (F.col("value").cast("decimal(38,6)") * 100).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("x"),
        F.count("*").cast("long").alias("y"),
    ).select(
        (
            (
                F.instr(
                    F.lit("0123456789abcdef"),
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
                )
                - 1
            )
            % 2
        ).alias("arm"),
        "x",
        "y",
    )
    m = per_user.groupBy("arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
    )
    # pure-double tree: every moment cast to double ONCE, then only
    # double x double ops in one canonical order — mixed double x
    # HUGEINT binary ops round differently between engines (measured
    # 2-ulp drift building this query)
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    syyd = F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    r = sxd / syd
    cx = sxxd - sxd * sxd / nd
    cy = syyd - syd * syd / nd
    cxy = sxyd - sxd * syd / nd
    var = (cx + r * r * cy - F.lit(2.0) * r * cxy) / (
        (nd - F.lit(1.0)) * nd * (syd / nd) * (syd / nd)
    )
    return m.select(
        "arm", "n", r.alias("ratio_cents"), var.alias("var_delta")
    )


@query(
    "ab_sample_size_table",
    oracle="""
    WITH p AS (
        SELECT CAST(count_if(event_type = 'purchase') AS BIGINT) AS conv,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
    ),
    mde AS (SELECT unnest([0.01, 0.02, 0.05]) AS delta),
    base AS (
        SELECT CAST(conv AS DOUBLE) / CAST(n AS DOUBLE) AS p0, mde.delta
        FROM p CROSS JOIN mde
    )
    SELECT delta AS mde_abs,
           p0 AS baseline_rate,
           CAST(ceil(
               (1.959964 + 0.841621) * (1.959964 + 0.841621)
               * (p0 * (1.0 - p0)
                  + (p0 + delta) * (1.0 - p0 - delta))
               / (delta * delta)) AS BIGINT) AS n_per_arm
    FROM base
    """,
)
def ab_sample_size_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size table (M320): users per arm needed to detect a
    +1/+2/+5-point absolute lift on the observed baseline conversion
    rate at α=5% (two-sided), power 80% — the planning table every
    experiment review starts from, computed from the standard
    two-proportion formula n = (z_{α/2}+z_β)²·(p₀q₀+p₁q₁)/δ²,
    anchored to the CORPUS's actual baseline (not a guessed one).

    Parity: the normal quantiles are PRECOMPUTED LITERALS (1.959964,
    0.841621 — the dp_noisy_release/DCG-weights rule: libm never
    runs in a hashed path); the baseline rate is one division of
    exact counts; n_per_arm is a shared IEEE tree closed by ceil —
    and ceil of identical doubles is identical (a boundary hit would
    need the tree to land EXACTLY on an integer, impossible here
    with irrational z² factors).

    Scale: a 1-row conditional count × a 3-row literal sweep — audit
    cost, run per planning meeting.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.agg(
        F.count_if(F.col("event_type") == "purchase")
        .cast("long")
        .alias("conv"),
        F.count("*").cast("long").alias("n"),
    )
    mde = spark.createDataFrame(
        [(0.01,), (0.02,), (0.05,)], "delta double"
    )
    base = p.crossJoin(F.broadcast(mde)).select(
        (F.col("conv").cast("double") / F.col("n").cast("double")).alias(
            "p0"
        ),
        "delta",
    )
    z2 = (F.lit(1.959964) + F.lit(0.841621)) * (
        F.lit(1.959964) + F.lit(0.841621)
    )
    n_arm = F.ceil(
        z2
        * (
            F.col("p0") * (F.lit(1.0) - F.col("p0"))
            + (F.col("p0") + F.col("delta"))
            * (F.lit(1.0) - F.col("p0") - F.col("delta"))
        )
        / (F.col("delta") * F.col("delta"))
    ).cast("long")
    return base.select(
        F.col("delta").alias("mde_abs"),
        F.col("p0").alias("baseline_rate"),
        n_arm.alias("n_per_arm"),
    )


@query(
    "hourly_peak_detection",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    nb AS (
        SELECT h, n,
               LAG(n) OVER (ORDER BY h) AS prev_n,
               LEAD(n) OVER (ORDER BY h) AS next_n
        FROM hourly
    ),
    peaks AS (
        SELECT h, n,
               CAST(n - greatest(prev_n, next_n) AS BIGINT) AS prominence
        FROM nb
        WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
          AND n > prev_n AND n > next_n
    )
    SELECT CAST((SELECT COUNT(*) FROM hourly) AS BIGINT) AS n_hours,
           CAST(COUNT(*) AS BIGINT) AS n_peaks,
           CAST(count_if(prominence >= 5) AS BIGINT) AS n_prominent,
           CAST(COALESCE(MAX(prominence), 0) AS BIGINT)
               AS max_prominence
    FROM peaks
    """,
)
def hourly_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly peak detection (M323): strict local maxima of the
    hourly event-count series with their prominence over the higher
    neighbor — the spike census behind alert-threshold tuning (every
    peak the detector finds here is an alert a naive
    threshold-on-count rule would or wouldn't have fired on;
    `anomalous_hours` asks which hours are extreme GLOBALLY, this
    asks which are extreme LOCALLY — flash events that never cross a
    global percentile).

    Exactness: counts and prominences exact integers; a strict
    (n > both neighbors) predicate has no tie ambiguity.

    Scale: the lag/lead windows run over the HOURLY aggregate (the
    acf_hourly_lags pattern — |hours| rows post-aggregate, documented
    BOUNDED_GLOBAL_WINDOW_OK entry), then a 1-row reduce.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.orderBy("h")
    nb = hourly.select(
        "h",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lead("n").over(w).alias("next_n"),
    )
    peaks = nb.filter(
        F.col("prev_n").isNotNull()
        & F.col("next_n").isNotNull()
        & (F.col("n") > F.col("prev_n"))
        & (F.col("n") > F.col("next_n"))
    ).select(
        (F.col("n") - F.greatest("prev_n", "next_n"))
        .cast("long")
        .alias("prominence")
    )
    n_hours = hourly.agg(F.count("*").cast("long").alias("n_hours"))
    return peaks.agg(
        F.count("*").cast("long").alias("n_peaks"),
        F.count_if(F.col("prominence") >= 5)
        .cast("long")
        .alias("n_prominent"),
        F.coalesce(F.max("prominence"), F.lit(0))
        .cast("long")
        .alias("max_prominence"),
    ).crossJoin(F.broadcast(n_hours)).select(
        "n_hours", "n_peaks", "n_prominent", "max_prominence"
    )


@query(
    "topk_concentration_ratio",
    oracle="""
    WITH per_user AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id
    ),
    top10 AS (
        SELECT n FROM per_user ORDER BY n DESC, user_id LIMIT 10
    )
    SELECT CAST((SELECT COUNT(*) FROM per_user) AS BIGINT) AS n_users,
           CAST((SELECT SUM(n) FROM top10) AS BIGINT) AS top10_events,
           CAST((SELECT SUM(n) FROM per_user) AS BIGINT) AS total_events,
           CAST((2000000 * (SELECT SUM(n) FROM top10)
                 + (SELECT SUM(n) FROM per_user))
                // (2 * (SELECT SUM(n) FROM per_user)) AS BIGINT)
               AS cr10_ppm
    FROM per_user LIMIT 1
    """,
)
def topk_concentration_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 concentration ratio (M324): the share of all events
    produced by the 10 heaviest users — the CR-k concentration
    number from industrial-organization economics, here the
    abuse/dependency screen (a CR-10 of 40% means ten accounts can
    move every aggregate metric; bot farms and scrapers show up here
    before they show up anywhere else).  The scalar headline over
    `join_key_skew_profile`'s per-key detail and the discrete cousin
    of `revenue_lorenz_curve`.

    Exactness: exact counts; the share is the half-up ppm identity;
    top-10 selection tie-broken by user_id.

    Scale: one user-keyed map-side count, TakeOrderedAndProject(10)
    (per-partition heaps), a 1-row total — no sort, no window.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n")
    )
    top10 = (
        per_user.orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
        .agg(F.sum("n").cast("long").alias("top10_events"))
    )
    tot = per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("n").cast("long").alias("total_events"),
    )
    return tot.crossJoin(F.broadcast(top10)).select(
        "n_users",
        "top10_events",
        "total_events",
        F.expr(
            "CAST((2000000 * top10_events + total_events)"
            " div (2 * total_events) AS BIGINT)"
        ).alias("cr10_ppm"),
    )


@query(
    "aa_test_null_check",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               (strpos('0123456789abcdef',
                       substr(md5('aa|' || CAST(user_id AS VARCHAR)),
                              1, 1)) - 1) % 2 AS arm,
               CAST(MAX(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS converted
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT CAST(count_if(arm = 0) AS BIGINT) AS n_a,
               CAST(count_if(arm = 1) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                    AS BIGINT) AS conv_a,
               CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                    AS BIGINT) AS conv_b
        FROM per_user
    )
    SELECT n_a, n_b, conv_a, conv_b,
           CAST((2000000 * conv_b + n_b) // (2 * n_b)
                - (2000000 * conv_a + n_a) // (2 * n_a) AS BIGINT)
               AS null_lift_ppm,
           CAST(abs((2000000 * conv_b + n_b) // (2 * n_b)
                    - (2000000 * conv_a + n_a) // (2 * n_a))
                < 100000 AS INT) AS within_10pct
    FROM g
    """,
)
def aa_test_null_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A null test (M325): split users by a FRESH salted hash
    ('aa|' prefix — deliberately a different randomization than the
    live `ab_srm_check` assignment) into two arms that received
    IDENTICAL treatment, and measure the 'lift' — which is pure
    noise.  The experimentation-platform health check run before
    trusting any real readout: a large null lift means the
    assignment hash is correlated with behavior, the metric pipeline
    leaks, or the variance model lies (and every downstream p-value
    with it).  The salt matters: re-using the live hash would test
    the same split twice, not the platform.

    Exactness: exact counts, half-up ppm rates, integer lift; the
    within flag restates the integer comparison.

    Scale: one user-keyed map-side aggregate + a 1-row reduce — the
    cheapest possible platform check, run continuously in practice.
    """
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("converted")
        )
        .select(
            (
                (
                    F.instr(
                        F.lit("0123456789abcdef"),
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit("aa|"),
                                    F.col("user_id").cast("string"),
                                )
                            ),
                            1,
                            1,
                        ),
                    )
                    - 1
                )
                % 2
            ).alias("arm"),
            "converted",
        )
        .agg(
            F.count_if(F.col("arm") == 0).cast("long").alias("n_a"),
            F.count_if(F.col("arm") == 1).cast("long").alias("n_b"),
            F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
            .cast("long")
            .alias("conv_a"),
            F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
            .cast("long")
            .alias("conv_b"),
        )
    )
    lift = F.expr(
        "(2000000 * conv_b + n_b) div (2 * n_b)"
        " - (2000000 * conv_a + n_a) div (2 * n_a)"
    )
    return g.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        lift.cast("long").alias("null_lift_ppm"),
        (F.abs(lift) < 100000).cast("int").alias("within_10pct"),
    )


@query(
    "midnight_boundary_artifact",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS prev_us
        FROM events
    ),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN prev_us IS NULL
                         OR epoch_us(ts) - prev_us
                            > 1800 * CAST(1000000 AS BIGINT)
                    THEN 1 ELSE 0 END AS new_sess
        FROM ordered
    ),
    sess AS (
        SELECT user_id,
               SUM(new_sess) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sid,
               ts
        FROM flagged
    ),
    spans AS (
        SELECT user_id, sid,
               CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
        FROM sess GROUP BY user_id, sid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(count_if(d0 <> d1) AS BIGINT) AS n_cross_midnight,
           CAST((2000000 * count_if(d0 <> d1) + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS cross_ppm
    FROM spans
    """,
)
def midnight_boundary_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Midnight boundary artifact audit (M326): how many 30-minute-gap
    sessions SPAN a calendar-day boundary — the share of real user
    journeys that any day-partitioned metric (DAU, daily funnels,
    M279's user-DAY concurrency sessions) silently cuts in half.
    Above a few percent, day-keyed session metrics need timezone- or
    4am-anchored day boundaries instead of midnight — this table is
    that decision's evidence.

    Exactness: sessionization is the exact µs-integer lag-gap rule
    with id tie-break (the `sessionize` semantics at a 30-min gap);
    the span test compares exact DATE truncations; counts and the
    share exact integers.

    Scale: one user-partitioned exchange serves the lag AND the
    session-id cumulative (same partitioning — the sessionize plan
    shape), then a (user, sid)-keyed min/max reduce and a 1-row
    total.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")), F.col("event_id")
    )
    tus = F.unix_micros(F.col("ts"))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag(tus).over(wu).isNull()
            | ((tus - F.lag(tus).over(wu)) > 1800 * 1000000),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("new_sess")
        .over(wu.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sid"),
    )
    spans = sess.groupBy("user_id", "sid").agg(
        F.to_date(F.min("ts")).alias("d0"),
        F.to_date(F.max("ts")).alias("d1"),
    )
    return spans.agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.count_if(F.col("d0") != F.col("d1"))
        .cast("long")
        .alias("n_cross_midnight"),
        F.expr(
            "CAST((2000000 * count_if(d0 <> d1) + COUNT(*))"
            " div (2 * COUNT(*)) AS BIGINT)"
        ).alias("cross_ppm"),
    )


@query(
    "stratified_att_estimate",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               (strpos('0123456789abcdef',
                       substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                   % 2 AS t,
               least(CAST(count_if(event_type = 'view') AS BIGINT), 4)
                   AS stratum,
               CAST(MAX(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT stratum,
               CAST(count_if(t = 1) AS BIGINT) AS nt,
               CAST(count_if(t = 0) AS BIGINT) AS nc,
               CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT)
                   AS yt,
               CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT)
                   AS yc
        FROM per_user GROUP BY stratum
    ),
    kept AS (SELECT * FROM s WHERE nt > 0 AND nc > 0),
    terms AS (
        SELECT stratum, nt,
               CAST(floor(1000000.0 * nt
                    * (CAST(yt AS DOUBLE) / nt - CAST(yc AS DOUBLE) / nc)
                    + 0.5) AS BIGINT) AS w_diff_micro
        FROM kept
    )
    SELECT CAST(SUM(nt) AS BIGINT) AS n_treated,
           CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(w_diff_micro) AS BIGINT) AS att_num_micro,
           CAST(SUM(w_diff_micro) AS DOUBLE) / SUM(nt) / 1000000.0
               AS att
    FROM terms
    """,
)
def stratified_att_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified ATT estimator (M332): the average treatment effect
    on the TREATED, estimated by exact stratification on the
    confounder (view-count stratum, capped at 4): within each
    stratum compare treated vs control conversion, then weight the
    differences by the TREATED counts — the textbook
    subclassification estimator (Cochran 1968, public) that
    `uplift_by_exposure_bucket` displays per-bucket and this query
    correctly AGGREGATES (the weighting is where naive averages go
    wrong: weighting by total counts estimates ATE, by treated
    counts ATT — the difference IS the estimand).  One-arm strata
    are dropped (off-support — the positivity violation made
    explicit).

    Exactness: each stratum's weighted difference is one double tree
    over exact integers, micro-quantized BEFORE the cross-stratum
    sum (the anova/psi discipline); the final ATT is one division of
    exact BIGINTs.

    Scale: one user-keyed aggregate → ≤5-row stratum table → 1-row
    reduce.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.least(
            F.count_if(F.col("event_type") == "view").cast("long"),
            F.lit(4),
        ).alias("stratum"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    ).select(
        (
            (
                F.instr(
                    F.lit("0123456789abcdef"),
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
                )
                - 1
            )
            % 2
        ).alias("t"),
        "stratum",
        "y",
    )
    s = per_user.groupBy("stratum").agg(
        F.count_if(F.col("t") == 1).cast("long").alias("nt"),
        F.count_if(F.col("t") == 0).cast("long").alias("nc"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("yt"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("yc"),
    )
    kept = s.filter((F.col("nt") > 0) & (F.col("nc") > 0))
    w_diff = F.floor(
        F.lit(1000000.0)
        * F.col("nt")
        * (
            F.col("yt").cast("double") / F.col("nt")
            - F.col("yc").cast("double") / F.col("nc")
        )
        + F.lit(0.5)
    ).cast("long")
    terms = kept.select("nt", w_diff.alias("w_diff_micro"))
    return terms.agg(
        F.sum("nt").cast("long").alias("n_treated"),
        F.count("*").cast("long").alias("n_strata"),
        F.sum("w_diff_micro").cast("long").alias("att_num_micro"),
        (
            F.sum("w_diff_micro").cast("double")
            / F.sum("nt")
            / F.lit(1000000.0)
        ).alias("att"),
    )


@query(
    "median_ci_order_stats",
    oracle="""
    WITH x AS (
        SELECT event_type, event_id,
               CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                   AS vu
        FROM events
    ),
    ranked AS (
        SELECT event_type, vu,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY vu, event_id
               ) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n
        FROM x
    ),
    bounds AS (
        SELECT event_type, n,
               CAST(greatest(floor((CAST(n AS DOUBLE)
                    - 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2.0), 1)
                    AS BIGINT) AS lo_rn,
               (n + 1) // 2 AS med_rn
        FROM ranked GROUP BY event_type, n
    )
    SELECT r.event_type, b.n,
           CAST(MAX(CASE WHEN r.rn = b.lo_rn THEN r.vu END) AS BIGINT)
               AS ci_lo_micro,
           CAST(MAX(CASE WHEN r.rn = b.med_rn THEN r.vu END) AS BIGINT)
               AS median_micro,
           CAST(MAX(CASE WHEN r.rn = b.n - b.lo_rn + 1 THEN r.vu END)
                AS BIGINT) AS ci_hi_micro
    FROM ranked r JOIN bounds b ON r.event_type = b.event_type
    GROUP BY r.event_type, b.n
    """,
)
def median_ci_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free median CI via order statistics (M335): the
    ~95% confidence interval for each group's median is simply the
    values at ranks (n ∓ z√n)/2 — the binomial order-statistic
    construction that needs NO distributional assumption and NO
    bootstrap resampling (`bootstrap_mean_ci` resamples 32 times for
    the MEAN; this reads two ranks once for the MEDIAN — at 100 TB
    the 32× cost difference is the whole decision).

    Exactness: rank selection is exact integer arithmetic except the
    z√n bound — one double tree with a literal z whose floor cannot
    straddle a boundary (z√n is irrational for non-square n; square
    n would need z√n/2 integral — impossible with irrational z);
    values at ranks are exact micro BIGINTs via the (value, id)
    tie-broken row_number, the `impute_group_median` formulation.

    Scale: one rank window PARTITIONED by group + a |types|-row
    bound table joined back — the per-group-ordered shape shared by
    the whole median family here.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        "event_id",
        (F.col("value").cast("decimal(38,6)") * 1000000)
        .cast("long")
        .alias("vu"),
    )
    wkey = Window.partitionBy("event_type")
    ranked = x.select(
        "event_type",
        "vu",
        F.row_number()
        .over(wkey.orderBy("vu", "event_id"))
        .cast("long")
        .alias("rn"),
        F.count("*").over(wkey).cast("long").alias("n"),
    )
    bounds = ranked.groupBy("event_type", "n").agg(
        F.greatest(
            F.floor(
                (
                    F.col("n").cast("double")
                    - F.lit(1.959964)
                    * F.sqrt(F.col("n").cast("double"))
                )
                / F.lit(2.0)
            ),
            F.lit(1).cast("long"),
        )
        .cast("long")
        .alias("lo_rn"),
        F.expr("(n + 1) div 2").alias("med_rn"),
    )
    j = ranked.join(F.broadcast(bounds), ["event_type", "n"])
    return j.groupBy("event_type", "n").agg(
        F.max(F.when(F.col("rn") == F.col("lo_rn"), F.col("vu")))
        .cast("long")
        .alias("ci_lo_micro"),
        F.max(F.when(F.col("rn") == F.col("med_rn"), F.col("vu")))
        .cast("long")
        .alias("median_micro"),
        F.max(
            F.when(
                F.col("rn") == F.col("n") - F.col("lo_rn") + 1,
                F.col("vu"),
            )
        )
        .cast("long")
        .alias("ci_hi_micro"),
    )


@query(
    "trailing_zscore_anomalies",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    wstats AS (
        SELECT h, n,
               CAST(COUNT(n) OVER w AS BIGINT) AS wn,
               CAST(SUM(n) OVER w AS BIGINT) AS ws,
               CAST(SUM(CAST(n AS HUGEINT) * n) OVER w AS HUGEINT) AS wq
        FROM hourly
        WINDOW w AS (ORDER BY h ROWS BETWEEN 24 PRECEDING
                                         AND 1 PRECEDING)
    ),
    z AS (
        SELECT h, n, wn,
               (CAST(n AS DOUBLE) - CAST(ws AS DOUBLE) / wn)
               / sqrt((CAST(wn AS DOUBLE) * CAST(wq AS DOUBLE)
                       - CAST(ws AS DOUBLE) * CAST(ws AS DOUBLE))
                      / (CAST(wn AS DOUBLE) * CAST(wn - 1 AS DOUBLE)))
                   AS zval
        FROM wstats WHERE wn >= 12
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_scored_hours,
           CAST(count_if(abs(zval) > 3.0) AS BIGINT) AS n_anomalies,
           ROUND(MAX(abs(zval)), 6) AS max_abs_z
    FROM z
    """,
)
def trailing_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomalies (M345): each hour scored
    against the PRIOR 24 hours' mean/std (≥12 observed required) —
    the production form of rate alerting that `anomalous_hours`'
    global z cannot be: a global baseline never adapts, so a
    week-long level shift permanently poisons it, while the trailing
    window recovers in a day (and M298's dispersion index says how
    wide these bands must really be).

    Exactness: window moments (count, sum, sum-of-squares) are exact
    integers accumulated by frame; z is one shared IEEE tree per
    hour (sample variance n·Q−S² cast-before-multiply); the anomaly
    count compares identical doubles against a literal, max |z|
    ROUND(,6).

    Scale: the trailing frame runs over the HOURLY aggregate
    (documented BOUNDED_GLOBAL_WINDOW_OK entry — acf pattern,
    |hours| rows); raw events never meet a window.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").cast("long").alias("n")
    )
    dec = "decimal(38,0)"
    w = Window.orderBy("h").rowsBetween(-24, -1)
    wstats = hourly.select(
        "h",
        "n",
        F.count("n").over(w).cast("long").alias("wn"),
        F.sum("n").over(w).cast("long").alias("ws"),
        F.sum(F.col("n").cast(dec) * F.col("n")).over(w).alias("wq"),
    ).filter(F.col("wn") >= 12)
    zval = (
        F.col("n").cast("double")
        - F.col("ws").cast("double") / F.col("wn")
    ) / F.sqrt(
        (
            F.col("wn").cast("double") * F.col("wq").cast("double")
            - F.col("ws").cast("double") * F.col("ws").cast("double")
        )
        / (F.col("wn").cast("double") * (F.col("wn") - 1).cast("double"))
    )
    z = wstats.select(zval.alias("zval"))
    return z.agg(
        F.count("*").cast("long").alias("n_scored_hours"),
        F.count_if(F.abs(F.col("zval")) > 3.0)
        .cast("long")
        .alias("n_anomalies"),
        F.round(F.max(F.abs(F.col("zval"))), 6).alias("max_abs_z"),
    )


@query(
    "iv_wald_estimator",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               (strpos('0123456789abcdef',
                       substr(md5('iv|' || CAST(user_id AS VARCHAR)),
                              1, 1)) - 1) % 2 AS z,
               CAST(CASE WHEN count_if(event_type = 'click') >= 2
                         THEN 1 ELSE 0 END AS BIGINT) AS d,
               CAST(MAX(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT CAST(count_if(z = 1) AS BIGINT) AS n1,
               CAST(count_if(z = 0) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN z = 1 THEN y ELSE 0 END) AS BIGINT)
                   AS y1,
               CAST(SUM(CASE WHEN z = 0 THEN y ELSE 0 END) AS BIGINT)
                   AS y0,
               CAST(SUM(CASE WHEN z = 1 THEN d ELSE 0 END) AS BIGINT)
                   AS d1,
               CAST(SUM(CASE WHEN z = 0 THEN d ELSE 0 END) AS BIGINT)
                   AS d0
        FROM per_user
    )
    SELECT n1, n0,
           CAST(y1 * n0 - y0 * n1 AS BIGINT) AS itt_y_num,
           CAST(d1 * n0 - d0 * n1 AS BIGINT) AS itt_d_num,
           CASE WHEN d1 * n0 - d0 * n1 = 0 THEN NULL
                ELSE CAST(y1 * n0 - y0 * n1 AS DOUBLE)
                     / CAST(d1 * n0 - d0 * n1 AS DOUBLE)
           END AS wald_late
    FROM g
    """,
)
def iv_wald_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variable Wald estimator (M346): the LATE =
    ITT-on-outcome / ITT-on-takeup ratio — the encouragement-design
    estimator (Angrist-Imbens-Rubin, public) for when the TREATMENT
    (here 'clicked at least twice', a behavior) cannot be randomized but an
    ENCOURAGEMENT (the salted md5 instrument) can: users don't
    comply perfectly, and naive treated-vs-untreated comparison is
    confounded by WHO chooses to click — the Wald ratio rescales the
    clean intent-to-treat contrast by the compliance contrast
    instead.  Completes the causal shelf: stratified ATT (M332)
    handles OBSERVED confounding, this handles UNOBSERVED
    confounding given an instrument.

    Exactness: both ITT contrasts are cross-multiplied exact
    integers (y1·n0 − y0·n1 — no per-arm division before the
    ratio), so the only float op is the final division; both
    numerators ride in the hash alongside it.

    Scale: one user-keyed aggregate + a 1-row reduce.  (Fixture
    note: the md5 'instrument' is independent of behavior, so the
    true LATE is ~0/0-noise — the ESTIMATOR's arithmetic is what
    the oracle pins, and the property test asserts only identities,
    not effect size.)
    """
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.groupBy("user_id")
        .agg(
            F.when(
                F.count_if(F.col("event_type") == "click") >= 2, 1
            )
            .otherwise(0)
            .cast("long")
            .alias("d"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
        .select(
            (
                (
                    F.instr(
                        F.lit("0123456789abcdef"),
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit("iv|"),
                                    F.col("user_id").cast("string"),
                                )
                            ),
                            1,
                            1,
                        ),
                    )
                    - 1
                )
                % 2
            ).alias("z"),
            "d",
            "y",
        )
        .agg(
            F.count_if(F.col("z") == 1).cast("long").alias("n1"),
            F.count_if(F.col("z") == 0).cast("long").alias("n0"),
            F.sum(F.when(F.col("z") == 1, F.col("y")).otherwise(0))
            .cast("long")
            .alias("y1"),
            F.sum(F.when(F.col("z") == 0, F.col("y")).otherwise(0))
            .cast("long")
            .alias("y0"),
            F.sum(F.when(F.col("z") == 1, F.col("d")).otherwise(0))
            .cast("long")
            .alias("d1"),
            F.sum(F.when(F.col("z") == 0, F.col("d")).otherwise(0))
            .cast("long")
            .alias("d0"),
        )
    )
    itt_y = F.col("y1") * F.col("n0") - F.col("y0") * F.col("n1")
    itt_d = F.col("d1") * F.col("n0") - F.col("d0") * F.col("n1")
    return g.select(
        "n1",
        "n0",
        itt_y.cast("long").alias("itt_y_num"),
        itt_d.cast("long").alias("itt_d_num"),
        # a zero compliance contrast (weak/degenerate instrument) has
        # NO defined LATE — emit NULL, never a fake number
        F.when(itt_d == 0, F.lit(None))
        .otherwise(itt_y.cast("double") / itt_d.cast("double"))
        .alias("wald_late"),
    )


@query(
    "dow_matched_delta",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               (datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4)
                   % 7 AS dow,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT d, dow, n,
               LAG(n) OVER (PARTITION BY dow ORDER BY d) AS prev_n
        FROM daily
    )
    SELECT d AS day, CAST(dow AS BIGINT) AS dow, n,
           CAST(prev_n AS BIGINT) AS same_dow_prev_week,
           CAST(n - prev_n AS BIGINT) AS delta,
           CAST((2000000 * (n - prev_n)
                 + CASE WHEN n - prev_n >= 0 THEN prev_n
                        ELSE -prev_n END)
                // (2 * prev_n) AS BIGINT) AS delta_ppm
    FROM lagged WHERE prev_n IS NOT NULL
    """,
)
def dow_matched_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-weekday day-over-week delta (M347): each day's event
    count against the SAME WEEKDAY one week earlier — the
    seasonality-correct daily comparison (`wow_revenue_delta`
    compares whole weeks; a naive day-over-day compare mostly
    measures the weekday cycle M317 quantifies, so every "traffic
    down 30%!" Monday-vs-Sunday false alarm comes from skipping this
    matching).

    Exactness: day-of-week via the exact M274 epoch arithmetic; the
    lag runs PARTITIONED by weekday, so matching is structural, not
    a fragile 7-row offset; delta exact integers; delta_ppm is the
    half-up identity with the SIGN-AWARE rounding adjustment
    (adding +b/2 to a negative numerator rounds toward zero on one
    engine and away on the other — the adjustment term flips with
    the sign so both engines floor the same positive-magnitude
    quantity).

    Scale: a (day, dow)-keyed map-side count, then lag windows
    PARTITIONED per weekday over |days|/7 rows each.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    dow = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) + 4
    ) % 7
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"), dow.alias("dow")
    ).agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("dow").orderBy("d")
    lagged = daily.withColumn("prev_n", F.lag("n").over(w)).filter(
        F.col("prev_n").isNotNull()
    )
    return lagged.select(
        F.col("d").alias("day"),
        F.col("dow").cast("long").alias("dow"),
        "n",
        F.col("prev_n").cast("long").alias("same_dow_prev_week"),
        (F.col("n") - F.col("prev_n")).cast("long").alias("delta"),
        F.expr(
            "CAST((2000000 * (n - prev_n)"
            " + CASE WHEN n - prev_n >= 0 THEN prev_n"
            "        ELSE -prev_n END)"
            " div (2 * prev_n) AS BIGINT)"
        ).alias("delta_ppm"),
    )


@query(
    "candidate_key_audit",
    oracle="""
    SELECT 'events' AS tbl, 'event_id' AS key_cols,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) = COUNT(DISTINCT event_id) AS INT) AS is_key
    FROM events
    UNION ALL
    SELECT 'events', 'user_id,ts',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT (user_id, ts)) AS BIGINT),
           CAST(COUNT(*) = COUNT(DISTINCT (user_id, ts)) AS INT)
    FROM events
    UNION ALL
    SELECT 'events', 'user_id,event_type',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT (user_id, event_type)) AS BIGINT),
           CAST(COUNT(*) = COUNT(DISTINCT (user_id, event_type)) AS INT)
    FROM events
    UNION ALL
    SELECT 'lineitem', 'l_orderkey,l_linenumber',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
           CAST(COUNT(*) = COUNT(DISTINCT (l_orderkey, l_linenumber))
                AS INT)
    FROM lineitem
    """,
)
def candidate_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key audit (M348): is a declared column set UNIQUE —
    the key-discovery side of data profiling (`fd_discovery_audit`
    tests A→B dependencies; this tests the |distinct(K)| == |rows|
    identity that makes K a join/upsert/dedup key), over four
    declared candidates: a true surrogate key, the TPC-H-lore
    composite (orderkey, linenumber) — which this synthetic fixture
    REFUTES (4599 distinct of 6000 at sf0.001), exactly the
    assumed-key-that-isn't every MERGE/upsert bug starts with — and
    two behavioral non-keys whose duplicate counts quantify how
    wrong keying on them would be.

    Scale: each probe is one two-phase distinct aggregate (the
    `distinct_exact` shape); four metadata rows out.  Exactness:
    exact counts, integer equality flags.
    """

    def probe(tbl: str, cols: list[str], label: str) -> DataFrame:
        t = load_table(spark, sf_dir, tbl)
        return t.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct(*cols).cast("long").alias("n_distinct"),
        ).select(
            F.lit(tbl).alias("tbl"),
            F.lit(label).alias("key_cols"),
            "n_rows",
            "n_distinct",
            (F.col("n_rows") == F.col("n_distinct"))
            .cast("int")
            .alias("is_key"),
        )

    return (
        probe("events", ["event_id"], "event_id")
        .unionByName(probe("events", ["user_id", "ts"], "user_id,ts"))
        .unionByName(
            probe("events", ["user_id", "event_type"], "user_id,event_type")
        )
        .unionByName(
            probe(
                "lineitem",
                ["l_orderkey", "l_linenumber"],
                "l_orderkey,l_linenumber",
            )
        )
    )
