"""Window frame / rank-family queries (SURVEY.md §2.E2-E9 — P1 tier)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insight_spark.operators.relational import MONEY, money_out
from insight_spark.queries import query
from insight_spark.sources import load_table

#: epoch seconds of 2024-01-01 UTC — fixture event-time origin
_EPOCH_2024 = 1704067200


@query(
    "window_rank_family",
    oracle="""
    SELECT user_id, event_id,
           CAST(rank() OVER wv AS INTEGER) AS rk,
           CAST(dense_rank() OVER wv AS INTEGER) AS drk,
           ROUND(percent_rank() OVER wv, 6) AS prank,
           ROUND(cume_dist() OVER wv, 6) AS cdist,
           CAST(ntile(4) OVER wt AS INTEGER) AS tile4
    FROM events
    WINDOW wv AS (PARTITION BY user_id ORDER BY value),
           wt AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / cume_dist / ntile (E2-E4).

    Rank functions order by value alone (ties produce equal ranks —
    deterministic); ntile needs a total order so it adds the event_id
    tie-break.
    """
    ev = load_table(spark, sf_dir, "events")
    wv = Window.partitionBy("user_id").orderBy("value")
    wt = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.rank().over(wv).alias("rk"),
        F.dense_rank().over(wv).alias("drk"),
        F.round(F.percent_rank().over(wv), 6).alias("prank"),
        F.round(F.cume_dist().over(wv), 6).alias("cdist"),
        F.ntile(4).over(wt).alias("tile4"),
    )


@query(
    "window_frames",
    oracle="""
    SELECT user_id, event_id,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER
               (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS run_sum,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER
               (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS slide_sum3,
           first_value(value) OVER
               (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_val,
           last_value(value) OVER
               (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val,
           nth_value(value, 3) OVER
               (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead, running & sliding sums, first/last/nth value (E5-E8).

    All six expressions share one (partition, order) spec → a single
    shuffle + sort in the physical plan.  Window sums are decimal-exact.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slide = w.rowsBetween(-2, Window.currentRow)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val_dec = F.col("value").cast(MONEY)
    return ev.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        money_out(F.sum(val_dec).over(run)).alias("run_sum"),
        money_out(F.sum(val_dec).over(slide)).alias("slide_sum3"),
        F.first("value").over(full).alias("first_val"),
        F.last("value").over(full).alias("last_val"),
        F.nth_value("value", 3).over(full).alias("third_val"),
    )


@query(
    "range_frame_hour",
    oracle="""
    SELECT user_id, event_id,
           COUNT(*) OVER w AS n_last_hour,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE), 6) AS sum_last_hour
    FROM events
    WINDOW w AS (
        PARTITION BY user_id
        ORDER BY date_diff('second', TIMESTAMP '2024-01-01', ts)
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
)
def range_frame_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time seconds (E9): per event, the count and
    sum of the same user's events in the trailing hour."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "_secs", F.col("ts").cast("long") - F.lit(_EPOCH_2024)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_secs")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_last_hour"),
        money_out(F.sum(F.col("value").cast(MONEY)).over(w)).alias("sum_last_hour"),
    )


@query(
    "window_distribution_family",
    oracle="""
    SELECT event_type, event_id, value,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM events
    WHERE event_id <= 500
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def window_distribution_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-window family (E-surface completion): percent_rank,
    cume_dist, and ntile over a per-type ordering — the three ranking
    functions `window_rank_family` (row_number/rank/dense_rank) does
    not cover.  Both engines share the exact definitions
    (percent_rank=(r−1)/(n−1), cume_dist=|≤row|/n, ntile=equal-fill
    buckets), and both are exact small-integer ratios in double, so
    the hash is bit-stable; the ORDER BY ends in the unique event_id
    tie-break (the registry's window discipline).

    Scale: one hash partition by event_type, in-partition sort — the
    same single-shuffle shape every partitioned window has; the
    event_id<=500 subset bounds result transfer, not the plan.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_type",
        "event_id",
        "value",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )
