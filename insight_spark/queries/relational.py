"""Relational core queries (SURVEY.md §2.B/C/D/F — P0 tier).

Each query demonstrates a set of §2 operator rows end-to-end and carries
its DuckDB oracle.  Star-schema dims (region/nation) are explicitly
broadcast — at 100 TB the fact-side scan never shuffles for a dim join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_spark.operators.relational import MONEY, money, money_out
from insight_spark.queries import query
from insight_spark.sources import load_table


def _disc_price() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(MONEY)


@query(
    "flagship_top_customers",
    oracle="""
    SELECT c_custkey, c_name, r_name,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY c_custkey, c_name, r_name
    ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) DESC, c_custkey
    LIMIT 10
    """,
)
def flagship_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (§7.1 Phase 0): top-10 customers by revenue with region.

    Exercises the spine: scan → broadcast dim joins → shuffle agg →
    top-k (TakeOrderedAndProject).  A1/A2, C1, C3, D1/D3, F1/F3/F5.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("c_custkey", "c_name", "r_name")
        .agg(F.sum(_disc_price()).alias("_revenue"))
        .orderBy(F.desc("_revenue"), F.asc("c_custkey"))
        .limit(10)
        .select(
            "c_custkey", "c_name", "r_name", money_out("_revenue").alias("revenue")
        )
    )


@query(
    "scan_filter_agg",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def scan_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style sargable filter + global agg (B3/B5, D2/D3).

    All predicates push to the parquet scan (row-group skipping).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(MONEY)).alias(
            "_revenue"
        ),
        F.count("*").alias("n_rows"),
    ).select(money_out("_revenue").alias("revenue"), "n_rows")


@query(
    "groupby_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6)      AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_charge,
           COUNT(*) AS count_order,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style wide aggregate (D1/D3/D4; §7.4.1 decimal discipline)."""
    li = load_table(spark, sf_dir, "lineitem")
    grouped = (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(money("l_quantity")).alias("sum_qty"),
            F.sum(money("l_extendedprice")).alias("sum_base_price"),
            F.sum(_disc_price()).alias("sum_disc_price"),
            F.sum(
                (
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    * (1 + F.col("l_tax"))
                ).cast(MONEY)
            ).alias("sum_charge"),
            F.count("*").alias("count_order"),
            F.sum(money("l_discount")).alias("_sum_disc"),
        )
    )
    return grouped.select(
        "l_returnflag",
        "l_linestatus",
        money_out("sum_qty").alias("sum_qty"),
        money_out("sum_base_price").alias("sum_base_price"),
        money_out("sum_disc_price").alias("sum_disc_price"),
        money_out("sum_charge").alias("sum_charge"),
        "count_order",
        F.round(F.col("sum_qty").cast("double") / F.col("count_order"), 6).alias(
            "avg_qty"
        ),
        F.round(
            F.col("sum_base_price").cast("double") / F.col("count_order"), 6
        ).alias("avg_price"),
        F.round(F.col("_sum_disc").cast("double") / F.col("count_order"), 6).alias(
            "avg_disc"
        ),
    )


@query(
    "join_star",
    oracle="""
    SELECT r_name,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_revenue,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with broadcast dims, agg by region (C1/C3, D1/D3)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(money("o_totalprice")).alias("_total_revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            "r_name", money_out("_total_revenue").alias("total_revenue"), "n_orders"
        )
    )


@query(
    "join_fact_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_fact_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join + agg (C1, D1/D3) — sort-merge/shuffle-hash
    territory at scale; AQE picks the strategy from runtime sizes."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_disc_price()).alias("_revenue"),
        )
        .select("o_orderpriority", "n_items", money_out("_revenue").alias("revenue"))
    )


@query(
    "topk",
    oracle="""
    SELECT o_custkey,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_custkey
    ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) DESC, o_custkey
    LIMIT 10
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k by aggregate (F1/F3/F5) — TakeOrderedAndProject,
    deterministic via exact decimal revenue + custkey tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_disc_price()).alias("_revenue"))
        .orderBy(F.desc("_revenue"), F.asc("o_custkey"))
        .limit(10)
        .select("o_custkey", money_out("_revenue").alias("revenue"))
    )


@query(
    "vwap_monthly",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(38,6)) AS BIGINT))
                AS BIGINT) AS total_qty,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(38,6)) * 1000000
                         AS BIGINT)) AS BIGINT) AS total_value_micro,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(38,6)) * 1000000
                         AS BIGINT)) AS DOUBLE)
           / CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(38,6)) AS BIGINT))
                  AS DOUBLE) AS vwap_micro
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def vwap_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly volume-weighted average price (M314): Σ value / Σ
    quantity per ship month — the volume-weighted complement of
    `twap_user_value` (time-weighted) and the M277 OHLC bars, closing
    the price-aggregation trio every market/commerce data engine
    serves (TWAP answers "what was it worth over time", VWAP "what
    did a unit actually trade at", OHLC "what shape did it move in").

    Exactness: quantities and prices are integral/2-dp DECIMAL-cast
    to exact integers BEFORE summation (order-free); VWAP is ONE
    IEEE division of those exact sums — bit-identical both engines.

    Scale: one month-keyed map-side-combined aggregate under a
    pushed-down ship-date range (12 groups); the scan reads one
    year's row groups, not the table (the M289 sargable discipline).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qty = F.col("l_quantity").cast("decimal(38,6)").cast("long")
    val = (F.col("l_extendedprice").cast("decimal(38,6)") * 1000000).cast(
        "long"
    )
    return li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("ship_month")
    ).agg(
        F.sum(qty).cast("long").alias("total_qty"),
        F.sum(val).cast("long").alias("total_value_micro"),
        (
            F.sum(val).cast("double") / F.sum(qty).cast("double")
        ).alias("vwap_micro"),
    )


@query(
    "leadtime_percentiles",
    oracle="""
    WITH lt AS (
        SELECT o.o_orderpriority,
               CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE)) AS BIGINT)
                   AS lead_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(quantile_cont(lead_days, 0.5), 6) AS p50_days,
           ROUND(quantile_cont(lead_days, 0.9), 6) AS p90_days,
           CAST(MAX(lead_days) AS BIGINT) AS max_days
    FROM lt GROUP BY o_orderpriority
    """,
)
def leadtime_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead time percentiles by priority (M315): the
    supply-chain SLA table — does the URGENT queue actually ship
    faster, and what does its tail look like?  Percentiles, not
    means, because lead-time distributions are right-skewed and the
    p90 IS the promise a fulfillment SLA makes.

    Shape: a genuine FACT-FACT equi-join (lineitem ⋈ orders on the
    order key — neither side broadcastable at scale) that sort-merges
    with spill, or goes exchange-free when both sides are bucketed on
    the key (the A6b layout this engine provides via
    `write_bucketed`); then an exact-percentile aggregate on the
    |priorities|-keyed result.  One of the few registry queries whose
    100 TB plan is ABOUT the shuffle — kept that way deliberately as
    the sort-merge-join canary.

    Exactness: lead days are exact integer datediffs; percentiles
    the established interpolated pairing rounded 6 dp.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lt = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        )
        .cast("long")
        .alias("lead_days"),
    )
    return lt.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.round(F.expr("percentile(lead_days, 0.5)"), 6).alias("p50_days"),
        F.round(F.expr("percentile(lead_days, 0.9)"), 6).alias("p90_days"),
        F.max("lead_days").cast("long").alias("max_days"),
    )
