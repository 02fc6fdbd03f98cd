"""TPC-H-derived decision-support suite (SURVEY.md §2.N).

The classic multi-join / correlated-subquery workload, adapted to the
fixture schema (no partsupp table, no commit/receipt dates, no
phone/container columns — see TESTDATA.md).  Each query is the
DataFrame-first expression of the published TPC-H query shape; the
DuckDB oracle is the corresponding ANSI SQL on the same tables.

Scale posture shared by the suite (100 TB design notes):
- nation/region/supplier dims are explicitly ``F.broadcast`` — the
  fact scan never shuffles for a dim join;
- customer/orders/lineitem joins are left to AQE (sort-merge vs
  shuffled-hash from runtime sizes, skew-split on);
- every money sum accumulates in DECIMAL(38,6) (exact,
  order-independent) and final-projects ``round(cast(double), 6)`` —
  the repo-wide hash-stability discipline (SURVEY.md §7.4.1);
- every ORDER BY feeding a LIMIT ends in a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insight_spark.operators.relational import MONEY, money, money_out
from insight_spark.queries import query
from insight_spark.sources import load_table


def _disc_price() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(MONEY)


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped-order revenue for one market segment.

    Customer filter prunes before the join (Catalyst pushes it to the
    scan); orders→lineitem is the one big shuffle, on the join key.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).alias("_rev"))
        .orderBy(F.desc("_rev"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            money_out("_rev").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted: ship-lag > 90 days stands in for the missing
    commit/receipt dates): orders with at least one late line, by
    priority.  EXISTS → left-semi join; one orderkey shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n_name,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: local-supplier volume — customer and supplier must share
    a nation inside one region.  supplier/nation/region broadcast; the
    extra c_nationkey = s_nationkey equality rides the same join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).alias("_rev"))
        .orderBy("n_name")
        .select("n_name", money_out("_rev").alias("revenue"))
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship year.

    Both nation lookups broadcast; the OR'd nation-pair predicate is a
    post-join filter Catalyst folds into the broadcast join.
    """
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _disc_price().alias("_volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("_volume").alias("_rev"))
        .orderBy("supp_nation", "cust_nation", "l_year")
        .select(
            "supp_nation", "cust_nation", "l_year", money_out("_rev").alias("revenue")
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS volume,
               n1.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of PROMO-part revenue inside a
    region, per order year.  Share = decimal-sum / decimal-sum projected
    as rounded double — numerator and denominator both exact."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = (
        F.broadcast(part)
        .join(li, part.p_partkey == li.l_partkey)
        .join(F.broadcast(supp), supp.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == region.r_regionkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast(MONEY)
    shares = vol.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(zero)
        ).alias("_nat"),
        F.sum("volume").alias("_all"),
    )
    return shares.orderBy("o_year").select(
        "o_year",
        F.round(
            F.col("_nat").cast("double") / F.col("_all").cast("double"), 6
        ).alias("mkt_share"),
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue,
           ROUND(CAST(MAX(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE), 6) AS c_acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a half-year.

    Return-flag and date filters push to the scans; nation broadcast;
    the orders⋈lineitem shuffle carries only filtered rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_disc_price()).alias("_rev"),
            F.max(money("c_acctbal")).alias("_bal"),
        )
        .orderBy(F.desc("_rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            money_out("_rev").alias("revenue"),
            money_out("_bal").alias("c_acctbal"),
            "n_name",
        )
    )


@query(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted: ship-lag > 60 days stands in for the missing
    shipmode/receipt columns): late lines split by order priority class."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (priority filter stands in for the comment filter):
    distribution of non-urgent order counts per customer, zeros kept via
    the outer join.  Two aggregations; the second input is |customers|
    rows keyed by a tiny integer — AQE coalesces it."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
                       ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO-part revenue share for one month.  part is the
    broadcast side; the month filter prunes lineitem at the scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast(MONEY)
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero)
            ).alias("_promo"),
            F.sum(_disc_price()).alias("_all"),
        )
    )
    return agg.select(
        F.round(
            F.lit(100.0)
            * F.col("_promo").cast("double")
            / F.col("_all").cast("double"),
            6,
        ).alias("promo_revenue")
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           ROUND(CAST(total_revenue AS DOUBLE), 6) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the max quarterly revenue.

    The scalar MAX attaches as a 1-row broadcast (agg + crossJoin)
    rather than a global window, so the per-supplier aggregate is never
    coalesced onto one task; comparison happens on the exact decimal,
    not the rounded output."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("_total")
    )
    mx = revenue.agg(F.max("_total").alias("_max"))
    top = revenue.crossJoin(F.broadcast(mx)).filter(
        F.col("_total") == F.col("_max")
    )
    return (
        top.join(F.broadcast(supp), top.supplier_no == supp.s_suppkey)
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name", money_out("_total").alias("total_revenue"))
    )


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (brand filter only — no container column): revenue lost
    to small-quantity orders for one brand.

    The correlated AVG decorrelates into a per-partkey aggregate joined
    back on l_partkey — both sides shuffle on the same key, so the join
    is co-partitioned.  Quantities are integer-valued doubles: their sum
    is exact (< 2^53), so avg is order-independent on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("_half_avg")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_half_avg"))
        .agg(F.sum(money("l_extendedprice")).alias("_s"))
        .select(
            F.round(F.col("_s").cast("double") / F.lit(7.0), 6).alias("avg_yearly")
        )
    )


@query(
    "tpch_q18_large_volume",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           ROUND(CAST(MAX(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS o_totalprice,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 270
    ORDER BY ROUND(CAST(MAX(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders (sum of quantities over threshold).

    The HAVING is a post-aggregation filter; at scale the orderkey
    aggregate and the orders⋈lineitem join share the same shuffle key.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg(
            F.max(money("o_totalprice")).alias("_price"),
            F.sum(money("l_quantity")).alias("_qty"),
        )
        .filter(F.col("_qty") > 270)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            money_out("_price").alias("o_totalprice"),
            money_out("_qty").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#10' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (brand/size stand in for container/shipmode): revenue
    under three OR'd brand-size-quantity predicate groups.  Catalyst
    extracts the common join key; the disjunction stays a post-join
    filter on the broadcast-joined rows."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#10")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(_disc_price()).alias("_rev"))
        .select(money_out("_rev").alias("revenue"))
    )


@query(
    "tpch_q22_idle_customers",
    oracle="""
    SELECT n_name,
           COUNT(*) AS numcust,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE), 6) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0
    )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
    )
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (nation stands in for the phone prefix; "no orders
    since 2000" stands in for "no orders ever" — the dense synthetic
    fixture gives every customer at least one order): wealthy customers
    gone idle.  The scalar AVG subquery broadcasts as a single row
    (cross-join of one row); NOT EXISTS is a left-anti join on custkey
    with the date filter pushed below it.  Acctbals are 2-decimal
    values: the double AVG of their exact sum matches DuckDB
    bit-for-bit."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(money("c_acctbal")).alias("_tot"),
        )
        .orderBy("n_name")
        .select("n_name", "numcust", money_out("_tot").alias("totacctbal"))
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_7'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21, the hardest of the suite (two correlated subqueries:
    EXISTS another supplier in the order, NOT EXISTS another *late*
    supplier).  "Late" adapts to the fixture as shipping >60 days after
    the order date (no receipt/commit dates — TESTDATA.md).

    Spark-first decorrelation: instead of the published triple
    self-join, ONE pass over the F-order lines computes per
    (orderkey, suppkey) whether that supplier was ever late, then per
    orderkey the supplier count and late-supplier count — two chained
    map-side-combined aggregates (no Expand from multi-countDistinct,
    no self-join of lineitem).  A late line l1 qualifies iff its order
    has ≥2 suppliers and exactly 1 late supplier (which must be l1's,
    since l1 itself is late).  The oracle keeps the correlated
    EXISTS/NOT-EXISTS form, so parity proves the rewrite.  At 100 TB:
    lineitem shuffles once on (orderkey, suppkey), re-aggregates on the
    orderkey prefix, and the supplier⋈nation dim broadcasts.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "late",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .cast("int"),
        )
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("supp_late").alias("n_late_supp"),
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_7"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        li.filter(F.col("late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the pricing-summary full-scan aggregate.

    The canonical map-side-combine workload: one lineitem scan, eight
    aggregates over a 6-group key — partial aggregation reduces each
    task's output to ≤6 rows before the (tiny) shuffle.  Averages
    follow the repo discipline: exact DECIMAL sum, then one double
    division (bit-equal to DuckDB, unlike a double-running AVG).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast(MONEY)
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(money("l_quantity")).alias("_qty"),
        F.sum(money("l_extendedprice")).alias("_base"),
        F.sum(_disc_price()).alias("_disc"),
        F.sum(charge).alias("_charge"),
        F.sum(money("l_discount")).alias("_dsum"),
        F.count("*").alias("count_order"),
    )
    return g.orderBy("l_returnflag", "l_linestatus").select(
        "l_returnflag",
        "l_linestatus",
        money_out("_qty").alias("sum_qty"),
        money_out("_base").alias("sum_base_price"),
        money_out("_disc").alias("sum_disc_price"),
        money_out("_charge").alias("sum_charge"),
        F.round(F.col("_qty").cast("double") / F.col("count_order"), 6).alias("avg_qty"),
        F.round(F.col("_base").cast("double") / F.col("count_order"), 6).alias("avg_price"),
        F.round(F.col("_dsum").cast("double") / F.col("count_order"), 6).alias("avg_disc"),
        "count_order",
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate, zero joins.

    Every predicate is parquet-pushable (shipdate range, discount
    range, quantity bound) — at 100 TB this is a row-group-pruned scan
    whose selectivity Catalyst sees at plan time; the single global sum
    partial-aggregates to one row per task.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(MONEY)).alias(
                "_rev"
            )
        )
        .select(money_out("_rev").alias("revenue"))
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ),
    reg AS (
        SELECT s_suppkey, s_acctbal, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           ROUND(unit_cost, 6) AS supplycost
    FROM ps
    JOIN part ON p_partkey = pk
    JOIN reg  ON s_suppkey = sk
    WHERE p_type = 'ECONOMY'
      AND unit_cost = (
          SELECT MIN(ps2.unit_cost)
          FROM ps ps2 JOIN reg r2 ON r2.s_suppkey = ps2.sk
          WHERE ps2.pk = ps.pk
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: no partsupp table — the observed per-unit
    price MIN(l_extendedprice / l_quantity) over each part-supplier's
    lines stands in for ps_supplycost): the cheapest ASIA supplier per
    ECONOMY part, with the correlated min-cost subquery.

    Spark-first decorrelation: the correlated MIN becomes a window MIN
    over the part key *after* restricting to region suppliers — no
    second scan, no self-join; the published form re-reads partsupp.
    The equality filter on doubles is safe: both engines take the MIN
    of the identical double set.  supplier⋈nation⋈region broadcasts;
    the one shuffle is the (partkey, suppkey) aggregate of lineitem.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    reg = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    w = Window.partitionBy("pk")
    return (
        ps.join(F.broadcast(reg), ps.sk == reg.s_suppkey)
        .withColumn("_min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("_min_cost"))
        .join(F.broadcast(part), F.col("pk") == part.p_partkey)
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("unit_cost", 6).alias("supplycost"),
        )
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: discounted revenue stands in for the
    partsupp-cost profit — no ps_supplycost in the fixtures): per
    supplier-nation per order-year revenue on one product line.

    part/supplier/nation broadcast; lineitem⋈orders is the one big
    shuffle on orderkey.  The part filter (LIKE on p_name) prunes the
    broadcast side before the join, so non-matching lineitem rows drop
    at the probe.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(_disc_price()).alias("_profit"))
        .orderBy("nation", F.desc("o_year"))
        .select("nation", "o_year", money_out("_profit").alias("sum_profit"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH natl AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY 1
    )
    SELECT partkey, ROUND(CAST(value AS DOUBLE), 6) AS part_value
    FROM natl
    WHERE CAST(value AS DOUBLE) > (
        SELECT CAST(SUM(value) AS DOUBLE) * 0.002 FROM natl
    )
    ORDER BY part_value DESC, partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: one nation's shipped extended-price value per
    part stands in for partsupp stock value): parts whose value exceeds
    a fraction of the nation total — the global-scalar-subquery shape.

    Spark-first: the HAVING-fraction scalar is a 1-row aggregate of the
    *same* grouped DataFrame, broadcast-cross-joined back — the grouped
    relation computes once per branch off a common scan, no correlated
    re-read.  Exact DECIMAL sums make the threshold comparison
    deterministic on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp_nat = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_3"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    natl = (
        li.join(F.broadcast(supp_nat), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(money("l_extendedprice")).alias("_value"))
    )
    thresh = natl.agg(
        (F.sum("_value").cast("double") * 0.002).alias("_thresh")
    )
    return (
        natl.join(F.broadcast(thresh))
        .filter(F.col("_value").cast("double") > F.col("_thresh"))
        .orderBy(F.desc(F.col("_value").cast("double")), "partkey")
        .select("partkey", money_out("_value").alias("part_value"))
    )


@query(
    "tpch_q16_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'ECONOMY'
      AND p_size IN (1, 4, 9, 16, 25, 36)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: the distinct (partkey, suppkey) pairs of
    lineitem stand in for partsupp; s_name LIKE '%7' stands in for the
    complaints filter): supplier counts per excluded-brand part group.

    NOT IN on a provably non-null key → left-anti broadcast join (the
    null-semantics trap of NOT IN doesn't apply; documented here
    because s_suppkey is a PK).  The distinct-pairs aggregate and the
    count-distinct reuse the same (partkey, suppkey)-hashed shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36)
    )
    complainers = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(complainers), ps.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q20_promotion_suppliers",
    oracle="""
    WITH sp AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(38,6))) AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'cold%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
    ),
    tot AS (SELECT l_partkey, SUM(qty) AS total_qty FROM sp GROUP BY 1)
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT sp.l_suppkey FROM sp JOIN tot USING (l_partkey)
        WHERE CAST(sp.qty AS DOUBLE) > 0.5 * CAST(tot.total_qty AS DOUBLE)
    )
    ORDER BY s_name
    """,
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: a supplier "has excess stock" when it shipped
    more than half of a cold-part's 1997 volume — no ps_availqty):
    suppliers dominating any matching part's annual volume.

    Spark-first: the nested IN-subquery chain collapses to one
    (suppkey, partkey) aggregate, a window SUM over partkey for the
    part total (reusing the aggregate's shuffle instead of a
    tot-self-join), and a left-semi join to supplier.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("cold%"))
    sp = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(money("l_quantity")).alias("_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        sp.withColumn("_total", F.sum("_qty").over(w))
        .filter(
            F.col("_qty").cast("double") > 0.5 * F.col("_total").cast("double")
        )
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .orderBy("s_name")
        .select("s_name", "n_name")
    )
