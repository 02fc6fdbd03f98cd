"""Join-variant queries (SURVEY.md §2.C4-C10 — P1/P2 tiers)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from insight_spark.operators.relational import money_out
from insight_spark.queries import query
from insight_spark.sources import load_table


@query(
    "semi_join_segments",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def semi_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having orders, by segment (C4 left-semi = EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders (C5 left-anti = NOT EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "outer_join_order_counts",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           ROUND(CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_spend
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order count incl. zero (C2 left outer; D4 null count)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(
                F.coalesce(F.col("o_totalprice"), F.lit(0)).cast("decimal(38,6)")
            ).alias("_total_spend"),
        )
        .select("c_custkey", "n_orders", money_out("_total_spend").alias("total_spend"))
    )


@query(
    "cross_join_pairs",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
)
def cross_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two dims (C6) — 125 rows, bounded by design."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@query(
    "theta_join_acctbal",
    oracle="""
    SELECT n_name, COUNT(*) AS n_pairs
    FROM supplier
    JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def theta_join_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed equi + inequality join (C7): same-nation (supplier, customer)
    pairs where the supplier's balance exceeds the customer's."""
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(
            cust,
            (supp.s_nationkey == cust.c_nationkey)
            & (supp.s_acctbal > cust.c_acctbal),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "self_join_order_pairs",
    oracle="""
    SELECT a.o_custkey, COUNT(*) AS n_pairs
    FROM orders a
    JOIN orders b ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
    GROUP BY a.o_custkey
    """,
)
def self_join_order_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-customer order pairs (C10 self-join with aliases)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.alias("a")
    b = orders.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .groupBy(F.col("a.o_custkey").alias("o_custkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "asof_purchase_click",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (C9): latest click at-or-before each purchase, per user.

    Spark has no native as-of; implemented as the shuffle-friendly
    union + last-value window (SURVEY.md §4.3): tag both streams, one
    window pass per user ordered by (ts, kind), carry the last click
    timestamp forward, keep purchases.  One shuffle on user_id; scales
    with events per user, never materializes pairs.  The DuckDB oracle
    uses its native ASOF JOIN — two independent implementations
    agreeing is the strongest parity check in the suite.
    """
    ev = load_table(spark, sf_dir, "events")
    # kind 0 = click (sorts before purchase at the same timestamp,
    # matching ASOF's inclusive c.ts <= p.ts), kind 1 = purchase
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.last(
        F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("last_click_ts", last_click)
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_click_ts",
        )
    )


@query(
    "salted_join_priority_revenue",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                      AS DOUBLE), 6) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def salted_join_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact-dim join (M88): the ``hot_key_salted_join``
    operator, value-proven equivalent to the plain equi-join it
    replaces.

    Hot keys (fact-side row count ≥ 6 here — lineitem orders carry 1-7
    lines, so the hot set is a real ~quarter of keys, not a degenerate
    all-or-nothing split) take the salted route: a deterministic
    per-row salt (hash of a unique row key — retry-stable, no RNG) on
    the fact side, the HOT SLICE of the dim replicated once per salt,
    join key (orderkey, salt) so a hot key's rows fan out across
    n_salts partitions instead of one straggler.  Cold keys take the
    plain join — the dim is never replicated wholesale (the naive
    full-dim salting cost this operator exists to avoid).  The oracle
    runs the UNSALTED join — identical groups, counts, and exact
    DECIMAL revenue prove the rewrite changes physical distribution
    only, never the result.

    At 100 TB this is the manual fallback when AQE skew-join can't
    fire (e.g. the skew is inside a single in-flight stage, or the
    build side must stay sort-merge); the hot-set detection is one
    map-side-combined key count, replaceable by a sample or stats
    store without affecting results.
    """
    from insight_spark.operators.partitioning import hot_key_salted_join
    from insight_spark.operators.relational import money

    fact = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("okey"),
            money("l_extendedprice").alias("_price"),
            F.xxhash64("l_orderkey", "l_linenumber").alias("_rowkey"),
        )
    )
    dim = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    joined = hot_key_salted_join(
        fact, dim, on="okey", skewed_unique_col="_rowkey",
        n_salts=8, hot_threshold=6,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("_price").alias("_rev"),
    ).select(
        "o_orderpriority", "n_items", money_out("_rev").alias("revenue")
    )
