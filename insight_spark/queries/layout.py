"""Layout / runtime-filter queries: Bloom-prefiltered semi join and
Z-order curve codes, both exact-oracled against DuckDB.

The bloom query's oracle is the *plain* semi join — the bloom is a
physical pruning step with no semantic footprint, so parity against
the naive SQL proves the no-false-negative property end-to-end.  The
Z-order query renders the identical interleave formula in both
dialects, so the curve codes are bit-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_spark.operators.layout import (
    bloom_semi_join,
    z_value_expr,
    z_value_sql,
)
from insight_spark.operators.relational import money, money_out
from insight_spark.queries import query
from insight_spark.sources import load_table


@query(
    "bloom_semi_agg",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6)
               AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
)
def bloom_semi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join lineitem ⋉ urgent-orders via a Bloom runtime filter.

    The bloom bitmap over the filtered order keys is built distributed
    (no driver collect), broadcast as one 16 KiB array row, and probes
    drop non-matching lineitem rows before the semi join's exchange —
    at 100 TB that is the difference between shuffling the whole fact
    table and shuffling the ~20% candidate set.  The trailing exact
    semi join erases bloom false positives, which is why the oracle is
    the plain `IN` subquery.
    """
    li = load_table(spark, sf_dir, "lineitem")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    matched = bloom_semi_join(li, urgent, "l_orderkey", m_bits=1 << 17, k=5)
    return matched.agg(
        F.count("*").alias("n_rows"),
        F.sum(money("l_quantity")).alias("_sq"),
    ).select("n_rows", money_out("_sq").alias("sum_qty"))


_ZX = "(l_partkey % 1024)"
_ZY = "(l_suppkey % 1024)"


@query(
    "z_order_code_top",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_ZX} AS BIGINT) AS zx,
           CAST({_ZY} AS BIGINT) AS zy,
           {z_value_sql(_ZX, _ZY, 10)} AS zval
    FROM lineitem
    ORDER BY zval, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def z_order_code_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton Z-curve codes over (partkey, suppkey) low bits — the sort
    key Z-order clustering writes by.

    Projection + `TakeOrderedAndProject`: the curve code is pure
    shift/AND arithmetic inside whole-stage codegen, and the global
    top-k never materializes a full sort.  Tie-break on the table key
    keeps the limit deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.expr(_ZX).cast("long").alias("zx"),
            F.expr(_ZY).cast("long").alias("zy"),
            z_value_expr(_ZX, _ZY, 10).alias("zval"),
        )
        .orderBy("zval", "l_orderkey", "l_linenumber")
        .limit(100)
    )
