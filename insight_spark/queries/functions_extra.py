"""Scalar-function family queries (SURVEY.md §2.H1/H5/H7 breadth).

Each query exercises a wide slice of one function family with the
dialect-overlap-safe forms from SURVEY §7.4.5 (dow via ISO numbering,
dates via explicit casts, rounding only as a final projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_spark.queries import query
from insight_spark.sources import load_table


@query(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(extract(year FROM o_orderdate) AS INTEGER)  AS y,
           CAST(extract(month FROM o_orderdate) AS INTEGER) AS m,
           CAST(extract(day FROM o_orderdate) AS INTEGER)   AS d,
           CAST(extract(isodow FROM o_orderdate) AS INTEGER) AS dow_iso,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
                AS INTEGER) AS days_to_eoy
    FROM orders
    WHERE o_orderkey <= 2000
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4/H5 family: trunc/extract/ISO-dow/last_day/date arithmetic.

    ISO day-of-week (Mon=1) is the overlap-safe numbering: Spark
    ``weekday()+1`` == DuckDB ``isodow`` (Spark ``dayofweek`` is Sun=1,
    DuckDB ``dow`` is Sun=0 — both avoided, SURVEY §7.4.5).
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") <= 2000
    )
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_trunc("month", d).alias("order_month"),
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        (F.weekday(d) + 1).alias("dow_iso"),
        F.last_day(d).alias("month_end"),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date")).alias(
            "days_to_eoy"
        ),
    )


@query(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment)  AS seg_upper,
           lower(c_name) AS name_lower,
           length(c_name) AS name_len,
           substr(c_name, 10, 9) AS name_digits,
           reverse(c_name) AS name_rev,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           rpad(c_mktsegment, 12, '.') AS seg_padded,
           replace(c_name, 'Customer#', 'C-') AS name_short,
           CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
           concat_ws('|', c_mktsegment, c_name) AS seg_name,
           trim(BOTH 'C' FROM c_mktsegment) AS seg_trimmed,
           repeat(substr(c_mktsegment, 1, 1), 3) AS initial_x3
    FROM customer
    WHERE c_custkey <= 1000
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 family: case/length/substr/reverse/pad/replace/position/concat/
    trim/repeat."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 1000
    )
    return cust.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 10, 9).alias("name_digits"),
        F.reverse("c_name").alias("name_rev"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_padded"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C-")).alias(
            "name_short"
        ),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.trim(F.col("c_mktsegment"), F.lit("C")).alias("seg_trimmed"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("initial_x3"),
    )


@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_quantity / 7) AS BIGINT) AS qty_bucket,
           CAST(ceil(l_quantity / 7) AS DOUBLE) AS qty_bucket_hi,
           ROUND(sqrt(l_extendedprice), 6) AS price_sqrt,
           ROUND(ln(l_extendedprice + 1), 6) AS price_ln,
           ROUND(pow(1 + l_tax, 2), 6) AS tax_sq,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           CAST(l_partkey % 10 AS BIGINT) AS pk_mod,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax)    AS min_rate
    FROM lineitem
    WHERE l_orderkey <= 800
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H7 family: abs/floor/ceil/sqrt/ln/pow/sign/mod/greatest/least.

    Transcendentals are rounded as a final projection (both engines use
    IEEE doubles and libm-identical results at 6 dp — SURVEY §7.4.1);
    floor/ceil/sign/mod on exact inputs need no rounding.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 800)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        F.ceil(F.col("l_quantity") / 7).cast("double").alias("qty_bucket_hi"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_partkey") % 10).alias("pk_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "url_parse_stats",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/'
                   || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url,
               source, lang
        FROM documents
    )
    SELECT source || '.example.com' AS host,
           lang AS lang_param,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           MIN('/docs/' || CAST(doc_id AS VARCHAR)) AS min_path
    FROM u
    GROUP BY 1, 2
    """,
)
def url_parse_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (M231, H-surface widening): the web-analytics
    staple — HOST / PATH / QUERY-parameter extraction via Spark's
    native ``parse_url``, aggregated per (host, lang parameter).

    The URLs are synthesized deterministically from fixture columns,
    so the ORACLE reconstructs every component by string arithmetic
    while the ENGINE must recover them by actually parsing — a
    parse_url bug (wrong part name, query-param extraction, scheme
    handling) is a value mismatch, not a silent wrong-dashboard.
    Map-only scan + a bounded (source x lang) aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            F.col("lang"),
        ).alias("url")
    )
    parsed = u.select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias(
            "lang_param"
        ),
    )
    return parsed.groupBy("host", "lang_param").agg(
        F.count("*").alias("n_urls"),
        F.min("path").alias("min_path"),
    )
