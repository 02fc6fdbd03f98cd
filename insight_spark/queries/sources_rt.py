"""Source/sink round-trip queries (SURVEY §2.A3/A4/A5b/A6, driver-checkable).

The A-family formats (csv, json-lines, ORC, partitioned parquet) have
pytest round-trips but no driver rows — the driver only compares query
results against DuckDB on the fixture parquet.  These queries close
that gap: each writes a deterministic fixture subset through the
format under test to /tmp, reads it back, and returns the rows — so
the driver's value-hash check verifies the full write→read cycle
against the oracle's direct parquet read.  A format that dropped a
row, mangled a type, or reordered a partition would hash-mismatch.

Write target is a fixed per-(format, sf) path with mode=overwrite:
rerun-safe (the determinism gate runs every query twice).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from insight_spark.queries import query
from insight_spark.sources import load_table

_RT_BASE = "/tmp/insight_spark_rt"


def _rt_path(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_RT_BASE, tag, name)


#: The deterministic subset: 100 lowest-key orders, scalar columns only.
_SUBSET_ORACLE = """
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100
"""


def _subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")
        .limit(100)
    )


_SUBSET_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


@query("csv_roundtrip", oracle=_SUBSET_ORACLE)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink+scan round-trip (A3): header on, explicit schema on the
    read side (inference is for ad-hoc only — a schema drift between
    write and read is exactly what this query would catch)."""
    path = _rt_path(sf_dir, "csv")
    _subset(spark, sf_dir).write.mode("overwrite").option("header", True).csv(path)
    from insight_spark.sources import read_csv

    return read_csv(spark, path, schema=_SUBSET_SCHEMA)


@query("json_roundtrip", oracle=_SUBSET_ORACLE)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink+scan round-trip (A4), explicit read schema."""
    path = _rt_path(sf_dir, "json")
    _subset(spark, sf_dir).write.mode("overwrite").json(path)
    from insight_spark.sources import read_json

    return read_json(spark, path, schema=_SUBSET_SCHEMA)


@query(
    "orc_roundtrip",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_orderkey <= 100
    """,
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+scan round-trip (A5b) with full-fidelity types (double,
    timestamp) — binary columnar format, no text-formatting loss."""
    path = _rt_path(sf_dir, "orc")
    (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_shipdate",
        )
        .write.mode("overwrite")
        .orc(path)
    )
    from insight_spark.sources import read_orc

    return read_orc(spark, path)


@query(
    "partitioned_sink_roundtrip",
    oracle="""
    SELECT o_orderstatus, o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderkey <= 500 AND o_orderstatus = 'F'
    """,
)
def partitioned_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink round-trip (A6): write partitionBy
    (o_orderstatus), read back with a partition filter — the read scans
    only the matching directory (partition pruning at the source), and
    the partition column is reconstructed from the path.  The hash
    check proves the hive-style layout loses nothing."""
    path = _rt_path(sf_dir, "part_parquet")
    (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select("o_orderkey", "o_orderpriority", "o_orderstatus")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    return (
        spark.read.parquet(path)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderstatus", "o_orderkey", "o_orderpriority")
    )


@query(
    "schema_merge_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderkey <= 50
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders WHERE o_orderkey > 50 AND o_orderkey <= 100
    """,
)
def schema_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution ingest (lakehouse A-surface): two parquet
    batches written with DIFFERENT schemas — v1 lacks the
    o_orderpriority column a later producer added — read back as one
    table with ``mergeSchema``, v1 rows null-filled for the new
    column.

    This is the drift case every long-lived 100 TB table hits
    (producers upgrade, history doesn't); mergeSchema resolves the
    union-of-fields at the footer level, so old files are never
    rewritten and the scan stays parquet-native.  The value check
    proves no row or column is lost or misaligned across versions.
    """
    base = _rt_path(sf_dir, "schema_merge")
    orders = load_table(spark, sf_dir, "orders")
    (
        orders.filter(F.col("o_orderkey") <= 50)
        .select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite")
        .parquet(os.path.join(base, "v=1"))
    )
    (
        orders.filter((F.col("o_orderkey") > 50) & (F.col("o_orderkey") <= 100))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .write.mode("overwrite")
        .parquet(os.path.join(base, "v=2"))
    )
    merged = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(base)
    return merged.select("o_orderkey", "o_orderstatus", "o_orderpriority")
