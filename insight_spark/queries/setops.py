"""Set-operation queries (SURVEY.md §2.G — P1 tier)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_spark.queries import query
from insight_spark.sources import load_table


@query(
    "set_ops_users",
    oracle="""
    SELECT 'union' AS op, COUNT(*) AS n FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        UNION
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
)
def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over user-id sets (G2/G3/G4)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purchases = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )

    def labeled(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    return (
        labeled(clicks.union(purchases).distinct(), "union")
        .unionByName(labeled(clicks.intersect(purchases), "intersect"))
        .unionByName(labeled(clicks.subtract(purchases), "except"))
    )
