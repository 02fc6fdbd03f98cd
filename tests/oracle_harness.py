"""Local clone of the driver's DuckDB-oracle comparison (SURVEY.md §5.2).

Runs a declared Spark query and its oracle SQL over the same parquet,
then compares row count + column names + canonicalized row multisets.
Catches hash mismatches *before* the driver does.  Canonicalization:
columns sorted by name, every value rendered to a stable string
(decimals via str, floats via repr, timestamps via isoformat), rows
sorted — i.e. an order-insensitive value hash.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        "|".join(_canon_value(row[i]) for i in order) for row in rows
    )


def compare_query(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    """Run both sides; return a comparison report dict."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns

    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(oracle_sql)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    report = {
        "spark_count": len(s_rows),
        "duckdb_count": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duckdb_cols": sorted(d_cols),
        "count_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
    }
    if report["count_match"] and report["cols_match"]:
        cs = canonical_rows(s_cols, s_rows)
        cd = canonical_rows(d_cols, d_rows)
        report["values_match"] = cs == cd
        if not report["values_match"]:
            diff = [
                (a, b) for a, b in zip(cs, cd) if a != b
            ][:5]
            report["first_diffs"] = diff
    else:
        report["values_match"] = False
    report["ok"] = (
        report["count_match"] and report["cols_match"] and report["values_match"]
    )
    return report
