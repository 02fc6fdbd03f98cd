"""Sources & sinks (SURVEY.md §2.A)."""

from insight_spark.sources.parquet import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
