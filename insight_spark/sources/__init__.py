"""Sources & sinks (SURVEY.md §2.A)."""

from insight_spark.sources.parquet import (
    TABLES,
    from_rows,
    load_table,
    load_tables,
    read_binary_files,
    read_csv,
    read_json,
    read_orc,
    register_views,
)

__all__ = [
    "TABLES",
    "from_rows",
    "load_table",
    "load_tables",
    "read_binary_files",
    "read_csv",
    "read_json",
    "read_orc",
    "register_views",
]
