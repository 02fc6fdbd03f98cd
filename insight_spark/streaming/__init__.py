"""Structured Streaming surface (SURVEY.md §2.K)."""

from insight_spark.streaming.core import (
    EVENTS_SCHEMA,
    hourly_counts_stream,
    prepare_stream_input,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
    stream_dedup,
)

__all__ = [
    "EVENTS_SCHEMA",
    "hourly_counts_stream",
    "prepare_stream_input",
    "read_events_stream",
    "run_stream_to_memory",
    "sessionize_stream",
    "stream_dedup",
]
