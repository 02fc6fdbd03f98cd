"""A9 via the Spark 4 Python DataSource API: the event_topic connector.

Batch side: partition-planned parallel read equals the events table.
Stream side: REAL offset management — the committed cursor lives in the
checkpoint, micro-batches advance by batchRows, and a restart resumes
from the committed offset with zero re-delivery (exactly-once), which
the A9 file-source stand-in cannot express.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from insight_spark.sources import load_table
from insight_spark.sources.pyds import EventTopicDataSource
from tests.conftest import SF_DIR

_EVENTS = os.path.join(SF_DIR, "events.parquet")


def _register(spark):
    # idempotent per session; re-register is an error in some builds
    if not getattr(spark, "_event_topic_registered", False):
        spark.dataSource.register(EventTopicDataSource)
        spark._event_topic_registered = True


def _batch_canon(spark):
    ev = load_table(spark, SF_DIR, "events")
    return {
        (
            r["event_id"],
            r["ts_ms"],
            r["user_id"],
            r["event_type"],
            round(r["value"], 6) if r["value"] is not None else None,
        )
        for r in ev.select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "user_id",
            "event_type",
            "value",
        ).collect()
    }


def test_batch_read_matches_events_table(spark):
    _register(spark)
    got = spark.read.format("event_topic").option("path", _EVENTS).load()
    assert got.rdd.getNumPartitions() == 4  # partition planning honored
    rows = {
        (
            r["event_id"],
            r["ts_ms"],
            r["user_id"],
            r["event_type"],
            round(r["value"], 6) if r["value"] is not None else None,
        )
        for r in got.collect()
    }
    assert rows == _batch_canon(spark)


def test_stream_offsets_drain_and_restart_exactly_once(spark, tmp_path):
    _register(spark)
    cursor = str(tmp_path / "topic.cursor")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start_query():
        stream = (
            spark.readStream.format("event_topic")
            .option("path", _EVENTS)
            .option("batchRows", 250)
            .option("cursorFile", cursor)
            .load()
        )
        # parquet sink: the fault-tolerant exactly-once sink (memory
        # sink cannot recover from a checkpoint)
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start_query()
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    total = load_table(spark, SF_DIR, "events").count()
    assert spark.read.parquet(out).count() == total
    assert n_batches >= 3, f"expected multi-batch drain, got {n_batches}"

    # restart from the checkpoint: cursor is at the log head, committed
    # offset equals it — no re-delivery, count unchanged (exactly-once)
    q2 = start_query()
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(out)
    assert got.count() == total
    assert got.select("event_id").distinct().count() == total

    # aggregate parity through the connector
    want = {
        (r["event_type"], r["n"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    have = {
        (r["event_type"], r["n"])
        for r in got.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert have == want
