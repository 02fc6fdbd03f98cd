"""Manifest-log table properties (M208): optimistic-concurrency
conflict detection, snapshot isolation / time travel, overwrite
semantics, and reader invisibility of uncommitted staging data."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from insight_spark.operators.manifest import (
    ConflictError,
    latest_version,
    log_append,
    log_overwrite,
    log_versions,
    read_snapshot,
)
from insight_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _orders(spark, lo, hi):
    return (
        load_table(spark, SF_DIR, "orders")
        .filter((F.col("o_orderkey") > lo) & (F.col("o_orderkey") <= hi))
        .select("o_orderkey", "o_totalprice")
    )


def test_append_and_time_travel(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    a = _orders(spark, 0, 100)
    b = _orders(spark, 100, 200)
    assert log_append(a, tbl, expected_version=0) == 1
    assert log_append(b, tbl, expected_version=1) == 2
    assert log_versions(tbl) == [1, 2]
    n_a, n_b = a.count(), b.count()
    # snapshot isolation: v1 readable and UNCHANGED after v2 committed
    assert read_snapshot(spark, tbl, 1).count() == n_a
    assert read_snapshot(spark, tbl, 2).count() == n_a + n_b
    # latest == v2
    assert read_snapshot(spark, tbl).count() == n_a + n_b
    # row-level fidelity, not just counts
    keys_v1 = {r["o_orderkey"] for r in read_snapshot(spark, tbl, 1).collect()}
    assert keys_v1 == {r["o_orderkey"] for r in a.collect()}


def test_conflict_detection_is_a_hard_property(spark, tmp_path):
    """Every writer basing on a stale version MUST get ConflictError,
    and the losing writer's staged files must stay invisible."""
    tbl = str(tmp_path / "tbl")
    log_append(_orders(spark, 0, 50), tbl, expected_version=0)
    base = latest_version(tbl)  # both writers read v1
    log_append(_orders(spark, 50, 100), tbl, expected_version=base)
    n_after_winner = read_snapshot(spark, tbl).count()
    for _ in range(3):  # repeated stale writers: always rejected
        with pytest.raises(ConflictError):
            log_append(_orders(spark, 100, 150), tbl, expected_version=base)
    # table state untouched by the losers
    assert latest_version(tbl) == base + 1
    assert read_snapshot(spark, tbl).count() == n_after_winner


def test_overwrite_drops_history_from_latest_only(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    log_append(_orders(spark, 0, 100), tbl)
    log_overwrite(_orders(spark, 200, 250), tbl)
    assert latest_version(tbl) == 2
    # latest sees ONLY the overwrite's rows
    keys = {r["o_orderkey"] for r in read_snapshot(spark, tbl).collect()}
    assert keys == {
        r["o_orderkey"] for r in _orders(spark, 200, 250).collect()
    }
    # time travel still serves the pre-overwrite snapshot
    assert read_snapshot(spark, tbl, 1).count() == _orders(
        spark, 0, 100
    ).count()
    # overwrite also conflict-checks
    with pytest.raises(ConflictError):
        log_overwrite(_orders(spark, 0, 10), tbl, expected_version=1)


def test_uncommitted_staging_is_invisible(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    log_append(_orders(spark, 0, 100), tbl)
    n = read_snapshot(spark, tbl).count()
    # simulate a writer that staged data but crashed before commit
    _orders(spark, 100, 200).write.parquet(
        os.path.join(tbl, "data", "orphan_stage")
    )
    assert read_snapshot(spark, tbl).count() == n, (
        "readers must trust the manifest only — staged-but-uncommitted "
        "files are invisible"
    )


def test_fresh_table_read_raises(spark, tmp_path):
    with pytest.raises(ValueError):
        read_snapshot(spark, str(tmp_path / "nope"))
