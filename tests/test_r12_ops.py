"""Round-12 property pins: the RocksDB state-backend audit (M354) and
the checkpoint operator-metadata inventory (M355) — laws the value
hash can't state structurally, plus the physical-evidence legs."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from insight_spark.queries import all_queries
from insight_spark.queries.streaming_rt import _RT_BASE
from insight_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _q(name):
    return all_queries()[name]


def test_rocksdb_audit_leaves_a_real_rocksdb_checkpoint(spark):
    """M354 pins beyond the hash: (a) the audit row's totals equal the
    batch aggregate, (b) the newest rocksdb checkpoint on disk
    physically contains RocksDB artifacts (the provider writes
    .zip/.sst changelog files under state/, not the default
    provider's bare .delta files), and (c) the session's provider
    conf is RESTORED after the query (the drain must not leak RocksDB
    onto unrelated later streams)."""
    provider_conf = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(provider_conf, None)

    row = _q("stream_rocksdb_state_audit")(spark, SF_DIR).collect()[0]
    assert row["provider"] == "RocksDBStateStoreProvider"
    assert row["state_partitions"] == 8
    ev = load_table(spark, SF_DIR, "events")
    assert row["n_events"] == ev.count()
    assert (
        row["n_users"]
        == row["n_state_keys"]
        == ev.select("user_id").distinct().count()
    )

    assert spark.conf.get(provider_conf, None) == before, "conf leaked"

    base = max(
        glob.glob(os.path.join(_RT_BASE, "ckpt_rocks_*")),
        key=os.path.getmtime,
    )
    state_files = [
        f
        for root, _d, names in os.walk(os.path.join(base, "state"))
        for f in names
    ]
    assert any(
        f.endswith((".zip", ".sst", ".changelog")) for f in state_files
    ), f"no RocksDB artifacts in {base}: {sorted(state_files)[:10]}"
    assert not any(
        f.endswith(".delta") for f in state_files
    ), "default-provider delta files in a RocksDB checkpoint"


def test_state_metadata_inventory_addresses_the_right_stores(spark):
    """M355 pins: exactly two operators (dedupe + stateStoreSave),
    both at the pinned 8 partitions, and the per-operator key counts
    land on the RIGHT operator (dedup holds the full event_id set,
    the agg holds the |event_type| grid — a swapped operatorId would
    cross them)."""
    out = {
        r["operator_name"]: r
        for r in _q("stream_state_metadata_audit")(spark, SF_DIR).collect()
    }
    assert set(out) == {"dedupe", "stateStoreSave"}
    ev = load_table(spark, SF_DIR, "events")
    assert out["dedupe"]["n_state_keys"] == ev.count()
    assert (
        out["stateStoreSave"]["n_state_keys"]
        == ev.select("event_type").distinct().count()
    )
    for r in out.values():
        assert r["num_partitions"] == 8
        assert r["state_store_name"] == "default"
