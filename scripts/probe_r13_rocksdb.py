"""r13 RocksDB state-store trial (VERDICT r12 task 5): drain the
join-heavy / state-heavy streams under (a) the default HDFS-backed
provider and (b) RocksDBStateStoreProvider with changelog
checkpointing, alternating A/B/A/B in one session with a fresh
checkpoint per drain, and report per-drain wall time plus the
state-commit portion from the progress metrics.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/probe_r13_rocksdb.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if os.path.normpath(sf_dir).endswith("sf0.1"):
        from insight_spark.queries import require_stress_subset

        require_stress_subset()
    from pyspark.sql import functions as F

    from insight_spark.engine import get_spark, scratch_base
    from insight_spark.queries.streaming_rt import _chunk_dir
    from insight_spark.streaming.core import (
        purchase_click_join_stream,
        read_events_stream,
    )

    spark = get_spark("probe_r13_rocks")
    spark.sparkContext.setLogLevel("ERROR")
    in_dir = _chunk_dir(spark, sf_dir)
    base = os.path.join(scratch_base(), "rocks_probe")
    os.makedirs(base, exist_ok=True)

    def drain(tag: str, df_fn, mode: str, use_rocks: bool) -> dict:
        old_p = spark.conf.get(PROVIDER_CONF, None)
        if use_rocks:
            spark.conf.set(PROVIDER_CONF, ROCKSDB)
            spark.conf.set(CHANGELOG_CONF, "true")
        ckpt = tempfile.mkdtemp(prefix=f"ck_{tag}_", dir=base)
        name = f"mem_probe_{tag}_{os.path.basename(ckpt)[-6:]}"
        try:
            t0 = time.perf_counter()
            q = (
                df_fn()
                .writeStream.format("memory")
                .queryName(name)
                .outputMode(mode)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.processAllAvailable()
            wall = time.perf_counter() - t0
            progress = []
            for p in q.recentProgress:
                progress.append(json.loads(p) if isinstance(p, str) else p)
            add_batch = 0
            for p in progress:
                d = p.get("durationMs", {}) if isinstance(p, dict) else {}
                add_batch += d.get("addBatch", 0) or 0
            q.stop()
            n = spark.table(name).count()
            return {
                "wall_s": round(wall, 3),
                "rows": n,
                "add_batch_ms": add_batch,
                "n_batches": len(progress),
            }
        finally:
            if use_rocks:
                spark.conf.set(CHANGELOG_CONF, "false")
                if old_p is None:
                    spark.conf.unset(PROVIDER_CONF)
                else:
                    spark.conf.set(PROVIDER_CONF, old_p)

    def ssj():
        return purchase_click_join_stream(
            read_events_stream(spark, in_dir, max_files_per_trigger=2)
        )

    def ssj_left():
        ev = read_events_stream(spark, in_dir, max_files_per_trigger=2)
        p = (
            ev.filter(F.col("event_type") == "purchase")
            .select("user_id", F.col("event_id").alias("purchase_id"),
                    F.col("ts").alias("purchase_ts"))
            .withWatermark("purchase_ts", "1 minute")
        )
        c = (
            ev.filter(F.col("event_type") == "click")
            .select(F.col("user_id").alias("c_user"),
                    F.col("event_id").alias("click_id"),
                    F.col("ts").alias("click_ts"))
            .withWatermark("click_ts", "1 minute")
        )
        return p.join(
            c,
            (p.user_id == c.c_user)
            & (c.click_ts <= p.purchase_ts)
            & (c.click_ts >= p.purchase_ts - F.expr("INTERVAL 30 MINUTES")),
            "leftOuter",
        )

    def agg():
        return (
            read_events_stream(spark, in_dir, max_files_per_trigger=2)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
        )

    results: dict[str, list] = {}
    for rep in range(3):
        for tag, fn, mode in (
            ("ssj", ssj, "append"),
            ("ssj_left", ssj_left, "append"),
            ("agg", agg, "complete"),
        ):
            for label, rocks in (("hdfs", False), ("rocksdb", True)):
                r = drain(f"{tag}_{label}_{rep}", fn, mode, rocks)
                results.setdefault(f"{tag}:{label}", []).append(r)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
