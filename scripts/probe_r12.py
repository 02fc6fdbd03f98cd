"""Round-12 10x scale probe (VERDICT r11 task 7): the streaming
state-surface pair — ``stream_state_rescale_audit`` (M351) and
``stream_state_migration_roundtrip`` (M352) — at 10x events.

These are the two queries whose cost MATTERS at 100 TB: the
migration's statestore-reader export + weighted-seed re-ingest is the
actual offline rescale procedure, and until now it had correctness
evidence at three tiers but no scaling measurement (the r11 gap this
probe closes).  The claim under test: drain cost grows with INPUT
(rows ingested per batch), while the export/re-ingest legs grow with
STATE (distinct keys) — so a 10x-rows/10x-keys fixture should grow
end-to-end wall clock well below 10x, the fixed per-trigger and
per-restart overheads amortizing exactly as they would on a cluster.

Fixture: 10 shifted-id copies of sf0.1 events (user_id/event_id
+ i*1e9 — the SCALE.md r4 key-space-growth methodology), so state key
count ACTUALLY grows 10x (verbatim duplication would only densify
per-key traffic, leaving the state surface untested).

Usage: python scripts/probe_r12.py [--rebuild] [--x100]
Prints one line per (query, tier) with warm best-of-2 seconds.
``--x100`` adds a second decade: 100 shifted-id copies = 10 M events
and 100× the distinct state keys (sf0.1 has 1,500 distinct users, so
the key space grows 1.5 k → 15 k → 150 k — growth RATIO is the
measured variable; absolute key counts stay fixture-sized).  Matches
the optimizer-family probe (probe_r12b).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
FIX = "/tmp/insight_spark_probe/sf0.1x10_state"
FIX100 = "/tmp/insight_spark_probe/sf0.1x100_state"

QUERIES = (
    "stream_state_rescale_audit",
    "stream_state_migration_roundtrip",
)


def build_fixture(spark, fix: str, mult: int) -> None:
    from pyspark.sql import functions as F

    from insight_spark.sources import load_table

    os.makedirs(fix, exist_ok=True)
    out = os.path.join(fix, "events.parquet")
    if os.path.exists(out):
        return
    src = load_table(spark, BASE, "events")
    copies = []
    for i in range(mult):
        copies.append(
            src.withColumn(
                "event_id",
                (F.col("event_id") + F.lit(i * 1_000_000_000)).cast("long"),
            ).withColumn(
                "user_id",
                (F.col("user_id") + F.lit(i * 1_000_000_000)).cast("long"),
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(max(8, mult // 2)).write.mode("overwrite").parquet(out)
    print(f"built {out} (x{mult})", file=sys.stderr)


def main() -> None:
    from insight_spark.engine import get_spark
    from insight_spark.queries import all_queries, set_lint_default

    set_lint_default(False)
    spark = get_spark("probe_r12")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv:
        import shutil

        shutil.rmtree(FIX, ignore_errors=True)
        shutil.rmtree(FIX100, ignore_errors=True)
    build_fixture(spark, FIX, 10)
    tiers = [("1x", BASE), ("10x", FIX)]
    if "--x100" in sys.argv:
        build_fixture(spark, FIX100, 100)
        tiers.append(("100x", FIX100))
    reg = all_queries()
    for name in QUERIES:
        for tier, sf_dir in tiers:
            fn = reg[name]
            fn(spark, sf_dir).toPandas()  # cold (builds chunk cache)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                best = min(best, time.perf_counter() - t0)
            print(f"{name} {tier} {best:.3f}s", flush=True)


if __name__ == "__main__":
    main()
