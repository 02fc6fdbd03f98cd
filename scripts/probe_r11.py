"""Round-11 10x scale probe (VERDICT r10 task 7): shifted-id fixtures
for the r10 heavy additions — kmv_set_cardinality,
pareto_skyline_sources, dow_matched_delta, and the manifest family's
read paths (manifest_zone_map_scan, delta_index_merge_read).

Fixture: each of 10 copies shifts user/event/doc/order ids by i*1e9
(key-space growth, the SCALE.md r4 methodology — verbatim duplication
would instead multiply per-key density, a different experiment).
Sources/timestamps are unchanged so the bounded-summary claims
(|sources| grid, |days| grid) are actually exercised: 10x rows, same
group grid.

Usage: python scripts/probe_r11.py [--rebuild]
       SPARK_GRAFT_PROBE_SCALE=100 python scripts/probe_r11.py
Prints one line per (query, tier) with warm best-of-2 seconds.
At scale 100 (two decades up) the probe narrows to the events-backed
bounded-state claims (kmv sketch, calendar grids, sessionize) plus the
bounded-summary skyline — the multi-gigabyte manifest/index fixtures
add write time without testing a different claim.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
SCALE = int(os.environ.get("SPARK_GRAFT_PROBE_SCALE", "10"))
FIX = f"/tmp/insight_spark_probe/sf0.1x{SCALE}"

QUERIES = (
    [
        "kmv_set_cardinality",
        "pareto_skyline_sources",
        "dow_matched_delta",
        "manifest_zone_map_scan",
        "delta_index_merge_read",
        # the two r11 perf rewrites — the probe shows the new shapes
        # hold a decade up (capped: 10x part keys at the same ~30
        # rows/group; zorder: 10x input through the one-pass
        # partitioned write)
        "capped_running_balance",
        "zorder_zone_map_probe",
    ]
    if SCALE == 10
    else [
        "kmv_set_cardinality",
        "pareto_skyline_sources",
        "dow_matched_delta",
        "sessionize",
        "events_hourly",
    ]
)

#: table -> columns to shift by i*1e9 per copy
SHIFT_ALL = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_partkey"],
}
#: only build what the tier's queries read (a 60M-row lineitem write
#: tests nothing at scale 100)
SHIFT = (
    SHIFT_ALL
    if SCALE == 10
    else {t: SHIFT_ALL[t] for t in ("events", "documents")}
)


def build_fixture(spark) -> None:
    from pyspark.sql import functions as F

    from insight_spark.sources import load_table

    os.makedirs(FIX, exist_ok=True)
    for tbl, cols in SHIFT.items():
        out = os.path.join(FIX, f"{tbl}.parquet")
        if os.path.exists(out):
            continue
        src = load_table(spark, BASE, tbl)
        copies = []
        for i in range(SCALE):
            c = src
            for col in cols:
                c = c.withColumn(
                    col, (F.col(col) + F.lit(i * 1_000_000_000)).cast("long")
                )
            copies.append(c)
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        # keep partition count sane at scale 100 (one union leg per
        # copy would otherwise write SCALE x input-partitions files)
        big.repartition(max(8, 4 * SCALE // 10)).write.mode(
            "overwrite"
        ).parquet(out)
        print(f"built {out}", file=sys.stderr)


def main() -> None:
    from insight_spark.engine import get_spark
    from insight_spark.queries import all_queries, set_lint_default

    set_lint_default(False)
    spark = get_spark("probe_r11")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv:
        import shutil

        shutil.rmtree(FIX, ignore_errors=True)
    build_fixture(spark)
    reg = all_queries()
    for name in QUERIES:
        for tier, sf_dir in (("1x", BASE), ("10x", FIX)):
            fn = reg[name]
            df = fn(spark, sf_dir)
            df.toPandas()  # cold
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                best = min(best, time.perf_counter() - t0)
            print(f"{name} {tier} {best:.3f}s", flush=True)


if __name__ == "__main__":
    main()
