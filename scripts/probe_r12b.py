"""Round-12 10x scale probe, part 2: the runtime-reoptimization family
(M356-M358) at 10x fact size.

The claim under test: the three runtime mechanisms keep ENGAGING and
keep their cost profile as the fact side grows a decade while dims
stay fixed — the realistic 100 TB growth shape (event/line volume
grows; customer/order/part catalogs don't).  Each query's in-build
assertion (skew=true / SMJ→BHJ switch / might_contain injection) runs
at BOTH tiers, so a mechanism that silently stops firing at scale
fails the probe, not just slows it.

Fixture (/tmp/insight_spark_probe/sf0.1x10_opt):
- events.parquet: 10 copies with event_id shifted by i*1e9 (even
  offsets preserve the hot-key parity split) and user_id UNCHANGED —
  whale-account traffic densifies 10x, exactly the skew surface.
- lineitem.parquet: 10 verbatim copies — 10x lines per order/part.
- customer/orders/part: 1x symlinks to sf0.1 (dims fixed).

Usage: python scripts/probe_r12b.py [--rebuild] [--x100]
Prints one line per (query, tier) with warm best-of-2 seconds.
``--x100`` adds a second decade (events x100 = 10 M rows, lineitem
x100 = 60 M rows, dims still fixed) so the family's growth curve is
measured across TWO decades, not extrapolated from one.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
FIX = "/tmp/insight_spark_probe/sf0.1x10_opt"
FIX100 = "/tmp/insight_spark_probe/sf0.1x100_opt"

QUERIES = (
    "aqe_skew_join_audit",
    "aqe_bhj_switch_audit",
    "runtime_bloom_join_audit",
)


def build_fixture(spark, fix: str, mult: int) -> None:
    from pyspark.sql import functions as F

    from insight_spark.sources import load_table

    os.makedirs(fix, exist_ok=True)
    done = os.path.join(fix, ".built")
    if os.path.exists(done):
        return
    n_parts = max(8, mult // 2)
    ev = load_table(spark, BASE, "events")
    copies = [
        ev.withColumn(
            "event_id",
            (F.col("event_id") + F.lit(i * 1_000_000_000)).cast("long"),
        )
        for i in range(mult)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(n_parts).write.mode("overwrite").parquet(
        os.path.join(fix, "events.parquet")
    )
    li = load_table(spark, BASE, "lineitem")
    big_li = li
    for _ in range(mult - 1):
        big_li = big_li.unionByName(li)
    big_li.repartition(n_parts).write.mode("overwrite").parquet(
        os.path.join(fix, "lineitem.parquet")
    )
    for dim in ("customer", "orders", "part"):
        dst = os.path.join(fix, f"{dim}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE, f"{dim}.parquet"), dst)
    open(done, "w").close()
    print(f"built {fix} (x{mult})", file=sys.stderr)


def main() -> None:
    from insight_spark.engine import get_spark
    from insight_spark.queries import all_queries, set_lint_default

    set_lint_default(False)
    spark = get_spark("probe_r12b")
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
            fn(spark, sf_dir).toPandas()  # warm caches; asserts fire here too
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                best = min(best, time.perf_counter() - t0)
            print(f"{name} {tier} {best:.3f}s", flush=True)


if __name__ == "__main__":
    main()
