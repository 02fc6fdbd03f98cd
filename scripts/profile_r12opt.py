"""r12-opt profiling harness (guide §1: measure first).

Three modes:

- ``stream <query...>``: run each streaming query's drain once and dump
  the per-micro-batch ``durationMs`` breakdown from the StreamingQuery
  progress events (walCommit / queryPlanning / addBatch / stateStore
  commit times), by monkey-patching ``run_stream_to_memory`` to capture
  ``recentProgress`` before ``stop()``.  Tells WHERE a 2-3 s drain
  spends its time, which explain() cannot (streaming plans re-plan per
  batch).
- ``time <query...>``: bench-protocol timing (cold + best-of-3 warm, or
  best-of-2 rebuild for ITERATIVE names) for an arbitrary subset,
  without running the whole 480-query sweep.
- ``kernels``: kmeans_lloyd / semantic_dedup with the literal vs blas
  assignment kernel, timed head-to-head at the bench tier.

Usage: python scripts/profile_r12opt.py stream stream_hourly_counts ...
       python scripts/profile_r12opt.py time kmeans_lloyd ...
       python scripts/profile_r12opt.py kernels
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    if os.path.normpath(SF_DIR).endswith("sf0.1"):
        from insight_spark.queries import require_stress_subset

        require_stress_subset()
    from insight_spark.engine import get_spark
    from insight_spark.queries import set_lint_default

    set_lint_default(False)
    spark = get_spark("profile_r12opt")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def mode_stream(names: list[str]) -> None:
    spark = _spark()
    import insight_spark.streaming.core as core
    from insight_spark.queries import all_queries

    registry = all_queries()
    captured: list[dict] = []
    orig = core.run_stream_to_memory

    def wrapped(spark, stream_df, name, checkpoint_dir, output_mode="append"):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
        q.processAllAvailable()
        captured.extend(json.loads(p.json) for p in q.recentProgress)
        q.stop()
        return spark.table(name)

    core.run_stream_to_memory = wrapped
    try:
        for name in names:
            captured.clear()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            registry[name](spark, SF_DIR).toPandas()
            wall = time.perf_counter() - t0
            print(f"\n=== {name}: wall {wall:.3f}s, {len(captured)} batches")
            tot: dict[str, float] = {}
            for p in captured:
                dm = p.get("durationMs", {})
                row = {k: dm.get(k, 0) for k in sorted(dm)}
                n_in = p.get("numInputRows", 0)
                print(f"  batch {p.get('batchId')}: rows={n_in} {row}")
                for k, v in dm.items():
                    tot[k] = tot.get(k, 0) + v
                for s in p.get("stateOperators", []) or []:
                    cu = s.get("allUpdatesTimeMs", 0)
                    cc = s.get("commitTimeMs", 0)
                    print(
                        f"    state[{s.get('operatorName')}]: "
                        f"updates={cu}ms commit={cc}ms "
                        f"rows={s.get('numRowsTotal')}"
                    )
            print(f"  totals(ms): {dict(sorted(tot.items()))}")
    finally:
        core.run_stream_to_memory = orig


def mode_time(names: list[str]) -> None:
    spark = _spark()
    from bench import ITERATIVE
    from insight_spark.queries import all_queries

    registry = all_queries()
    for name in names:
        rebuild = name in ITERATIVE
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = registry[name](spark, SF_DIR)
        t0 = time.perf_counter()
        df.toPandas()
        cold = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2 if rebuild else 3):
            t0 = time.perf_counter()
            (registry[name](spark, SF_DIR) if rebuild else df).toPandas()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: cold={cold:.3f}s warm_best={best:.3f}s rebuild={rebuild}")


def mode_kernels() -> None:
    spark = _spark()
    from pyspark.sql import functions as F

    from insight_spark.operators.clustering import lloyd, quantize_micro
    from insight_spark.sources import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", quantize_micro(F.col("embedding")).alias("e")
    )
    for kernel in ("literal", "blas", "literal", "blas"):
        t0 = time.perf_counter()
        final = lloyd(emb, k=8, n_iter=2, vec_col="e", id_col="vec_id",
                      kernel=kernel)
        out = final.groupBy(F.col("cell").cast("int").alias("cell_id")).agg(
            F.count("*").alias("n_points"),
            F.round(F.sum("dist").cast("double") / F.lit(1e12), 6).alias(
                "inertia"
            ),
        )
        rows = sorted(map(tuple, out.collect()))
        dt = time.perf_counter() - t0
        print(f"lloyd kernel={kernel}: {dt:.3f}s rows={rows}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    args = sys.argv[2:]
    if mode == "stream":
        mode_stream(args)
    elif mode == "kernels":
        mode_kernels()
    else:
        mode_time(args)
