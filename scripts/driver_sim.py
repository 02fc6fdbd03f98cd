"""Simulate the external driver's round pass locally.

Vanilla SparkSession (NOT the engine builder — the driver builds its
own), first N registry entries at sf0.01, oracle compare via the same
canonicalization the driver's pandas hash uses.  Prints one line per
query and a final summary; exits nonzero on any failure so this can
gate a round.

Usage: python scripts/driver_sim.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    # Stress tier (sf0.1): cap the O(n²) brute-force oracles to their
    # deterministic md5-range subset BEFORE the registry imports (the
    # oracle SQL is rendered at import time).  The driver tier
    # (sf0.01/sf0.001) keeps exact full-corpus oracles.
    if os.path.normpath(sf_dir).endswith("sf0.1"):
        # loud-failure form: refuses if the frozen-at-import modules
        # already loaded with the flag unset (ADVICE r11)
        from insight_spark.queries import require_stress_subset

        require_stress_subset()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("driver_sim")
        .getOrCreate()
    )
    import __spark_entry__ as contract
    from tests.oracle_harness import compare_query

    queries = contract.queries()
    oracles = contract.oracle_sql()
    names = list(queries)[:n]
    failures: list[str] = []
    for name in names:
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                rep = compare_query(df, oracles[name], sf_dir)
                ok = rep["ok"]
                detail = "" if ok else str({k: v for k, v in rep.items() if k != "ok"})[:300]
            else:
                ok = df.count() >= 0
                detail = "rows-only"
        except Exception as exc:  # noqa: BLE001 — driver-style isolation
            ok, detail = False, f"{type(exc).__name__}: {exc}"[:300]
        dt = time.perf_counter() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name} {dt:.1f}s {detail}")
        sys.stdout.flush()
        if not ok:
            failures.append(name)
    print(f"SUMMARY: {len(names) - len(failures)}/{len(names)} pass; failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
