"""Oracle-check a NAMED list of registry queries (driver-style compare).

Usage: python scripts/check_queries.py name1 name2 ... [--sf DIR]
Defaults to sf0.01 (the driver's correctness tier).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if os.path.normpath(sf_dir).endswith("sf0.1"):
        os.environ.setdefault("SPARK_GRAFT_STRESS_SUBSET", "1")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("check_queries")
        .getOrCreate()
    )
    import __spark_entry__ as contract
    from tests.oracle_harness import compare_query

    queries = contract.queries()
    oracles = contract.oracle_sql()
    failures: list[str] = []
    for name in argv:
        if name not in queries:
            print(f"FAIL {name} — not registered")
            failures.append(name)
            continue
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                rep = compare_query(df, oracles[name], sf_dir)
                ok = rep["ok"]
                detail = (
                    ""
                    if ok
                    else str({k: v for k, v in rep.items() if k != "ok"})[:400]
                )
            else:
                ok = df.count() >= 0
                detail = "rows-only"
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"{type(exc).__name__}: {exc}"[:400]
        dt = time.perf_counter() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name} {dt:.1f}s {detail}")
        sys.stdout.flush()
        if not ok:
            failures.append(name)
    print(f"SUMMARY: {len(argv) - len(failures)}/{len(argv)}; failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
