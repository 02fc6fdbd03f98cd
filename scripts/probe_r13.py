"""r13 paired A/B probe: isolated warm timings for the round's touched
queries, bench-protocol-faithful (ITERATIVE rebuild inside the timed
region, toPandas action, best-of-N), one JSON line out.

Run the SAME script from the baseline worktree and from the current
tree, alternating processes, for a same-box paired comparison:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/probe_r13.py q1 q2 ...

Prints {"tree": <repo dir>, "queries": {name: [rep_s, ...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

REPS = int(os.environ.get("PROBE_REPS", "3"))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if os.path.normpath(sf_dir).endswith("sf0.1"):
        from insight_spark.queries import require_stress_subset

        require_stress_subset()
    from insight_spark.engine import get_spark
    from insight_spark.queries import all_queries, set_lint_default
    from insight_spark.sources import load_table

    set_lint_default(False)
    spark = get_spark("probe_r13")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    load_table(spark, sf_dir, "lineitem").count()  # JVM warm

    out: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        registry[name](spark, sf_dir).toPandas()  # cold
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).toPandas()
            reps.append(round(time.perf_counter() - t0, 4))
        out[name] = reps
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"tree": HERE, "queries": out}))


if __name__ == "__main__":
    main()
