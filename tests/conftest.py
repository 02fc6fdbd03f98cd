"""Shared pytest fixtures: one warm SparkSession per test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from insight_spark.engine import get_spark  # noqa: E402
from insight_spark.streaming.proto_shim import activate as _activate_proto  # noqa: E402

# Must run before ANY SparkSession is built: the TWS state-server
# workers are subprocesses of the JVM and inherit PYTHONPATH from it.
_activate_proto()

#: Small SF for fast unit-level parity; the driver gate runs sf0.01.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("insight_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def registry_builds(spark):
    """Every declared query built ONCE per test session, cached as
    ``name -> (DataFrame, executed-plan string)``.

    The registry-wide structural gates (the collect lint, the decimal
    lint, the unpartitioned-window lint, the rowwise-Python lint, the
    oracle result-type lint) each used to build all 480 queries
    themselves — five separate full-registry builds, and a build is
    not free: the side-effecting queries (stream drains, manifest
    commits, iterative rounds) EXECUTE while their DataFrame is being
    built.  Those five tests were 17 of the non-parity suite's 26
    minutes (r13 measurement), which is what pushed the suite past the
    driver's pytest window (VERDICT r12 task 1).  One shared build per
    session keeps every gate's full-registry coverage at a fifth of
    the cost."""
    from insight_spark.queries import all_queries

    builds = {}
    for name, fn in all_queries().items():
        df = fn(spark, SF_DIR)
        builds[name] = (
            df,
            df._jdf.queryExecution().executedPlan().toString(),
        )
    return builds
