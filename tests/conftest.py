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
