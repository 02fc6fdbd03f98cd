"""The central gate: every oracled query hash-matches DuckDB (SURVEY §5.3.1).

Mirrors the driver's t2 check locally at sf0.001 (fast); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to run at driver scale.
Also runs the determinism gate (§5.3.6): each query twice, identical
canonical rows.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as contract
from insight_spark.engine import (
    LOCAL_PERF_CONF,
    SEMANTIC_CONF,
    conf_snapshot,
)
from insight_spark.queries.optimizer_rt import (
    BHJ_PROBE_CONF,
    BLOOM_PROBE_CONF,
    SKEW_PROBE_CONF,
)
from tests.oracle_harness import canonical_rows, compare_query

ALL = sorted(contract.queries().keys())
ORACLED = sorted(contract.oracle_sql().keys())

#: Planner-relevant session confs no query may leave modified — every
#: query shares ONE session, so a leaked threshold (a plan probe's
#: 256-byte advisory partition size, a streaming drain's partition
#: pin, a RocksDB provider switch) silently re-plans every query that
#: runs after it.  The engine's own contract confs, every knob the
#: optimizer_rt plan probes touch (imported, so the list cannot drift
#: from the probes), plus the streaming/scan knobs other queries pin
#: and restore inline.
_GUARDED_CONFS = sorted(
    set(SEMANTIC_CONF)
    | set(LOCAL_PERF_CONF)
    | set(SKEW_PROBE_CONF)
    | set(BHJ_PROBE_CONF)
    | set(BLOOM_PROBE_CONF)
    | {
        "spark.sql.streaming.stateStore.providerClass",
        "spark.sql.files.maxPartitionBytes",
    }
)


def _conf_snapshot(spark):
    return conf_snapshot(spark, _GUARDED_CONFS)


def test_every_oracle_has_query():
    assert set(ORACLED) <= set(ALL)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_dir, name):
    df = contract.queries()[name](spark, sf_dir)
    report = compare_query(df, contract.oracle_sql()[name], sf_dir)
    assert report["ok"], f"{name}: {report}"


@pytest.mark.parametrize("name", [n for n in ALL if n not in ORACLED])
def test_rows_only_queries_run(spark, sf_dir, name):
    df = contract.queries()[name](spark, sf_dir)
    assert df.count() >= 0


@pytest.mark.parametrize("name", ALL)
def test_determinism(spark, sf_dir, name):
    fn = contract.queries()[name]
    conf_before = _conf_snapshot(spark)
    a = fn(spark, sf_dir)
    rows_a = canonical_rows(a.columns, [tuple(r) for r in a.collect()])
    b = fn(spark, sf_dir)
    rows_b = canonical_rows(b.columns, [tuple(r) for r in b.collect()])
    assert rows_a == rows_b, f"{name} is nondeterministic across runs"
    conf_after = _conf_snapshot(spark)
    drift = {
        k: (conf_before[k], conf_after[k])
        for k in _GUARDED_CONFS
        if conf_before[k] != conf_after[k]
    }
    assert not drift, (
        f"{name} leaked session confs (every later query in the shared "
        f"session would re-plan under them): {drift}"
    )


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns
