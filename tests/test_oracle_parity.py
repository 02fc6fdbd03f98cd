"""The central gate: every oracled query hash-matches DuckDB (SURVEY §5.3.1).

Mirrors the driver's t2 check locally at sf0.001 (fast); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to run at driver scale.
Also runs the determinism gate (§5.3.6): each query twice, identical
canonical rows.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as contract
from tests.oracle_harness import canonical_rows, compare_query

ALL = sorted(contract.queries().keys())
ORACLED = sorted(contract.oracle_sql().keys())


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
    a = fn(spark, sf_dir)
    rows_a = canonical_rows(a.columns, [tuple(r) for r in a.collect()])
    b = fn(spark, sf_dir)
    rows_b = canonical_rows(b.columns, [tuple(r) for r in b.collect()])
    assert rows_a == rows_b, f"{name} is nondeterministic across runs"


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns
