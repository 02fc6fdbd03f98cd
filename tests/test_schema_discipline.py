"""Schema-discipline gate: no declared query may ship DecimalType output.

The external driver's order-insensitive value hash renders Spark vs
DuckDB decimals differently (round-1 verdict: all 13 hash_match failures
correlated 46/46 with a DECIMAL output column, values byte-identical).
Contract: accumulate in DECIMAL(38,6) internally, final-project
``money_out`` (round(cast(double), 6)) — never DecimalType in the
returned schema.
"""

from __future__ import annotations

from pyspark.sql.types import DecimalType

from insight_spark.queries import all_queries
from tests.conftest import SF_DIR


def test_no_decimal_output_columns(spark):
    offenders = {}
    for name, fn in all_queries().items():
        df = fn(spark, SF_DIR)
        dec = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, DecimalType)
        ]
        if dec:
            offenders[name] = dec
    assert not offenders, f"DecimalType leaked into query output: {offenders}"
