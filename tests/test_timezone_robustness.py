"""Non-UTC session-timezone robustness (verify-skill probe, pinned).

The external driver builds its OWN SparkSession; nothing guarantees it
runs with ``spark.sql.session.timeZone=UTC``.  Every timestamp that
crosses the Python boundary (collect/toPandas) is rendered in the
*session* zone, so a non-UTC session would shift rendered timestamps —
and any date_trunc/window arithmetic done in zoned semantics — away
from the DuckDB oracle unless the read path repairs it.

``load_table`` pins the session to UTC at read time precisely for this
case; these tests flip the shared session to hostile zones (both signs
of offset, plus one with a DST transition inside the fixture's event
range) and assert oracle parity for the most timestamp-entangled query
shapes: sessionization (epoch gaps), hourly window aggregation
(date_trunc grid), calendar cohorts (DATE casts), and week-grid lag.
"""

from __future__ import annotations

import pytest

from insight_spark.queries import all_oracle_sql, all_queries

from tests.conftest import SF_DIR
from tests.oracle_harness import compare_query

#: Timestamp-entangled query shapes: epoch-gap sessionization, hourly
#: date_trunc windows, DATE-cast cohort calendars, week-grid lag.
_TS_QUERIES = (
    "sessionize",
    "stream_hourly_counts",
    "retention_cohorts",
    "wow_revenue_delta",
)

#: Hostile zones: negative offset with a DST jump inside the fixture's
#: 2024 event range, positive fixed offset, and a half-hour offset.
_ZONES = ("America/New_York", "Asia/Tokyo", "Asia/Kolkata")


@pytest.mark.parametrize("zone", _ZONES)
def test_oracle_parity_survives_non_utc_session(spark, zone):
    q, o = all_queries(), all_oracle_sql()
    original = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", zone)
    try:
        for name in _TS_QUERIES:
            rep = compare_query(q[name](spark, SF_DIR), o[name], SF_DIR)
            assert rep["ok"], f"{name} diverged under {zone}: {rep}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
