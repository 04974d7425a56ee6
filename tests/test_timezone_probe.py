"""Non-UTC session-timezone parity probe: timestamp/date-dependent queries must
still hash-match their (timezone-agnostic) DuckDB oracles when the Spark
session runs in a non-UTC zone — the deployment reality the verify recipe
spot-checks, pinned here as a standing test. Catches any accidental use of a
session-zone-dependent conversion (LTZ casts, unix_timestamp on NTZ, to_date
over LTZ) in a query whose oracle is NTZ arithmetic.

Representative set: every round-10 date/time query + one veteran per
time-shape (tumbling window, as-of, rolling range, date dim, calendar spine).
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duckdb_con

from airflow_courier_payout_ledger_pipeline_spark.registry import all_oracles, all_queries

SF = "/root/testdata/sf0.001"

PROBED = [
    # round-10 date/time-dependent additions
    "zorder_incremental_compaction",
    "kmv_rolling_7d_distinct",
    "quantile_rolling_7d",
    "asof_join_forward_tolerance",
    "trend_slope_per_type",
    # one veteran per time-shape
    "event_windows_tumbling",
    "asof_join_events",
    "rolling_7d_counts",
    "timestamp_dim",
    "date_spine_fill",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", PROBED)
def test_query_matches_oracle_under_non_utc_session_tz(spark, con, name):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        compare(all_queries()[name](spark, SF), con, all_oracles()[name], name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
