"""Range-join semantics: bucket-boundary crossing, end-exclusivity, key isolation."""

from __future__ import annotations

from datetime import datetime

from airflow_courier_payout_ledger_pipeline_spark.operators.rangejoin import (
    range_join_bucketed,
)


def _ts(m, s=0):
    return datetime(2023, 1, 1, 10, m, s)


def test_range_join_bucket_crossing_and_end_exclusive(spark):
    events = spark.createDataFrame(
        [
            (1, _ts(14, 59), 1.0),  # just before interval
            (1, _ts(15), 2.0),      # == start -> included
            (1, _ts(29), 3.0),      # inside, same bucket as start
            (1, _ts(31), 4.0),      # inside, NEXT 30-min bucket (crossing)
            (1, _ts(45), 5.0),      # == end -> excluded
            (2, _ts(20), 6.0),      # other key
        ],
        "k int, ts timestamp, v double",
    )
    intervals = spark.createDataFrame(
        [(1, _ts(15), _ts(45), "i1")], "k int, t0 timestamp, t1 timestamp, tag string"
    )
    out = sorted(
        r.v for r in range_join_bucketed(events, intervals, "k", "ts", "t0", "t1", 30).collect()
    )
    assert out == [2.0, 3.0, 4.0]
