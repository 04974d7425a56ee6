"""Range (interval) join: match point events to time intervals per key — the
temporal containment join (events-in-session, reading-in-maintenance-window,
click-in-campaign). The reference joins only on equality (SURVEY.md §2.4); Spark
plans a naive ``l.key = r.key AND l.ts BETWEEN r.start AND r.end`` as a
BroadcastNestedLoopJoin or an equi-join with a post-filter whose per-key fan-out
is |events-per-key| × |intervals-per-key|.

Scale shape — time-bucket blocking: quantize time into fixed buckets, explode each
interval into the buckets it covers, equi-join on (key, bucket), then apply the
exact range predicate. With bucket width >= max interval length every interval
covers <= 2 buckets, so the blow-up factor is bounded by 2 and the join is a plain
shuffle equi-join on a composite key — the same trick as the LSH band join, with
time instead of hash bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket_minutes: int = 30,
) -> DataFrame:
    """Inner join of ``events`` rows to ``intervals`` rows of the same ``key``
    with ``start <= ts < end`` (end-exclusive). Returns all columns of both
    inputs. Correct for any interval length (the explode covers every bucket the
    interval spans); the <=2-buckets-per-interval cost bound holds when
    ``bucket_minutes`` >= the maximum interval length — size it accordingly."""
    width_us = bucket_minutes * 60 * 1_000_000
    # cast first: unix_micros rejects TIMESTAMP_NTZ (parquet micros columns);
    # the bucket key is internal, so session-tz interpretation is consistent
    # across both join sides
    ev_bucket = (F.unix_micros(F.col(ts).cast("timestamp")) / width_us).cast("long")
    iv_start_b = (F.unix_micros(F.col(start).cast("timestamp")) / width_us).cast("long")
    iv_end_b = (F.unix_micros(F.col(end).cast("timestamp")) / width_us).cast("long")

    e = events.withColumn("__bucket", ev_bucket)
    i = intervals.withColumn(
        "__bucket", F.explode(F.sequence(iv_start_b, iv_end_b))
    )
    return (
        e.join(i, [key, "__bucket"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("__bucket")
    )
