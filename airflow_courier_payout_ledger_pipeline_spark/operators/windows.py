"""Event-time window aggregations over the events stream-table: tumbling, sliding,
and gap-based sessionization — the batch expressions whose streaming twins live in
``streaming/events.py`` (same logical plan, incremental state there).

The reference has no windowing at all (SURVEY.md §2.8 — its incrementality is
watermark micro-batching); these are the extension operators a 100 TB event
pipeline needs. All built-in expressions: ``F.window`` compiles to a projection +
hash-agg (one shuffle on (window, keys)); sessionization is a windowed lag +
running sum (one shuffle on user, then ordered scan per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MONEY = "decimal(14,2)"


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Per (1-hour window, event_type): count + value sum. Windows are epoch-aligned
    (same as DuckDB time_bucket for hour granularity)."""
    w = F.window("ts", duration)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(MONEY)).cast(MONEY).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sliding_counts(
    events: DataFrame, duration: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding windows: each event lands in duration/slide windows (here 4)."""
    w = F.window("ts", duration, slide)
    return (
        events.groupBy(w.alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the inter-event gap
    exceeds ``gap_minutes``. Returns one row per session with start/end/count/value.

    Classic lag + running-sum formulation — identical semantics to the streaming
    ``session_window``/applyInPandasWithState path, but expressible in any SQL
    engine (the oracle runs the same window functions in DuckDB)."""
    by_user = Window.partitionBy("user_id").orderBy("ts")
    # microsecond precision: second-truncation would misclassify gaps that cross
    # the threshold within one second
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = micros - F.lag(micros).over(by_user)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sessions = events.withColumn(
        "session_seq",
        F.sum(new_session).over(by_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(MONEY)).cast(MONEY).alias("value_sum"),
    )
