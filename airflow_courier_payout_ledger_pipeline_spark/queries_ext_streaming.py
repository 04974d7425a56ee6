"""Structured Streaming drains: tumbling windows, dedup, compact-latest, stream-stream join, stateful sessionization (availableNow, oracle-hashed).

Split out of the former monolithic queries_ext.py (round 10) so the
changed-file -> re-adjudicate rule schedules only this domain's queries.
Registration side effects: importing this module registers its queries.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.registry import register


# =====================================================================================
# Structured Streaming, driver-checked: availableNow drain ≡ SQL over the same data
# =====================================================================================

# Append mode emits a window only once the watermark (max event time − 1 h) passes
# its end: window_end <= max_ts − 1 h  ⇔  window_start <= max_ts − 2 h. On empty
# input the scalar subquery is NULL and both engines emit nothing.
STREAMING_TUMBLING_ORACLE = """
WITH agg AS (
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DECIMAL(14,2)) AS v
    FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n_events, v::DOUBLE AS value_sum
FROM agg
WHERE window_start + INTERVAL '2 hours' <= (SELECT max(ts) FROM events)
"""


@register("streaming_windows_tumbling", STREAMING_TUMBLING_ORACLE)
def q_streaming_windows_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming under the driver's gate: readStream over the
    events parquet → 1 h watermark → tumbling-window agg → availableNow drain
    into a memory sink. The oracle encodes append-mode semantics exactly (only
    watermark-closed windows are emitted), so incremental streaming execution is
    hash-checked against one SQL statement — the stream ≡ batch contract."""
    from airflow_courier_payout_ledger_pipeline_spark.streaming.events import (
        read_event_stream,
        run_available_now,
        windowed_counts_stream,
    )

    stream = read_event_stream(spark, sf_dir)
    return run_available_now(windowed_counts_stream(stream), "drv_stream_tumbling")


# One availableNow pass emits exactly the gap-CLOSED sessions; each user's final
# session stays open in state (QUALIFY drops the per-user last session). Money
# accumulates as integer cents in state — the emitted doubles are exact.
STREAMING_SESSION_ORACLE = """
WITH o AS (
    SELECT user_id, ts, CAST(round(value * 100, 0) AS BIGINT) AS cents,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
    SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS seq
    FROM o
),
agg AS (
    SELECT user_id, seq, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, SUM(cents)::BIGINT AS cents
    FROM s GROUP BY 1, 2
)
SELECT user_id, session_start, session_end, n_events,
       (cents::DOUBLE / 100) AS value_sum
FROM agg
QUALIFY seq < max(seq) OVER (PARTITION BY user_id)
"""


STREAMING_DEDUP_ORACLE = """
SELECT DISTINCT user_id, event_type FROM events
"""

# Streaming-dedup state = (#distinct keys whose last arrival is within the
# watermark horizon) × key width, so the horizon is THE state-size knob:
# horizon × key-arrival-rate bounds the HDFSBackedStateStore footprint. A live
# deployment sets it to the source's max lateness (DEDUP_DEPLOY_HORIZON — keys
# quieter than that can be re-emitted, which insert-ignore sinks absorb
# idempotently). The driver's gate replays years of bounded history in one
# availableNow pass, where exact set-equality with SELECT DISTINCT requires the
# horizon to cover the whole replayed span (DEDUP_REPLAY_HORIZON). Same code
# path either way — the checked artifact and the deployable default differ only
# by this argument.
DEDUP_DEPLOY_HORIZON = "1 hour"
DEDUP_REPLAY_HORIZON = "3650 days"


def streaming_dedup(
    spark: SparkSession, sf_dir: str, watermark: str = DEDUP_DEPLOY_HORIZON
) -> DataFrame:
    """Streaming SCD0: watermarked dropDuplicates state emits each
    (user_id, event_type) key once across micro-batches; projecting the keys
    (not the arbitrary winning row) makes the emission set equal to batch
    SELECT DISTINCT regardless of arrival order — the stream ≡ batch contract
    for insert-ignore (streaming/ingest.stream_dedup)."""
    from airflow_courier_payout_ledger_pipeline_spark.streaming.events import (
        read_event_stream,
        run_available_now,
    )
    from airflow_courier_payout_ledger_pipeline_spark.streaming.ingest import (
        stream_dedup,
    )

    stream = read_event_stream(spark, sf_dir)
    dd = stream_dedup(
        stream, ["user_id", "event_type"], ts_col="ts", watermark=watermark
    ).select("user_id", "event_type")
    return run_available_now(dd, "drv_stream_dedup")


@register("streaming_dedup", STREAMING_DEDUP_ORACLE)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded-replay configuration of ``streaming_dedup``: full-span
    horizon so one availableNow drain is set-equal to SELECT DISTINCT (see the
    DEDUP_*_HORIZON note above for the deployable state-bounded default)."""
    return streaming_dedup(spark, sf_dir, watermark=DEDUP_REPLAY_HORIZON)


STREAMING_COMPACT_ORACLE = """
SELECT user_id, ts AS last_ts, event_type AS last_event_type, value AS last_value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


@register("streaming_compact_latest", STREAMING_COMPACT_ORACLE)
def q_streaming_compact_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction as a real stream: foreachBatch folds each micro-batch
    into a latest-row-per-key lakehouse table via argmax on (ts, event_id) —
    associative, so the final state is hash-identical to one batch QUALIFY
    statement under any micro-batch split (streaming/ingest.stream_compact_latest)."""
    import tempfile

    from airflow_courier_payout_ledger_pipeline_spark.sources.lakehouse import Lakehouse
    from airflow_courier_payout_ledger_pipeline_spark.streaming.events import (
        read_event_stream,
    )
    from airflow_courier_payout_ledger_pipeline_spark.streaming.ingest import (
        stream_compact_latest,
    )

    tmp = tempfile.mkdtemp(prefix="compact_latest_")
    lake = Lakehouse(f"{tmp}/lake")
    stream = read_event_stream(spark, sf_dir)
    schema = stream.schema
    q = stream_compact_latest(
        stream,
        lake,
        "dds",
        "latest_events",
        keys=["user_id"],
        order_cols=["ts", "event_id"],
        checkpoint=f"{tmp}/ckpt",
        query_name="drv_compact_latest",
    )
    q.awaitTermination()
    return lake.read(spark, "dds", "latest_events", schema).select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


STREAM_JOIN_ORACLE = """
SELECT c.user_id,
       c.event_id AS click_id,
       c.ts AS click_ts,
       p.event_id AS purchase_id,
       p.ts AS purchase_ts,
       p.value AS purchase_value
FROM events c
JOIN events p
  ON c.event_type = 'click' AND p.event_type = 'purchase'
 AND c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
"""


@register("streaming_stream_join", STREAM_JOIN_ORACLE)
def q_streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join: clicks joined to same-user
    purchases within [click, click + 30 min], both sides watermarked so Spark
    can expire join state (state size = watermark horizon × per-user rate, not
    stream length). Inner-join emission is match-time, not watermark-time, so
    one availableNow drain emits exactly the batch range-join's pair set —
    hash-checked against the SQL twin."""
    from airflow_courier_payout_ledger_pipeline_spark.streaming.events import (
        read_event_stream,
        run_available_now,
    )

    stream = read_event_stream(spark, sf_dir)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 30 MINUTES"
        ),
        "inner",
    ).select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value"
    )
    return run_available_now(joined, "drv_stream_join")


@register("streaming_sessionization", STREAMING_SESSION_ORACLE)
def q_streaming_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful operator (applyInPandasWithState sessionizer) executed
    as a real stream and hash-checked: one availableNow pass emits every
    gap-closed session; the oracle reproduces that emission set in SQL by
    dropping each user's open last session. Proves the Pandas state machine
    agrees µs- and cent-exactly with the declarative window formulation."""
    from airflow_courier_payout_ledger_pipeline_spark.streaming.events import (
        read_event_stream,
        run_available_now,
        sessionize_stream,
    )

    stream = read_event_stream(spark, sf_dir)
    return run_available_now(
        sessionize_stream(stream, idle_timeout=False), "drv_stream_sessions"
    )
