"""Structured Streaming twins must agree with their batch counterparts when the
stream is drained with availableNow (bounded replay ≡ batch)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.operators.windows import (
    sessionize,
    tumbling_counts,
)
from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import read_events
from airflow_courier_payout_ledger_pipeline_spark.streaming.events import (
    read_event_stream,
    run_available_now,
    sessionize_stream,
    windowed_counts_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_tumbling_equals_batch(spark):
    stream = read_event_stream(spark, SF_DIR)
    got = run_available_now(windowed_counts_stream(stream), "stream_tumbling")
    batch = tumbling_counts(read_events(spark, SF_DIR))
    g = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum) for r in got.collect()
    }
    b = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum) for r in batch.collect()
    }
    # the final (open) windows are withheld by the watermark in append mode;
    # every window the stream DID emit must match batch exactly, and most must emit
    assert g, "stream emitted nothing"
    assert len(g) >= len(b) - 10
    for k, v in g.items():
        assert b[k] == v


def test_streaming_sessionize_matches_batch_closed_sessions(spark):
    stream = read_event_stream(spark, SF_DIR)
    got = run_available_now(sessionize_stream(stream, idle_timeout=False), "stream_sessions")
    srows = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in got.collect()
    }
    batch = sessionize(read_events(spark, SF_DIR), 30)
    brows = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in batch.collect()
    }
    # streaming emits only gap-closed sessions in one availableNow pass (the last
    # session per user stays in state awaiting timeout) — so emitted ⊂ batch and
    # per-user emitted count = batch count − 1
    assert srows, "stream emitted no sessions"
    assert srows <= brows
    users = {u for u, *_ in brows}
    from collections import Counter

    sc = Counter(u for u, *_ in srows)
    bc = Counter(u for u, *_ in brows)
    for u in users:
        assert sc[u] == bc[u] - 1


def test_clone_rebind_hook_engages_on_this_spark_build(spark):
    """Version-drift canary (r15 verdict item 5): the internal
    ``Dataset.ofRows`` hook that re-binds the drained plan into the session
    clone must exist on THIS Spark build. If an upgrade moves it,
    ``_rebind_to_scoped_clone`` falls back to the session-global
    shuffle-partition pin and emits a RuntimeWarning — this test turns that
    silent concurrency-semantics swap into a red test at upgrade time (the
    warning is escalated to an error, and the clone path is asserted
    directly)."""
    import warnings

    from airflow_courier_payout_ledger_pipeline_spark.streaming.events import (
        _rebind_to_scoped_clone,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    df = spark.range(5).toDF("id")  # any logical plan re-binds; batch is fine
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        run_df, scoped = _rebind_to_scoped_clone(df, 4)
    assert scoped is not None, "clone re-binding fell back on this Spark build"
    assert run_df.sparkSession is scoped
    assert scoped.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert [r.id for r in run_df.orderBy("id").collect()] == list(range(5))


def test_run_available_now_leaves_caller_session_conf_untouched(spark):
    """The state-sized shuffle-partition pin must live in a newSession() clone:
    the caller's session-global spark.sql.shuffle.partitions is NEVER mutated,
    even transiently, so concurrently planned batch queries keep their
    CPU-oriented default (the old mutate-then-restore leaked the streaming
    value to interleaved planners)."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    stream = read_event_stream(spark, SF_DIR)
    got = run_available_now(
        windowed_counts_stream(stream), "stream_conf_scope", state_partitions=4
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert got.count() > 0
    # the drain really ran at the pinned width: its session is the clone
    assert got.sparkSession is not spark
    assert got.sparkSession.conf.get("spark.sql.shuffle.partitions") == "4"
    # the memory sink registered in the clone, not the caller's catalog
    assert not spark.catalog.tableExists("stream_conf_scope")
    # the clone INHERITS the caller's runtime conf (newSession() alone would
    # reset to defaults — e.g. a non-UTC session timezone must reach the
    # drained plan, or timezone probes over streaming queries test nothing)
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        got2 = run_available_now(
            windowed_counts_stream(read_event_stream(spark, SF_DIR)),
            "stream_conf_scope_tz",
            state_partitions=4,
        )
        assert (
            got2.sparkSession.conf.get("spark.sql.session.timeZone")
            == "Asia/Kolkata"
        )
        assert got2.count() > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
