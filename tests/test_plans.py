"""Physical-plan property tests: the optimizer behaviors SCALE.md claims are
locked in here — pushdown, pruning, broadcasts, shuffle counts, codegen."""

from __future__ import annotations

import pytest

from airflow_courier_payout_ledger_pipeline_spark.plans.bucketing import exchange_count
from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, df, mode="formatted"):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def test_watermark_filter_pushes_down_to_scan(spark, queries):
    plan = _plan(spark, queries["watermark_filter"](spark, SF_DIR))
    assert "PushedFilters" in plan
    assert any(
        "GreaterThan(l_shipdate" in line for line in plan.splitlines()
    ), "watermark predicate must reach the parquet scan"


def test_ledger_broadcasts_all_dims_single_agg_shuffle(spark, queries):
    df = queries["courier_ledger"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3  # couriers, orders, timestamps dims
    assert "SortMergeJoin" not in plan
    # exactly 2 shuffles: the timestamps-dim distinct + the final groupBy
    assert exchange_count(df) <= 2


def test_ledger_scan_prunes_columns(spark, queries):
    plan = _plan(spark, queries["courier_ledger"](spark, SF_DIR))
    lineitem_schema = next(
        line
        for line in plan.splitlines()
        if "ReadSchema" in line and "l_orderkey" in line
    )
    # 5 of 11 lineitem columns needed; quantity/tax/flags must be pruned
    for col in ("l_quantity", "l_tax", "l_returnflag", "l_shipdate"):
        assert col not in lineitem_schema


def test_text_stats_is_shuffle_free(spark, queries):
    df = queries["text_stats"](spark, SF_DIR)
    df.count()
    assert exchange_count(df) == 0  # pure map-side projection


def test_embedding_near_dup_plan_has_no_cartesian_product(spark, queries):
    # the tiled symmetric self-join must plan as equi-joins (broadcast tile
    # table + shuffle join on block id), never a CartesianProduct/BNLJ over
    # the full corpus
    df = queries["embedding_near_dup"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_plan_is_equi_join_not_nested_loop(spark, queries):
    # the time-bucket blocking must plan as a shuffle/broadcast EQUI join; a
    # range predicate alone would fall back to BroadcastNestedLoopJoin
    plan = queries["range_join_incidents"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_is_windowed_union_not_a_join(spark, queries):
    # union + per-key window: no join operator at all in the plan, and only
    # two exchanges total — the query's purchase pre-aggregation plus the
    # as-of window itself (the operator adds exactly one)
    df = queries["asof_join_events"](spark, SF_DIR)
    assert exchange_count(df) == 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_incremental_promotion_cursor_pushes_down(spark, queries):
    # run 2's cursor binds driver-side → both scans show pushed l_shipdate
    # predicates (the second one strictly greater than the derived cursor)
    plan = _plan(spark, queries["incremental_promotion"](spark, SF_DIR))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l and "GreaterThan(l_shipdate" in l]
    assert pushed, "derived cursor must reach the parquet scan"


def test_profile_is_single_aggregation_pass(spark, queries):
    # one scan + expand for the multi-count-distinct; no per-column jobs
    plan = queries["profile_documents"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert "Expand" in plan


def test_core_queries_stay_in_wholestage_codegen(spark, queries):
    # AQE wraps the plan until execution and hides codegen spans; disable it for
    # the static-plan inspection (codegen behavior itself is AQE-independent)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ("courier_ledger", "filtered_agg", "tier_payout", "text_stats"):
            plan = queries[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
            # '*(n)' operator prefixes mark whole-stage-codegen spans
            assert "*(" in plan, f"{name} fell off the codegen path"
            assert "BatchEvalPython" not in plan, f"{name} has a row-at-a-time Python UDF"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
