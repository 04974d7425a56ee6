"""Plan-shape assertions for the round-3 operators: every scale claim made in
docstrings/SCALE.md is checked against the actual physical plan."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _simple_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pii_scrub_is_zero_shuffle(spark):
    from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

    df = all_queries()["pii_scrub"](spark, SF)
    plan = _simple_plan(df)
    assert "Exchange" not in plan  # pure map-side scrub at any corpus size


def test_doc_chunking_is_zero_shuffle(spark):
    from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

    df = all_queries()["doc_chunking"](spark, SF)
    plan = _simple_plan(df)
    assert "Exchange" not in plan
    assert "Generate" in plan  # explode fan-out, not a join


def test_per_source_cap_group_limit_pushdown(spark):
    from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

    df = all_queries()["per_source_cap"](spark, SF)
    plan = _simple_plan(df)
    # the partial group-limit before the exchange is what bounds shuffled rows
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_skew_profile_reuses_count_exchange(spark):
    from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

    df = all_queries()["key_skew_profile"](spark, SF)
    df.collect()  # AQE finalizes the plan at runtime
    plan = _simple_plan(df)
    assert "ReusedExchange" in plan  # counts shuffle materialized once


def test_funnel_single_shuffle(spark):
    from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

    df = all_queries()["funnel_conversion"](spark, SF)
    plan = _simple_plan(df)
    assert plan.count("Exchange") <= 1, plan


def test_cube_single_expand(spark):
    from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

    df = all_queries()["cube_status_priority"](spark, SF)
    plan = _simple_plan(df)
    assert plan.count("Expand") == 1  # all 4 grouping sets in one pass


def test_lsh_pipeline_shuffle_budget(spark):
    """In-array signatures leave exactly three exchanges in the LSH pipeline:
    the parallelism spread, the band-bucket groupBy, and the pair dedup —
    no signature-aggregation shuffle survives."""
    from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

    df = all_queries()["dedup_minhash_lsh"](spark, SF)
    plan = _simple_plan(df)
    assert plan.count("Exchange") <= 3, plan
