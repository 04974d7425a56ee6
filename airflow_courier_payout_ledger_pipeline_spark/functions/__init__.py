"""Column-level function library (all built-in Catalyst expressions — no Python UDFs
in the core path, so every operator stays inside whole-stage codegen)."""

from airflow_courier_payout_ledger_pipeline_spark.functions.payout import (  # noqa: F401
    TIERS,
    final_reward,
    order_processing_fee,
    rated_avg,
    tier_floor_payout,
    tier_percentage_payout,
)
