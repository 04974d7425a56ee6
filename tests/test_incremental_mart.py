"""Incremental materialized-view maintenance (plans/ledger.py state/merge/finalize):
state-merge must be indistinguishable from full recompute, in any merge order,
including all-unrated increments (NULL rated_sum as additive identity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.plans.ledger import (
    courier_ledger,
    finalize_ledger_state,
    ledger_state,
    merge_ledger_states,
)
from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import courier_domain

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_three_way_merge_any_order_equals_full_recompute(spark):
    d = courier_domain(spark, SF_DIR)
    dims = (d["dm_couriers"], d["dm_orders"], d["dm_timestamps"])
    fct = d["fct_deliveries"]
    slices = [ledger_state(fct.filter(F.col("order_id") % 3 == i), *dims) for i in range(3)]

    full = _rows(courier_ledger(fct, *dims))
    assert _rows(finalize_ledger_state(merge_ledger_states(*slices))) == full
    # merge is order-insensitive (associative + commutative state)
    assert _rows(
        finalize_ledger_state(
            merge_ledger_states(merge_ledger_states(slices[2], slices[0]), slices[1])
        )
    ) == full


def test_all_unrated_increment_merges_as_identity(spark):
    d = courier_domain(spark, SF_DIR)
    dims = (d["dm_couriers"], d["dm_orders"], d["dm_timestamps"])
    fct = d["fct_deliveries"]
    # rating = l_linenumber % 6; rating 0 = unrated → rated_sum is NULL for that slice
    unrated = ledger_state(fct.filter(F.col("rating") == 0), *dims)
    rated = ledger_state(fct.filter(F.col("rating") != 0), *dims)
    got = _rows(finalize_ledger_state(merge_ledger_states(rated, unrated)))
    assert got == _rows(courier_ledger(fct, *dims))
