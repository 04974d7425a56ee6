"""Bucketed tables: pre-shuffled storage so the big fact ⋈ orders-dim join runs
with ZERO exchanges (SCALE.md — the 100 TB path once dm_orders outgrows broadcast).

``bucketBy(n, key)`` writes each table pre-partitioned (and here pre-sorted) by
the join key; Spark's bucketed-scan rule then plans a SortMergeJoin with no
Exchange on either side — the shuffle happened once at write time and is amortized
over every subsequent join, the same trade Hive/Iceberg/Delta make with clustered
tables. The test asserts the no-Exchange property from the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, keys: list[str], num_buckets: int = 16
) -> None:
    """Persist as a bucketed (+ per-bucket sorted) managed parquet table.
    Delegates to the ONE shared write chain (`sources.lakehouse.
    bucketed_save_as_table`) so these demo tables and the production
    `Lakehouse.write_bucketed` rail cannot drift."""
    from airflow_courier_payout_ledger_pipeline_spark.sources.lakehouse import (
        bucketed_save_as_table,
    )

    bucketed_save_as_table(df, table, keys, num_buckets)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — shuffle-free by
    construction (verify via .explain: no Exchange above either scan)."""
    return spark.table(left_table).join(spark.table(right_table), key, "inner")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan (broadcast
    exchanges move only the small side and don't count as shuffles)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line and "Reused" not in line
    )
