"""Constraint validation: the reference's CHECK / NOT NULL / UNIQUE / FK DDL
constraints (``sql/DDL_cdm.dm_courier_ledger.sql:20-29``,
``sql/DDL_dds.fct_deliveries.sql:42-49``) re-expressed as write-path validators —
Spark tables have no enforced constraints, so enforcement moves into the job
(SURVEY.md §1.2; Delta deployments can additionally declare the same expressions
as table CHECK constraints).

Three enforcement modes, all single-pass (violation flags are plain expressions;
uniqueness/FK checks are one aggregation/anti-join each):
- ``annotate``: add a ``violations`` array column (observability pipelines)
- ``drop``: quarantine violating rows (returns clean + quarantined frames)
- ``error``: raise on the first violating batch (the Postgres behavior)
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    predicate: Column  # True ⇒ row is valid


def not_null(*cols: str) -> list[Check]:
    return [Check(f"{c}_not_null", F.col(c).isNotNull()) for c in cols]


def between(col: str, lo, hi) -> Check:
    return Check(f"{col}_between_{lo}_{hi}", F.col(col).between(lo, hi))


def non_negative(*cols: str) -> list[Check]:
    return [Check(f"{c}_non_negative", F.col(c) >= 0) for c in cols]


#: cdm.dm_courier_ledger constraints (DDL_cdm.dm_courier_ledger.sql:7-28)
def ledger_checks() -> list[Check]:
    return [
        *not_null(
            "courier_id",
            "courier_name",
            "settlement_year",
            "settlement_month",
            "orders_count",
            "orders_total_sum",
            "rate_avg",
            "order_processing_fee",
            "courier_order_sum",
            "courier_tips_sum",
            "courier_reward_sum",
        ),
        between("settlement_year", 2022, 2100),
        between("settlement_month", 1, 12),
        between("rate_avg", 0, 5),
        *non_negative(
            "orders_count",
            "orders_total_sum",
            "order_processing_fee",
            "courier_order_sum",
            "courier_tips_sum",
            "courier_reward_sum",
        ),
    ]


#: dds.fct_deliveries constraints (DDL_dds.fct_deliveries.sql:35-49)
def fact_checks() -> list[Check]:
    return [
        *not_null("delivery_key", "order_id", "timestamp_id", "order_sum", "courier_id"),
        between("rating", 0, 5),
        *non_negative("order_sum", "tips"),
    ]


def violations_column(checks: Sequence[Check]) -> Column:
    """Array of failed-check names per row (empty ⇒ valid). A check fails only when
    its predicate is definitively FALSE — NULL passes, exactly like SQL CHECK
    constraints (NULL rows are caught by their NOT NULL checks instead)."""
    return F.array_compact(
        F.array(*[F.when(c.predicate.eqNullSafe(False), F.lit(c.name)) for c in checks])
    )


def annotate(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    return df.withColumn("violations", violations_column(checks))


def quarantine(df: DataFrame, checks: Sequence[Check]) -> tuple[DataFrame, DataFrame]:
    """(clean rows, violating rows with reasons)."""
    flagged = annotate(df, checks)
    clean = flagged.filter(F.size("violations") == 0).drop("violations")
    bad = flagged.filter(F.size("violations") > 0)
    return clean, bad


def enforce(df: DataFrame, checks: Sequence[Check], max_show: int = 5) -> DataFrame:
    """Postgres-style: abort the write when any row violates. Returns the input
    (for chaining) after an eager validation pass."""
    _, bad = quarantine(df, checks)
    sample = bad.limit(max_show).collect()
    if sample:
        lines = "\n".join(f"  {r.asDict()}" for r in sample)
        raise ValueError(f"constraint violations (showing ≤{max_show}):\n{lines}")
    return df


def assert_unique(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """UNIQUE constraint (e.g. (courier_id, settlement_year, settlement_month),
    DDL_cdm.dm_courier_ledger.sql:29): one aggregation, raises on duplicates."""
    dup = (
        df.groupBy(*keys).agg(F.count("*").alias("n")).filter(F.col("n") > 1).limit(5).collect()
    )
    if dup:
        raise ValueError(f"unique constraint violated on {list(keys)}: {dup}")
    return df


def fk_violations(fact: DataFrame, fk: str, dim: DataFrame, pk: str = "id") -> DataFrame:
    """FOREIGN KEY check (DDL_dds.fct_deliveries.sql:42-44): fact rows whose FK has
    no dim row — one left-anti join (broadcast when the dim is small)."""
    return fact.join(dim.select(F.col(pk).alias(fk)), fk, "left_anti")
