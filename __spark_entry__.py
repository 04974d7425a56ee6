"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real registry lives in
``airflow_courier_payout_ledger_pipeline_spark/registry.py`` (plus the
``queries_core`` / ``queries_ext`` modules that populate it); this file is a thin
stable shim.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the courier settlement ledger) on /root/testdata/sf0.001."""
    from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

    return all_queries()["courier_ledger"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible operators)."""
    from airflow_courier_payout_ledger_pipeline_spark.registry import all_oracles

    return all_oracles()
