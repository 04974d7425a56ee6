"""Every registered query must match its DuckDB oracle — the same gate the driver
applies at sf0.01 (we run sf0.001 for speed; set ORACLE_SF_DIR to widen)."""

from __future__ import annotations

import os

import pytest

from tests.oracle_harness import compare, duckdb_con

from airflow_courier_payout_ledger_pipeline_spark.registry import all_oracles, all_queries

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

_queries = all_queries()
_oracles = all_oracles()


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_oracles))
def test_oracle_parity(spark, con, name):
    df = _queries[name](spark, SF_DIR)
    compare(df, con, _oracles[name], name)


@pytest.mark.parametrize("name", sorted(set(_queries) - set(_oracles)))
def test_rows_only_queries_run(spark, name):
    """Non-SQL-expressible ops: at least run and produce a stable schema."""
    df = _queries[name](spark, SF_DIR)
    assert df.columns
    df.limit(5).collect()
