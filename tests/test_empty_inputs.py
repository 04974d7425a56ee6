"""Cold-start robustness: every registered query must run — and still match its
oracle — on EMPTY input tables (first-run pipelines, empty increments, fresh
deployments). Catches ANSI traps (element_at/division on empty arrays),
driver-side .first() on empty aggregates, and explode-of-nothing plans."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from tests.oracle_harness import TABLES, compare, duckdb_con

from airflow_courier_payout_ledger_pipeline_spark.registry import all_oracles, all_queries

SRC_SF = "/root/testdata/sf0.001"

_queries = all_queries()
_oracles = all_oracles()


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    """Schema-identical, zero-row mirror of the testdata directory (built via
    DuckDB; events' TIMESTAMP(NANOS) is cast to micros, which read_events
    accepts unchanged — same value domain after its nanos truncation)."""
    import duckdb

    root = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in TABLES:
        src = Path(SRC_SF) / f"{t}.parquet"
        if src.exists():
            sel = "* REPLACE (ts::TIMESTAMP AS ts)" if t == "events" else "*"
            con.execute(
                f"COPY (SELECT {sel} FROM '{src}' LIMIT 0) TO '{root / (t + '.parquet')}' (FORMAT PARQUET)"
            )
    con.close()
    return str(root)


@pytest.fixture(scope="module")
def empty_con(empty_sf):
    c = duckdb_con(empty_sf)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_queries))
def test_query_survives_empty_inputs(spark, empty_sf, empty_con, name):
    if name in _oracles:
        compare(_queries[name](spark, empty_sf), empty_con, _oracles[name], name)
    else:
        _queries[name](spark, empty_sf).collect()
