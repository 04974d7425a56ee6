"""Connected-components semantics: transitivity, isolated nodes, determinism."""

from __future__ import annotations

from airflow_courier_payout_ledger_pipeline_spark.operators.graph import (
    connected_components,
)


def test_components_transitive_and_isolated(spark):
    nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
    # chain 0-1-2 (0~2 never stated), pair 4-5, isolated 3 and 6
    edges = spark.createDataFrame([(1, 0), (1, 2), (5, 4)], "id_a long, id_b long")
    out = {r.id: r.component for r in connected_components(nodes, edges).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 6}


def test_components_long_chain_converges(spark):
    # a 20-node path needs ~diameter rounds of min propagation
    n = 20
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    out = {r.id: r.component for r in connected_components(nodes, edges).collect()}
    assert out == {i: 0 for i in range(n)}
