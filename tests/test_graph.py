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


def test_pagerank_hand_computed_and_partition_invariant(spark):
    from airflow_courier_payout_ledger_pipeline_spark.operators.graph import pagerank

    # A -> B (w2), A -> C (w1), B -> C (w1); C dangling (mass dropped)
    edges = spark.createDataFrame(
        [("A", "B", 2), ("A", "C", 1), ("B", "C", 1)], "src string, dst string, weight long"
    )
    got = {r.node: r.rank for r in pagerank(edges, iters=2, damping=0.85).collect()}

    # replicate in plain python: same fold order (contribs sorted by src)
    n = 3
    ranks = {x: 1.0 / n for x in "ABC"}
    e = [("A", "B", 2.0, 3.0), ("A", "C", 1.0, 3.0), ("B", "C", 1.0, 1.0)]
    for _ in range(2):
        inc = {}
        for src, dst, w, ow in e:
            inc.setdefault(dst, []).append((src, ranks[src] * w / ow))
        new = {}
        for node in "ABC":
            s = 0.0
            for _, c in sorted(inc.get(node, [])):
                s += c
            new[node] = 0.15 / n + 0.85 * s
        ranks = new
    expected = {k: round(v, 6) for k, v in ranks.items()}
    assert got == expected
    # partition-count invariance: the ordered fold pins the float order
    got7 = {
        r.node: r.rank
        for r in pagerank(edges.repartition(7), iters=2, damping=0.85).collect()
    }
    assert got7 == expected


def test_components_label_edge_endpoints_missing_from_nodes(spark):
    """Transitive reachability must survive a node list that misses an
    intermediate endpoint: nodes={1,2}, edges 1-9-2 (9 unlisted) must still
    merge 1 and 2 through 9, and 9 gets labeled too."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.graph import (
        connected_components,
    )

    nodes = spark.createDataFrame([(1,), (2,)], "id long")
    edges = spark.createDataFrame([(1, 9), (9, 2)], "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 9: 1}
