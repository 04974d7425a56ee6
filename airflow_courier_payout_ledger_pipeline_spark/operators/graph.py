"""Connected components over near-duplicate pair edges — the clustering step
that turns pairwise dedup output (MinHash/SimHash/embedding pairs) into
dedup GROUPS with one canonical representative each (min id). Without it,
pairwise edges can't answer "which docs do I drop": A~B and B~C must collapse
to one cluster {A,B,C} even though A~C was never emitted.

Algorithm: distributed min-label propagation. Every node starts labeled with
its own id; each round, a node adopts the minimum label among itself and its
neighbors; converged when no label changes. Rounds = graph diameter, and
near-dup graphs are piles of small dense clusters (tiny diameters), so this
beats the pointer-jumping variants in practice while staying 3 lines of
DataFrame algebra per round.

Scale notes:
- each round is one shuffle (neighbor-min groupBy) + one join;
- ``localCheckpoint`` every round truncates the lineage — an iterative loop
  without it recompiles an ever-deeper plan and eventually overwhelms the
  optimizer (the same discipline as MLlib's iteration);
- the convergence probe collects a single count per round (O(1) driver state,
  same class as a watermark cursor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node in ``nodes``; component = min node id
    reachable through undirected ``edges``. Isolated nodes are their own
    component. Deterministic; raises if ``max_iter`` rounds don't converge
    (a near-dup graph needing >25 rounds of min-propagation means a chain
    thousands of docs long — investigate the edges, don't loop forever)."""
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("comp"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.select(F.col("id").alias("src"), F.col("comp").alias("src_comp")), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("src_comp").alias("nbr_comp"))
        )
        new_labels = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("comp").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} min-propagation rounds"
    )
