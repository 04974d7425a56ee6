"""Plan-shape assertions for the round-5 operators: the physical plan each one
is SUPPOSED to produce at 100 TB, pinned so a Catalyst or code change that
degrades the strategy fails loudly (the test_round3/4_plans discipline)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return all_queries()[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_ivf_pq_routes_via_broadcast_hash_join_no_cartesian(spark):
    plan = _plan(spark, "similarity_ivf_pq")
    assert "BroadcastHashJoin" in plan  # centroid equi-join, queries broadcast
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # corpus must never shuffle for the join


def test_pq_adc_streams_codes_not_vectors(spark):
    plan = _plan(spark, "similarity_pq_adc")
    assert "BroadcastNestedLoopJoin" in plan
    # the join emits codes; the raw embedding column feeds only the encode
    # projection below it (the 32x memory point of PQ)
    join_out = plan.split("BroadcastNestedLoopJoin")[1].split("\n")[0]
    assert "embedding" not in join_out


def test_png_features_plan_is_single_map_stage(spark):
    plan = _plan(spark, "image_png_features")
    # r17: the one allowed exchange is the metadata SPREAD that parallelizes
    # the codec Python passes (see synthesize_png_payloads)
    shuffles = [
        l
        for l in plan.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    ]
    assert len(shuffles) <= 1 and all("REPARTITION_BY_NUM" in l for l in shuffles), shuffles
    assert "MapInPandas" in plan  # Arrow-batched decode, no row-at-a-time UDF
    assert "BatchEvalPython" not in plan  # the slow per-row Python path


def test_substring_search_prefilters_with_semi_join(spark):
    plan = _plan(spark, "substring_search")
    # candidates attach via a semi join (no duplicate-row hazard, no payload
    # columns moved), then the exact verify filter runs on candidates only
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_rank_loop_is_checkpointed_not_replanned(spark):
    """The iteration loop must cut lineage per round: the final plan reads the
    last round's checkpointed RDD, not a 3x-nested join tree (plan growth is
    the classic iterative-DataFrame trap)."""
    plan = _plan(spark, "event_pagerank")
    assert "Scan ExistingRDD" in plan
    assert plan.count("SortMergeJoin") <= 2  # final join only, not all rounds


def test_bpe_iterations_run_over_checkpointed_word_table(spark):
    plan = _plan(spark, "bpe_merges")
    # the returned merges frame is driver-built rows (iteration results were
    # consumed by O(1) collects); the corpus never appears in the final plan
    assert "parquet" not in plan.lower()


def test_contrastive_triplets_all_joins_broadcast_no_self_join(spark):
    """Triplet mining must stay O(n): the bucket min-tables and the negative
    pool attach via broadcast hash joins — never a corpus-side shuffle join or
    an all-pairs candidate product."""
    plan = _plan(spark, "contrastive_triplets")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bpe_token_counts_single_doc_grain_shuffle(spark):
    """Encoding is map-side (merges ride the closure as literal replaces); the
    only exchange is the per-doc count aggregation."""
    plan = _plan(spark, "bpe_token_counts")
    shuffles = [
        line
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    ]
    assert len(shuffles) <= 1, shuffles


def test_semdedup_assignment_is_fully_map_side(spark):
    """Cluster assignment is an unrolled-literal argmin and the pair join is
    cluster-equi with broadcast — the ONLY shuffle allowed is the r17 corpus
    SPREAD (round-robin of the pruned (id, vector) projection) that
    parallelizes the argmin + pair fan-out off a single-file scan."""
    plan = _plan(spark, "semdedup_pairs")
    shuffles = [
        line
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    ]
    assert len(shuffles) <= 2, shuffles  # statically under BOTH self-join arms
    assert all("REPARTITION_BY_NUM" in s for s in shuffles), shuffles
    assert "CartesianProduct" not in plan


def test_image_content_dedup_one_stats_shuffle_arrow_decode(spark):
    plan = _plan(spark, "image_content_dedup")
    shuffles = [
        line
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    ]
    # content-stats shuffle + the r17 synth-metadata spread
    assert len(shuffles) <= 2, shuffles
    assert "MapInPandas" in plan  # Arrow-batched decode
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python


def test_grouped_split_assign_zero_shuffle(spark):
    plan = _plan(spark, "grouped_split_assign")
    assert "Exchange" not in plan.replace("BroadcastExchange", "")
