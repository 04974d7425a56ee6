"""Physical-plan assertions for the round-4 operators: the scale claims in the
docstrings (broadcast probes, key-partitioned windows, no cartesian blowups)
pinned against the executed plan so a Catalyst or code regression fails loudly.
"""

from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_in_any_round4_query(spark):
    for name in (
        "salted_join_agg",
        "dedup_keep_best",
        "length_decile_bands",
        "partition_stats_manifest",
        "rolling_distinct_users_7d",
        "minhash_calibration",
        "decontaminated_corpus",
        "target_mix_sample",
        "token_budget_cap",
        "dedup_cross_corpus",
        "dedup_span_profile",
        "split_leakage_audit",
        "score_quantile_norm",
    ):
        assert "CartesianProduct" not in _plan(spark, name), name


def test_quantile_norm_window_runs_over_histogram_not_corpus(spark):
    """The per-source percent_rank window must sort the (source, n_chars)
    HISTOGRAM (below an aggregate of the scan), and the corpus only sees a
    broadcast join attaching the precomputed rank — never a corpus-wide sort."""
    p = _plan(spark, "score_quantile_norm")
    assert "Window" in p
    # rank attach is broadcast: the histogram side builds the hashed relation
    assert "BroadcastHashJoin [source" in p
    # the window's input is the aggregated histogram, so its partitioning
    # exchange is (source, n_chars) — the histogram grain, not row grain
    assert "hashpartitioning(source" in p


def test_split_leakage_joins_no_split_table(spark):
    """The split label is a pure function of doc_id computed inline — the plan
    must contain exactly the LSH-pair joins (sig attach) and no extra join or
    exchange for a split assignment."""
    p = _plan(spark, "split_leakage_audit")
    lsh = _plan(spark, "dedup_minhash_lsh")
    assert p.count("Exchange") <= lsh.count("Exchange"), (
        "leakage audit added exchanges beyond the underlying LSH pair plan"
    )


def test_salted_join_small_side_broadcasts(spark):
    # the exploded (salted) dim is still small -> broadcast; salting must not
    # force a shuffle join of the fact side by itself
    p = _plan(spark, "salted_join_agg")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_token_budget_window_is_key_partitioned(spark):
    # one window, partitioned by source — never a global single-partition sort
    p = _plan(spark, "token_budget_cap")
    assert "Window" in p
    assert "hashpartitioning(source" in p
    assert "Exchange SinglePartition" not in p


def test_cross_corpus_probe_is_broadcast_not_shuffle_join(spark):
    # the increment side (band hashes + signatures) broadcasts into the corpus;
    # a SortMergeJoin here would mean the corpus is being shuffled to probe
    p = _plan(spark, "dedup_cross_corpus")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_decontamination_gram_probe_broadcasts(spark):
    p = _plan(spark, "decontaminated_corpus")
    assert "BroadcastHashJoin" in p


def test_decile_band_window_runs_over_histogram(spark):
    # the corpus-sized agg (groupBy n_chars) happens BELOW the unpartitioned
    # window: the window input is the histogram, never corpus rows
    p = _plan(spark, "length_decile_bands")
    assert "Window" in p and "hashpartitioning(n_chars" in p
