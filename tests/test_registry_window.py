"""The driver adjudicates the FIRST 50 entries of queries() in dict order
(observed r1-r5). These tests pin the round-6 rotation: the 19 round-5
additions with no driver evidence plus the 13 veterans last proven in r3 must
occupy the window (this is the ADJUDICATION_WINDOW_R6_PLAN staged and pinned
in round 5, activated verbatim), the flagship trio stays in-window as a
canary, and every window name resolves to a registered query with an oracle.
The planned r7 window must absorb every round-6 addition that doesn't fit the
active window, so nothing waits more than one round for a driver row.
"""

from airflow_courier_payout_ledger_pipeline_spark.registry import (
    ADJUDICATION_WINDOW_FIRST,
    ADJUDICATION_WINDOW_NEXT_PLAN,
    all_oracles,
    all_queries,
)

WINDOW = 50
CANARY = {"courier_ledger", "courier_ledger_sql", "incremental_mart_maintenance"}

#: the 19 round-5 additions that had never been adjudicated through r5 — the
#: whole point of the r6 window is landing driver rows for these
_NEVER_ADJUDICATED_PRE_R6 = {
    "image_png_features", "similarity_pq_adc", "ann_recall_eval",
    "similarity_ivf_pq", "event_pagerank", "bpe_merges", "substring_search",
    "dedup_pq_hamming", "session_window_native", "mix_epochs_report",
    "bm25_search", "heavy_hitters", "bpe_token_counts",
    "contrastive_triplets", "semdedup_pairs", "grouped_split_assign",
    "dataset_card", "image_content_dedup", "ngram_containment",
}


def test_window_first_names_are_registered_with_oracles():
    q, o = all_queries(), all_oracles()
    missing_q = [n for n in ADJUDICATION_WINDOW_FIRST if n not in q]
    assert not missing_q, f"window names without a query: {missing_q}"
    # rows-only queries (no oracle) are allowed in-window but must be known
    no_oracle = [n for n in ADJUDICATION_WINDOW_FIRST if n not in o]
    assert not no_oracle, f"window names without an oracle: {no_oracle}"


def test_unproven_queries_lead_the_adjudication_window():
    order = list(all_queries())
    assert order[: len(ADJUDICATION_WINDOW_FIRST)] == ADJUDICATION_WINDOW_FIRST
    assert len(ADJUDICATION_WINDOW_FIRST) <= WINDOW, (
        "window list overflows the driver's first-50 adjudication window"
    )
    assert len(set(ADJUDICATION_WINDOW_FIRST)) == len(ADJUDICATION_WINDOW_FIRST)


def test_flagship_canary_stays_in_window():
    order = list(all_queries())[:WINDOW]
    assert CANARY <= set(order)


def test_never_adjudicated_round5_queries_are_in_window():
    """The 19 round-5 additions with no driver row through r5 must all sit in
    the active window so CORRECTNESS_r06 makes the registry 100% driver-proven."""
    assert _NEVER_ADJUDICATED_PRE_R6 <= set(ADJUDICATION_WINDOW_FIRST[:WINDOW])


def test_queries_and_oracles_share_order():
    q, o = list(all_queries()), list(all_oracles())
    assert q[: len(o)] == o[: len(q)] or [n for n in q if n in set(o)] == o


def test_every_query_has_driver_evidence_or_a_window_slot():
    """No query may be unproven AND unscheduled: every registered query must be
    (a) green in some prior round, (b) in the active r6 window, or (c) in the
    planned r7 window. Round-6 additions therefore must be appended to
    ADJUDICATION_WINDOW_NEXT_PLAN as they are registered."""
    q, o = all_queries(), all_oracles()
    covered = _GREEN_EVER | set(ADJUDICATION_WINDOW_FIRST) | set(ADJUDICATION_WINDOW_NEXT_PLAN)
    orphans = [n for n in q if n not in covered]
    assert not orphans, f"queries with no driver evidence and no window slot: {orphans}"
    missing = [n for n in ADJUDICATION_WINDOW_NEXT_PLAN if n not in q or n not in o]
    assert not missing, f"r7 plan names without query/oracle: {missing}"
    assert len(ADJUDICATION_WINDOW_NEXT_PLAN) <= WINDOW
    assert CANARY <= set(ADJUDICATION_WINDOW_NEXT_PLAN)


#: queries with at least one fully-green driver row through round 5
#: (CORRECTNESS_r01-r03 first-50 set + CORRECTNESS_r04's 49 green rows +
#: CORRECTNESS_r05's 50/50 green rows, which closed sequence_packing)
_GREEN_EVER = {
    # green r1-r3 (re-proven r5 where rotated back in)
    "json_extract", "json_struct_parse", "paged_scan", "watermark_filter",
    "timestamp_dim", "broadcast_enrich", "dim_lookup_join", "watermark_cursor",
    "filtered_agg", "tier_payout", "scd0_insert_ignore", "scd1_upsert",
    "rest_page_fetch_distributed", "incremental_promotion", "set_ops",
    "rollup_totals", "semi_anti_join", "grouping_sets_hourly",
    "price_histogram", "list_agg_priorities", "watermark_state", "text_stats",
    "lang_id", "doc_fingerprint", "dedup_exact", "minhash_signatures",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_two_stage",
    "dedup_simhash", "dedup_simhash_pairs", "dedup_components",
    "similarity_topk", "similarity_ann_bucketed", "embedding_near_dup",
    "similarity_ivf_topk", "event_windows_tumbling", "event_windows_sliding",
    "event_sessionization", "asof_join_events", "window_analytics",
    "distribution_stats", "range_join_incidents", "term_importance",
    "fuzzy_name_pairs", "profile_documents", "pivot_event_counts",
    "courier_ledger", "courier_ledger_sql", "incremental_mart_maintenance",
    # green r4 (rotated-in set + round-4 in-window additions)
    "deterministic_sample", "zorder_values", "topk_per_group",
    "stratified_sample", "dedup_incremental", "multimodal_features",
    "video_frame_sample", "repetition_stats", "quality_rules", "vocab_counts",
    "ngram_contamination", "streaming_windows_tumbling", "streaming_dedup",
    "streaming_compact_latest", "streaming_stream_join",
    "streaming_sessionization", "snapshot_diff_orders", "funnel_conversion",
    "key_skew_profile", "pii_scrub", "corpus_curation", "label_centroid_stats",
    "doc_chunking", "oov_rate", "per_source_cap", "streaming_ledger_maintenance",
    "cube_status_priority", "date_spine_fill", "rolling_7d_counts",
    "audio_features", "scd2_history", "retention_cohorts",
    "event_type_cooccurrence", "bigram_lm_score", "timeseries_interpolate",
    "dq_violation_report", "embedding_quantize", "daily_anomaly_zscore",
    "similarity_ivf_nprobe2", "salted_join_agg", "dedup_keep_best",
    "length_decile_bands", "partition_stats_manifest",
    "rolling_distinct_users_7d", "minhash_calibration", "decontaminated_corpus",
    # green r5 (r4-registered never-adjudicated set + fixed sequence_packing)
    "streaming_static_enrich", "target_mix_sample", "token_budget_cap",
    "dedup_cross_corpus", "cdc_apply_roundtrip", "event_transitions",
    "k_anonymity_audit", "value_winsorize", "weighted_sample",
    "dedup_span_profile", "split_leakage_audit", "score_quantile_norm",
    "sequence_packing",
}
