"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the full metric
JSON line (total + per-query dict) followed by, LAST, one COMPACT summary line:

    {"metric": "...", "value": <total_sec>, "unit": "sec", "sf": ...,
     "n_queries": N, "worst5": {...}, "variance_spread_pct": ..., "tail_summary": true}

The compact line exists because the driver's tail capture keeps ~2 KB and the
full per-query line outgrew it in round 13 (parsed null): every decision-
relevant number — total, count, worst-5 queries, the n=3 spread, load probes —
now survives ANY tail capture standalone. The n=3 variance band, the per-query
min/max blob, and the streaming startup decomposition print as separate
"sidecar" JSON lines BEFORE the metric line.

Each query is fully materialized (count + a cheap checksum collect) so the measured
time includes the whole plan, not just plan construction. A warmup run of the
flagship amortizes JVM/codegen startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

#: Headline set: the flagship mart + one representative per operator family,
#: including the scale-extension operators (dedup / similarity / text / windows).
HEADLINE = [
    "courier_ledger",
    "dim_lookup_join",
    "filtered_agg",
    "tier_payout",
    "watermark_filter",
    "scd0_insert_ignore",
    "scd1_upsert",
    "timestamp_dim",
    "json_extract",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_topk",
    "text_stats",
    "event_windows_tumbling",
    "event_sessionization",
    # round-3 additions: one representative each of the curation/layout/streaming
    # surface (original 15 above kept unchanged for round-over-round comparability)
    "stratified_sample",
    "sequence_packing",
    "zorder_values",
    "topk_per_group",
    "streaming_windows_tumbling",
    # round-4 additions: skew-salted join equivalence + rolling distinct
    "salted_join_agg",
    "rolling_distinct_users_7d",
    # round-4 late addition: duplicated-span coverage (positional-gram df join)
    "dedup_span_profile",
    # round-5 additions: real-codec PNG decode chain + product-quantization ANN
    # (the compressed-codes scale path next to similarity_topk's exact baseline)
    "image_png_features",
    "similarity_pq_adc",
    "similarity_ivf_pq",
    # round-5 late additions: ranked retrieval + sketch-pruned frequency mining
    "bm25_search",
    "heavy_hitters",
    # round-7 addition: hashed n-gram importance scoring (DSIR-style selection)
    "dsir_importance",
    # round-9 additions: CMS legacy-state migration fold, bloom membership
    # probe, exact mergeable quantile state
    "cms_state_migration",
    "dedup_bloom_probe",
    "quantile_state_maintenance",
    # round-9 late additions: mergeable bottom-k priority-sample state, its
    # KMV cardinality readout, and the quantized-DLT weighted variant
    "sample_state_maintenance",
    "kmv_distinct_users",
    "weighted_sample_per_source",
    # round-9 continuation: KMV set algebra, token-window chunking, MAD audit
    "kmv_user_overlap",
    "document_chunks",
    # round-11 additions: TRAINED coarse quantizer / PQ codebooks (exact-
    # decimal Lloyd's, hash-checked training) next to their seeded twins
    "similarity_ivf_topk_trained",
    "similarity_pq_adc_trained",
    "similarity_ivf_pq_trained",
    "similarity_ivf_pq_residual",
    # round-11: nightly index maintenance fold (the living trained index)
    "ivf_index_maintenance",
    # round-11: multi-probe LSH (the recall dial on the sign-bucket index)
    "similarity_ann_multiprobe",
    "mad_outlier_audit",
    # round-10 additions: incremental z-order compaction (equivalence-proved
    # layout maintenance) and the end-to-end chunk->pack->shard pipeline
    "zorder_incremental_compaction",
    "training_shards_end_to_end",
    # round-10 continuation: the day-state rollup family (KMV cardinality /
    # exact-histogram quantiles / CMS heavy hitters, O(days x state) windows)
    "kmv_rolling_7d_distinct",
    "quantile_rolling_7d",
    "heavy_users_rolling_7d",
    # round-12: multi-probe recall eval on the production residual IVF-PQ
    # layout (the r11-verdict item-5 dial, next to the LSH one)
    "ivfpq_residual_recall_multiprobe",
    # round-12: two-stage ADC-shortlist -> exact re-rank production search
    # (round-13: rerouted through the persisted index — steady-state search)
    "similarity_pq_refine_topk",
    # round-13: pure persisted-index ADC search (the committed-codes scan the
    # refine stage-1 reuses) and the flagship over bucketed storage (the
    # zero-shuffle J3 layout) — the two new production rails, measured
    "ann_index_persisted_search",
    "courier_ledger_bucketed",
    # round-13 continuation: hybrid retrieval (BM25 + cosine RRF fusion) and
    # kNN majority-vote labeling — retrieval/weak-supervision rails over the
    # k-bounded legs
    "hybrid_search_rrf",
    "knn_label_vote",
    # the steady-state hybrid rail: semantic leg from the persisted index
    "hybrid_search_rrf_indexed",
    # embedding-matrix diagnostics: dimension-correlation audit + the
    # power-iteration dominant-direction outlier scoring
    "embedding_dim_correlation",
    "embedding_dominant_direction",
    # the kNN accuracy@k sweep (one corpus pass, broadcast k grid)
    "knn_accuracy_curve",
    # round-14: the labeling rail served from the persisted index (ADC
    # shortlist -> exact re-rank -> vote) and its refine-vs-exact agreement
    # eval — the production form next to knn_label_vote's exact baseline —
    # plus the index-served accuracy@k sweep next to the exact curve
    "knn_label_vote_indexed",
    "knn_vote_agreement_indexed",
    "knn_accuracy_curve_indexed",
    # round-14: BM25 served from the persisted postings index (term-pruned
    # scan, no query-time tokenization) — the lexical twin of
    # ann_index_persisted_search, next to bm25_search's live baseline
    "bm25_search_indexed",
    # both hybrid legs index-served (pruned postings + pruned code lists)
    "hybrid_search_rrf_dual_indexed",
    # the committed trigram rail (living-index substring search)
    "substring_search_indexed",
    # round-15: SemDeDup from the persisted index's trained quantizer (the
    # dedup rail joins the serve-from-committed protocol), next to
    # semdedup_pairs' literal-centroid form benched since round 6
    "semdedup_pairs_indexed",
    # round-15: the compaction law in query form — serve from the
    # build->extend->compact index, same oracles as the living-index forms,
    # across all three persisted rails
    "bm25_search_compacted",
    "substring_search_compacted",
    "ann_index_compacted_search",
    # round-16: the retention verb in query form — serve after
    # vacuum_commits + retention_sweep deleted the pre-compaction history;
    # retention may delete history, never the serving surface (the
    # maintenance matrix completes: extend/compact/retention × all 3 rails)
    "ann_index_vacuumed_search",
    "bm25_search_vacuumed",
    "substring_search_vacuumed",
    # round-16: the dedup rail's O(increment) nightly form — history keeps
    # its committed cluster, only increment-touching pairs are computed
    "semdedup_pairs_incremental",
]


#: idle baseline for load_probe() on this box (recorded in OPERATORS.md)
IDLE_PROBE_SEC = 0.10

#: idle baseline for the original-15 core total at sf0.1 (sum of per-query
#: min — the "value_original15" tail field). A FIXED reference workload,
#: measured every round since r1; the r8-r16 idle band is 5.85-7.32 s, so a
#: 1.5x trigger (>9.9 s) only fires on real sustained degradation (the r15
#: worst episode ran untouched queries uniformly 2-5x). This is the detector
#: for UNIFORM sustained slowdown, which is intra-run invisible: all reps
#: inflate together, so neither spread nor first-rep skew moves.
ORIGINAL15_IDLE_SEC = 6.6


def classify_load_state(
    probe_pre: float,
    probe_post: float,
    rep_totals: list[float],
    idle_probe: float = IDLE_PROBE_SEC,
    original15_min_total: float | None = None,
    idle_original15: float = ORIGINAL15_IDLE_SEC,
) -> str:
    """Self-label the capture's machine state (r14 verdict item 8) so a noisy
    driver capture is machine-adjudicable WITHOUT a re-run.

    RECALIBRATED in r16 against the mechanical fold of every driver capture
    r10-r15 plus two same-day clean-probe captures: the FIRST rep total runs
    21-24% above the best rep in EVERY capture, including provably-idle ones
    (probes at/below baseline, rep2+ spread 1-6%) — each query's first timed
    rep re-pays cache/codegen warmth evicted since the warmup pass, a
    STRUCTURAL cost, not contention. The old spread/first-skew rules compared
    that structural rep against steady-state reps and therefore fired on
    every capture at today's suite size, making the label unable to say
    'idle'. Contention signals now come from like-for-like comparisons:

    - either load probe > 1.35x the idle baseline (clean band observed
      0.83-1.1x; degraded episodes 1.24-1.73x — the threshold sits ABOVE
      the jitter-prone clean band with margin, which means the 1.24x-class
      sustained episodes deliberately do NOT trip the solo rule: they are
      caught by the original-15 reference below, or by the combined rule
      when the inflation fluctuates. At a non-standard bench SF the
      original-15 reference is unavailable, so a 1.24-1.35x sustained
      episode can read 'idle' there — the driver's gate runs sf0.1, where
      the detector is always on);
    - the original-15 core total > 1.5x ITS recorded idle baseline — the
      fixed-workload detector for uniform sustained slowdown that no
      intra-run signal can see (the r15 worst episode: probes only 1.24x,
      steady reps tight, yet untouched queries uniformly 2-5x);
    - STEADY spread (across reps 2..n, excluding the structural first rep)
      > 20% — the documented idle band for steady reps is 1-6%;
    - first-rep skew > 40% — far past the 21-24% structural band, so a real
      decaying-contention episode still flags;
    - combined: a moderately hot probe (>1.15x) with a moderate steady
      spread (>10%) or elevated first skew (>30%).

    Thresholds are deliberately coarse: the flag marks captures whose
    absolute numbers should not be compared round-over-round, it does not
    grade the machine."""
    probe_ratio = max(probe_pre, probe_post) / idle_probe
    if probe_ratio > 1.35:
        return "degraded"
    if (
        original15_min_total is not None
        and original15_min_total > 1.5 * idle_original15
    ):
        return "degraded"
    lo = min(rep_totals) if rep_totals else 0.0
    # the structural first rep is excluded from the steady signal at ANY rep
    # count ≥ 2 (with 2 reps the steady spread is trivially 0 and the
    # first-rep signal carries the comparison — folding rep 1 back in would
    # re-create the false positive the recalibration removed)
    steady = rep_totals[1:] if len(rep_totals) >= 2 else rep_totals
    lo_steady = min(steady) if steady else 0.0
    if lo > 0 and lo_steady > 0:
        steady_spread = 100.0 * (max(steady) - lo_steady) / lo_steady
        first_skew = 100.0 * (rep_totals[0] - lo) / lo
        if steady_spread > 20.0 or first_skew > 40.0:
            return "degraded"
        if probe_ratio > 1.15 and (steady_spread > 10.0 or first_skew > 30.0):
            return "degraded"
    return "idle"


def load_probe() -> float:
    """Machine-load probe: wall time of a FIXED pure-Python workload
    (~0.10 s measured on this box idle). Under background load the same
    workload takes proportionally longer, so the printed number converts
    'was the driver box busy?' from round-close forensics (r8/r9: four
    unchanged queries drifting together) into a self-evidencing fact in the
    bench tail. Runs before and after the timed section; compare against
    the ~0.10 s idle baseline recorded in OPERATORS.md."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc += i * i
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    probe_pre = load_probe()

    from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries
    from airflow_courier_payout_ledger_pipeline_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    names = [n for n in HEADLINE if n in queries]
    # warmup pass over every headline query: JVM + codegen + parquet footer caches
    # (+ any operator-level persists) — we report steady-state, best of 2
    for name in names:
        queries[name](spark, sf_dir).count()

    # best-of-3: this box shows ±30% run-to-run noise under background load;
    # two reps were not enough for a stable steady-state number. All three rep
    # times are kept so the output carries an n=3 variance band per round (the
    # round-7 3-run study made this standing practice): rep-wise totals bound
    # machine noise without tripling the bench.
    REPS = 3
    timings: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    for name in names:
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            reps.append(time.perf_counter() - t0)
        rep_times[name] = reps
        timings[name] = round(min(reps), 4)

    sf = None
    try:
        tail = Path(sf_dir).name  # e.g. "sf0.1"
        if tail.startswith("sf"):
            sf = float(tail[2:])
    except ValueError:
        pass

    # r1/r2 benched exactly the first 15 queries; the total over that subset is
    # reported separately so round-over-round comparisons aren't skewed by the
    # round-3 additions (which include a full Structured Streaming drain).
    original15 = [n for n in HEADLINE[:15] if n in timings]

    # n=REPS variance band (standing practice since the round-7 drift study):
    # rep-wise totals — total_i = sum over queries of rep i — bound machine
    # noise on the SAME run that produced the headline numbers, so drift in an
    # untouched query can be attributed to noise vs code without a re-run.
    rep_totals = [
        round(sum(rep_times[n][i] for n in names), 4) for i in range(REPS)
    ]
    rep15_totals = [
        round(sum(rep_times[n][i] for n in original15), 4) for i in range(REPS)
    ]
    probe_post = load_probe()
    # the original-15 fixed-workload reference only has a recorded idle
    # baseline at the standard bench SF — skip that detector elsewhere
    orig15_min = (
        round(sum(timings[n] for n in original15), 4) if sf == 0.1 else None
    )
    load_state = classify_load_state(
        probe_pre, probe_post, rep_totals, original15_min_total=orig15_min
    )
    variance = {
        "n": REPS,
        "load_state": load_state,
        "rep_totals_sec": rep_totals,
        "rep_totals_original15_sec": rep15_totals,
        "spread_pct": round(
            100.0 * (max(rep_totals) - min(rep_totals)) / max(min(rep_totals), 1e-9),
            1,
        ),
        # machine-load probes (see load_probe): idle baseline ~0.10 s; a probe
        # reading k x idle means ~k-way contention during the bench — read any
        # round-over-round per-query drift against this before blaming code
        "load_probe_pre_sec": probe_pre,
        "load_probe_post_sec": probe_post,
    }
    minmax_blob = {
        n: [round(min(r), 4), round(max(r), 4)] for n, r in rep_times.items()
    }

    # Streaming decomposition: a drain's wall time is micro-batch harness cost
    # (checkpoint dir, state store init, trigger scheduling) + the actual plan
    # work, which the batch twin measures alone. Reporting (startup, per-batch
    # work) keeps the streaming numbers honest — the drain wall number is NOT
    # the operator's throughput at scale, where startup amortizes to zero.
    streaming = {}
    for stream_name, twin_name in [
        ("streaming_windows_tumbling", "event_windows_tumbling"),
    ]:
        if stream_name in timings and twin_name in timings:
            streaming[stream_name] = {
                "drain_sec": timings[stream_name],
                "batch_twin_plan_work_sec": timings[twin_name],
                "fixed_startup_overhead_sec": round(
                    max(0.0, timings[stream_name] - timings[twin_name]), 4
                ),
            }
    # the drain's checkpoint goes to tmpfs when /dev/shm exists (else disk +
    # WAL fsyncs, ~+0.2 s startup at sf0.1) — record which path THIS bench got
    # so a driver-vs-local startup gap is attributable (r9 verdict item 2)
    streaming["shm_checkpoint"] = os.path.isdir("/dev/shm")

    # Sidecar lines print BEFORE the metric line (round-8 lesson: appending
    # them to the metric line overflowed the driver's tail capture — BENCH_r08
    # parsed null), and the LONG per-query minmax blob prints FIRST so the
    # compact lines (rep totals, load probes, streaming decomposition) sit
    # nearest the tail and survive capture (round-9 lesson: the blob led the
    # variance line and the tail started mid-blob, losing rep_totals_sec).
    print(json.dumps({"sidecar": "per_query_minmax", "per_query_minmax": minmax_blob}))
    print(json.dumps({"sidecar": "streaming_decomposition", **streaming}))
    print(json.dumps({"sidecar": "variance", **variance}))
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "value_original15": round(sum(timings[n] for n in original15), 4),
                # harness-vs-plan split for the streaming drain, in the PARSED
                # metric (the full decomposition rides the sidecar line): the
                # drain wall number includes fixed micro-batch startup that
                # amortizes to zero in a production long-running stream
                "streaming_fixed_startup_sec": round(
                    sum(
                        d["fixed_startup_overhead_sec"]
                        for d in streaming.values()
                        if isinstance(d, dict)
                    ),
                    4,
                ),
            }
        )
    )
    # FINAL compact line (round-13 lesson: the driver's tail capture keeps
    # ~2 KB, and the full per-query metric line above outgrew it — BENCH_r13
    # parsed null). This line carries every decision-relevant number — total,
    # query count, worst-5, the n=REPS spread, load probes — in well under
    # 1 KB, and prints LAST so the tail of ANY capture parses standalone;
    # the full per-query dict still rides the metric line above (and min/max
    # per query the sidecar) for whoever has the whole stdout.
    worst5 = dict(sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))[:5])
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "worst5": worst5,
                "value_original15": round(sum(timings[n] for n in original15), 4),
                "variance_spread_pct": variance["spread_pct"],
                "rep_totals_sec": rep_totals,
                "load_probe_pre_sec": probe_pre,
                "load_probe_post_sec": probe_post,
                # machine-state verdict (classify_load_state): 'degraded'
                # means don't compare this capture's absolute numbers
                # round-over-round — re-read them against the probes/spread
                "load_state": load_state,
                "tail_summary": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
