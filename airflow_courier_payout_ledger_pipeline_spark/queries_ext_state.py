"""Mergeable-state family: bloom membership, exact quantile histograms, bottom-k/KMV samples, MAD audits, shard layout, document chunking, weighted DLT samples - each with fold-rail streaming twins.

Split out of the former monolithic queries_ext.py (round 10) so the
changed-file -> re-adjudicate rule schedules only this domain's queries.
Registration side effects: importing this module registers its queries.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import load_tables
from airflow_courier_payout_ledger_pipeline_spark.registry import register
from airflow_courier_payout_ledger_pipeline_spark.queries_ext_text import NORM


# The Bloom filter is internal pruning state (one-sided error: no false
# negatives), so candidates ⊇ true members and the exact fp join downstream
# restores equality with the naive membership oracle — the same
# prune-then-verify contract as the CMS heavy-hitter candidates and the
# trigram index. The bloom itself therefore never appears in the oracle.
BLOOM_PROBE_ORACLE = f"""
WITH corpus AS (SELECT DISTINCT md5({NORM}) AS fp FROM documents),
probe AS (
    SELECT doc_id AS id,
           CASE WHEN doc_id % 2 = 0 THEN md5({NORM})
                ELSE md5({NORM} || '#changed') END AS fp
    FROM documents WHERE doc_id % 7 = 0
)
SELECT p.id, p.fp, (c.fp IS NOT NULL) AS dup_of_corpus
FROM probe p LEFT JOIN corpus c ON p.fp = c.fp
"""


@register("dedup_bloom_probe", BLOOM_PROBE_ORACLE)
def q_dedup_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned incremental-dedup probe: flag which probe docs already
    exist in the corpus fingerprint index — WITHOUT joining the probe set
    against the index. A replay slice (doc_id % 7 = 0) stands in for the
    nightly increment, with odd ids' fingerprints deterministically perturbed
    (content changed since the snapshot), so both probe outcomes — member and
    absent — occur by construction. The index side is sketched into a
    ≤ m_bits/64-row bitmap state (built here as TWO half-index states folded
    through ``merge_bloom_states`` — driving the bit-or merge law end-to-end,
    like ``cms_state_migration`` does for CMS), the collected words enter the
    probe scan as a pure map predicate (``bloom.bloom_might_contain_expr``),
    and only the candidate remainder — true members plus the sizing-bounded
    false positives — reaches the exact verify, broadcast against the index;
    bloom-rejected rows are flagged non-members with NO join at all (the
    no-false-negative guarantee). At 100 TB: the increment is never exchanged
    for the membership test (10 bits/indexed key vs a 32-byte-string join),
    and the states are increment-mergeable so the index bloom is maintained,
    not rebuilt (operators/bloom.py)."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import (
        fingerprint,
        normalize_text,
    )
    from airflow_courier_payout_ledger_pipeline_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain_expr,
        merge_bloom_states,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # RAW fingerprints, never distinct'd: bit-or idempotence makes duplicate
    # inputs free, so the bloom build needs NO pre-aggregation of the corpus —
    # each half-state below is one MAP-ONLY corpus scan plus a ≤ m_bits/64-row
    # grouped bit_or (map-side partials; the exchange is word-grain, tiny)
    fps = docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
    # two half-index states folded: build ∪ merge ≡ single full build (bit-or
    # law; in deployment the halves are persisted artifacts — yesterday's
    # state + tonight's increment). Shape A/B'd in round 9 and this two-build
    # form kept: an eager localCheckpoint pin ran ~40% slower (two blocking
    # jobs vs one pipelined plan), and a bloom_build_partitioned single-scan
    # variant ran ~25% slower at 2 keys (the part column rides the full x k
    # explode; that shape pays off for MANY keys — per-day backfills — not
    # two)
    state = merge_bloom_states(
        bloom_build(fps.filter(F.col("doc_id") % 2 == 0), "fp"),
        bloom_build(fps.filter(F.col("doc_id") % 2 == 1), "fp"),
    ).collect()
    probe = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") % 2 == 0, fingerprint(F.col("text")))
        .otherwise(F.md5(F.concat(normalize_text(F.col("text")), F.lit("#changed"))))
        .alias("fp"),
    )
    cand = probe.filter(bloom_might_contain_expr(state, "fp"))
    # exact verify kills the false positives: LEFT-SEMI with the pruned
    # candidate fps broadcast — ONE map-side corpus scan, no corpus shuffle,
    # and semi-join semantics need no distinct on the corpus side (no fan-out)
    hit_fps = (
        fps.join(F.broadcast(cand.select("fp")), "fp", "left_semi")
        .select("fp")
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return probe.join(F.broadcast(hit_fps), "fp", "left").select(
        "id", "fp", F.coalesce("__dup", F.lit(False)).alias("dup_of_corpus")
    )


@register("streaming_bloom_maintenance", BLOOM_PROBE_ORACLE)
def q_streaming_bloom_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index bloom MAINTAINED as streaming state — the deployment rail
    behind ``dedup_bloom_probe``'s 'maintained, not rebuilt' claim: the corpus
    fingerprint index arrives as a 4-file stream (maxFilesPerTrigger=1 → 4
    micro-batches), each batch sketched by ``bloom_build`` and folded into the
    persisted bitmap state via foreachBatch (``streaming/ingest.
    stream_fold_state`` + ``merge_bloom_states`` — the same rail that
    maintains the ledger and CMS states). The fold's bit-or algebra makes the
    streamed state ≡ one batch build under ANY file split (idempotent under
    replay), so the downstream probe + exact verify must reproduce
    ``dedup_bloom_probe``'s oracle exactly — hash-checked here."""
    import tempfile

    from airflow_courier_payout_ledger_pipeline_spark.functions.text import (
        fingerprint,
        normalize_text,
    )
    from airflow_courier_payout_ledger_pipeline_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain_expr,
        merge_bloom_states,
    )
    from airflow_courier_payout_ledger_pipeline_spark.sources.lakehouse import Lakehouse
    from airflow_courier_payout_ledger_pipeline_spark.streaming.ingest import (
        stream_fold_state,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # raw fingerprints — the bloom build needs no dedup (bit-or idempotence)
    fps = docs.select(fingerprint(F.col("text")).alias("fp"))

    tmp = tempfile.mkdtemp(prefix="stream_bloom_")
    src = f"{tmp}/fp"
    fps.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(fps.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lake = Lakehouse(f"{tmp}/lake")
    state_schema = bloom_build(fps, "fp").schema
    q = stream_fold_state(
        stream,
        lake,
        "idx",
        "bloom_state",
        state_fn=lambda b: bloom_build(b, "fp"),
        merge_fn=merge_bloom_states,
        checkpoint=f"{tmp}/ckpt",
        query_name="drv_stream_bloom",
    )
    q.awaitTermination()
    state = lake.read(spark, "idx", "bloom_state", state_schema).collect()

    probe = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") % 2 == 0, fingerprint(F.col("text")))
        .otherwise(F.md5(F.concat(normalize_text(F.col("text")), F.lit("#changed"))))
        .alias("fp"),
    )
    cand = probe.filter(bloom_might_contain_expr(state, "fp"))
    hit_fps = (
        fps.join(F.broadcast(cand.select("fp")), "fp", "left_semi")
        .select("fp")
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return probe.join(F.broadcast(hit_fps), "fp", "left").select(
        "id", "fp", F.coalesce("__dup", F.lit(False)).alias("dup_of_corpus")
    )


# Quantiles don't decompose, but the per-group value histogram is a lossless
# mergeable sufficient statistic — exact percentiles from persisted state, no
# corpus sort, no approximation (cents are a quantized domain; cf. SCALE.md on
# approx_percentile's non-hashable rank error). The percentile definition is
# pure integer arithmetic (cum·den >= num·N — the ⌈p·N⌉-th order statistic) so
# exact p·N boundaries resolve identically in both engines; the cents cast
# reuses the proven STREAMING_SESSION_ORACLE rounding pattern.
QUANTILE_STATE_ORACLE = """
WITH e AS (
    SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v
    FROM events WHERE value IS NOT NULL
),
h AS (SELECT event_type, v, count(*) AS c FROM e GROUP BY 1, 2),
cum AS (
    SELECT event_type, v,
           sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
           sum(c) OVER (PARTITION BY event_type) AS n
    FROM h
)
SELECT event_type,
       max(n)::BIGINT AS n_values,
       min(CASE WHEN cum * 2 >= n THEN v END) AS p50,
       min(CASE WHEN cum * 10 >= 9 * n THEN v END) AS p90,
       min(CASE WHEN cum * 100 >= 99 * n THEN v END) AS p99
FROM cum GROUP BY 1
"""


@register("quantile_state_maintenance", QUANTILE_STATE_ORACLE)
def q_quantile_state_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type latency/value percentiles (p50/p90/p99 in cents) from a
    MERGED histogram state: the event stream is split in two (modeling
    yesterday's persisted state + tonight's increment), each half reduced to
    its (group, value, cnt) histogram, folded by count-sum
    (``operators/quantile.merge_histogram_states``), and finalized into exact
    discrete percentiles — the fourth mergeable-state family member next to
    CMS/Bloom/HLL, and the exact alternative to percentile_approx for
    quantized domains. No row-grain sort anywhere: the build shuffles
    value-grain rows after map-side partials, and the finalize window orders
    only per-group distinct values."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
        histogram_state,
        merge_histogram_states,
        quantiles_from_state,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    e = events.filter(F.col("value").isNotNull()).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    state = merge_histogram_states(
        histogram_state(e.filter(F.col("event_id") % 2 == 0), ["event_type"], "v"),
        histogram_state(e.filter(F.col("event_id") % 2 == 1), ["event_type"], "v"),
        ["event_type"],
    )
    return quantiles_from_state(state, ["event_type"])


@register("streaming_quantile_maintenance", QUANTILE_STATE_ORACLE)
def q_streaming_quantile_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile histogram MAINTAINED as streaming state — completing the
    fold-rail family (ledger sums, bloom bits, now quantile histograms): the
    event value stream arrives as a 4-file stream (maxFilesPerTrigger=1 → 4
    micro-batches), each batch reduced to its (group, value, cnt) histogram
    and folded into the persisted state by count sum via foreachBatch
    (``streaming/ingest.stream_fold_state`` — its exactly-once sidecar is
    what makes the ADDITIVE fold replay-safe, exactly as for the ledger).
    Because the histogram is a lossless mergeable sufficient statistic, the
    percentiles finalized from the streamed state must equal the batch
    recompute's bit-for-bit under ANY file split — hash-checked against the
    same oracle as ``quantile_state_maintenance``."""
    import tempfile

    from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
        histogram_state,
        merge_histogram_states,
        quantiles_from_state,
    )
    from airflow_courier_payout_ledger_pipeline_spark.sources.lakehouse import Lakehouse
    from airflow_courier_payout_ledger_pipeline_spark.streaming.ingest import (
        stream_fold_state,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    e = events.filter(F.col("value").isNotNull()).select(
        "event_type", F.round(F.col("value") * 100, 0).cast("bigint").alias("v")
    )

    tmp = tempfile.mkdtemp(prefix="stream_quantile_")
    src = f"{tmp}/v"
    e.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lake = Lakehouse(f"{tmp}/lake")
    state_schema = histogram_state(e, ["event_type"], "v").schema
    q = stream_fold_state(
        stream,
        lake,
        "idx",
        "quantile_state",
        state_fn=lambda b: histogram_state(b, ["event_type"], "v"),
        merge_fn=lambda a, b: merge_histogram_states(a, b, ["event_type"]),
        checkpoint=f"{tmp}/ckpt",
        query_name="drv_stream_quantile",
    )
    q.awaitTermination()
    state = lake.read(spark, "idx", "quantile_state", state_schema)
    return quantiles_from_state(state, ["event_type"])


# --- Mergeable bottom-k priority-sample state ----------------------------------------

SAMPLE_K = 5

SAMPLE_STATE_ORACLE = f"""
WITH e AS (
    SELECT event_type, event_id, CAST(round(value * 100, 0) AS BIGINT) AS v_cents
    FROM events WHERE event_id IS NOT NULL
),
r AS (
    SELECT event_type, event_id, v_cents,
           row_number() OVER (
               PARTITION BY event_type ORDER BY md5(event_id::VARCHAR), event_id
           ) AS rank
    FROM e
)
SELECT event_type, event_id, v_cents, rank::BIGINT AS rank
FROM r WHERE rank <= {SAMPLE_K}
"""


@register("sample_state_maintenance", SAMPLE_STATE_ORACLE)
def q_sample_state_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A k-row uniform per-group inspection sample MAINTAINED as mergeable
    state (``operators/sample``): the event stream is split in two (modeling
    yesterday's persisted k-row state + tonight's increment), each half
    reduced to its bottom-k-by-md5-priority sample, folded by union+re-rank
    — bottom-k is closed under union, so the merged state is row-identical
    to a full-corpus rebuild, which is exactly what the oracle computes.
    The fifth mergeable-state family member next to CMS/Bloom/quantile/HLL;
    at 100 TB this keeps a live per-group sample for O(increment) nightly
    cost where TABLESAMPLE would re-scan (and re-draw) the corpus. Build
    windows are group-keyed with a WindowGroupLimit k-prune before the
    exchange; the merge re-ranks k-row states only."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.sample import (
        merge_sample_states,
        sample_from_state,
        sample_state,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    e = events.filter(F.col("event_id").isNotNull()).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v_cents"),
    )
    state = merge_sample_states(
        sample_state(e.filter(F.col("event_id") % 2 == 0), ["event_type"], "event_id", SAMPLE_K),
        sample_state(e.filter(F.col("event_id") % 2 == 1), ["event_type"], "event_id", SAMPLE_K),
        ["event_type"],
        "event_id",
        SAMPLE_K,
    )
    return sample_from_state(state, ["event_type"], "event_id")


@register("streaming_sample_maintenance", SAMPLE_STATE_ORACLE)
def q_streaming_sample_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bottom-k sample MAINTAINED as streaming state on the fold rail
    (ledger sums, bloom bits, quantile histograms, now priority samples):
    the event stream arrives as a 4-file stream (maxFilesPerTrigger=1 → 4
    micro-batches), each batch reduced to its k-row bottom-k state and
    folded into the persisted sample via foreachBatch
    (``streaming/ingest.stream_fold_state`` — the exactly-once sidecar
    guards the fold against replays, which would double-count a row's draw).
    Bottom-k closure under union ⇒ the streamed sample is row-identical to
    the batch rebuild under ANY file split — same oracle as
    ``sample_state_maintenance``."""
    import tempfile

    from airflow_courier_payout_ledger_pipeline_spark.operators.sample import (
        merge_sample_states,
        sample_from_state,
        sample_state,
    )
    from airflow_courier_payout_ledger_pipeline_spark.sources.lakehouse import Lakehouse
    from airflow_courier_payout_ledger_pipeline_spark.streaming.ingest import (
        stream_fold_state,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    e = events.filter(F.col("event_id").isNotNull()).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v_cents"),
    )

    tmp = tempfile.mkdtemp(prefix="stream_sample_")
    src = f"{tmp}/v"
    e.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lake = Lakehouse(f"{tmp}/lake")
    state_schema = sample_state(e, ["event_type"], "event_id", SAMPLE_K).schema
    q = stream_fold_state(
        stream,
        lake,
        "idx",
        "sample_state",
        state_fn=lambda b: sample_state(b, ["event_type"], "event_id", SAMPLE_K),
        merge_fn=lambda a, b: merge_sample_states(
            a, b, ["event_type"], "event_id", SAMPLE_K
        ),
        checkpoint=f"{tmp}/ckpt",
        query_name="drv_stream_sample",
    )
    q.awaitTermination()
    state = lake.read(spark, "idx", "sample_state", state_schema)
    return sample_from_state(state, ["event_type"], "event_id")


KMV_K = 64

KMV_ORACLE = f"""
WITH du AS (
    SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL
),
pr AS (SELECT event_type, user_id, md5(user_id::VARCHAR) AS p FROM du),
r AS (
    SELECT event_type, p,
           row_number() OVER (
               PARTITION BY event_type ORDER BY p, user_id
           ) AS rn
    FROM pr
),
agg AS (
    SELECT event_type, count(*) AS nrows,
           max(('0x' || substr(p, 1, 12))::BIGINT / 281474976710656.0) AS uk
    FROM r WHERE rn <= {KMV_K} GROUP BY 1
)
SELECT event_type,
       CASE WHEN nrows < {KMV_K} THEN nrows
            ELSE CAST(floor({KMV_K - 1} / uk) AS BIGINT) END AS distinct_est,
       nrows < {KMV_K} AS exact
FROM agg
"""


@register("kmv_distinct_users", KMV_ORACLE)
def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type ESTIMATED from the bottom-k sample state
    (``operators/sample.kmv_distinct_estimate``): the k smallest md5
    priorities are a KMV sketch, est = (k-1)/u_k for full groups, exact
    counts for groups below k — the inspection sample doubles as a
    cardinality monitor with no extra corpus pass. Input is the DISTINCT
    (type, user) grain (duplicate draws would shrink u_k); at 100 TB the
    state is k rows per group and the estimate is one k-row-grain agg.
    Fully hash-checked — unlike HLL, every step (md5 draw, 48-bit→double
    mapping, one IEEE division, floor) is bit-deterministic cross-engine,
    so the DuckDB oracle replays the estimator exactly."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.sample import (
        kmv_distinct_estimate,
        sample_state,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    du = (
        events.filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    state = sample_state(du, ["event_type"], "user_id", KMV_K)
    return kmv_distinct_estimate(state, ["event_type"], KMV_K)


KMV_SETOPS_ORACLE = f"""
WITH du AS (
    SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL
),
st AS (
    SELECT event_type, user_id, md5(user_id::VARCHAR) AS p,
           row_number() OVER (
               PARTITION BY event_type ORDER BY md5(user_id::VARCHAR), user_id
           ) AS rn
    FROM du
),
s AS (SELECT event_type, user_id, p FROM st WHERE rn <= {KMV_K}),
t AS (SELECT DISTINCT event_type FROM du),
pairs AS (
    SELECT a.event_type AS ta, b.event_type AS tb
    FROM t a JOIN t b ON a.event_type < b.event_type
),
fan AS (
    SELECT pr.ta, pr.tb, s.user_id, s.p,
           s.event_type = pr.ta AS in_a, s.event_type = pr.tb AS in_b
    FROM pairs pr JOIN s ON s.event_type = pr.ta OR s.event_type = pr.tb
),
uni AS (
    SELECT ta, tb, user_id, p, max(in_a) AS in_a, max(in_b) AS in_b
    FROM fan GROUP BY 1, 2, 3, 4
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY ta, tb ORDER BY p, user_id) AS rn
    FROM uni
),
agg AS (
    SELECT ta, tb, count(*) AS nrows,
           max(('0x' || substr(p, 1, 12))::BIGINT / 281474976710656.0) AS uk,
           CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT) AS kboth
    FROM r WHERE rn <= {KMV_K} GROUP BY 1, 2
)
SELECT ta AS event_type_a, tb AS event_type_b,
       CASE WHEN nrows < {KMV_K} THEN nrows
            ELSE CAST(floor({KMV_K - 1} / uk) AS BIGINT) END AS union_est,
       CASE WHEN nrows < {KMV_K} THEN kboth
            ELSE CAST(floor(CAST(kboth * {KMV_K - 1} AS DOUBLE) / (uk * {KMV_K}))
                      AS BIGINT) END AS inter_est,
       nrows < {KMV_K} AS exact
FROM agg
"""


@register("kmv_user_overlap", KMV_SETOPS_ORACLE)
def q_kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-slice user-base OVERLAP from the sample states alone
    (``operators/sample.kmv_pairwise_set_estimates``): for every pair of
    event types, the distinct-user count of the UNION and the INTERSECTION
    estimated by KMV set algebra — merged bottom-k states are a valid union
    sketch (bottom-k closure), and K∩/k over the merged sketch estimates the
    Jaccard, so est(∩) = ⌊K∩·(k-1)/(u_k·k)⌋. Pairs whose merged union holds
    fewer than k ids come back exact (flagged). At 100 TB this answers "how
    many users do slices A and B share?" from O(k·sides) persisted state —
    the corpus-grain distinct self-join it replaces is one of the most
    expensive queries a warehouse runs. Fully hash-checked: md5 membership
    is string equality and the single multiply/divide/floor is parenthesized
    identically in the DuckDB oracle — unlike a theta-sketch intersection,
    the ESTIMATES themselves are bit-reproducible cross-engine."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.sample import (
        kmv_pairwise_set_estimates,
        sample_state,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    du = (
        events.filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    state = sample_state(du, ["event_type"], "user_id", KMV_K)
    return kmv_pairwise_set_estimates(state, [], "event_type", "user_id", KMV_K)


# Robust outlier audit: median + MAD by the same integer order-statistic
# machinery as QUANTILE_STATE_ORACLE (cum·2 >= N), deviations stay in the
# cents domain, flag rule |v-med| > 3·MAD is a pure integer comparison.
MAD_ORACLE = """
WITH e AS (
    SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v
    FROM events WHERE value IS NOT NULL
),
h AS (SELECT event_type, v, count(*) AS c FROM e GROUP BY 1, 2),
cum AS (
    SELECT event_type, v,
           sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
           sum(c) OVER (PARTITION BY event_type) AS n
    FROM h
),
med AS (
    SELECT event_type, min(CASE WHEN cum * 2 >= n THEN v END) AS med
    FROM cum GROUP BY 1
),
d AS (
    SELECT e.event_type, e.v, abs(e.v - m.med) AS av
    FROM e JOIN med m USING (event_type)
),
dh AS (SELECT event_type, av, count(*) AS c FROM d GROUP BY 1, 2),
dcum AS (
    SELECT event_type, av,
           sum(c) OVER (PARTITION BY event_type ORDER BY av) AS cum,
           sum(c) OVER (PARTITION BY event_type) AS n
    FROM dh
),
mad AS (
    SELECT event_type, min(CASE WHEN cum * 2 >= n THEN av END) AS madv
    FROM dcum GROUP BY 1
)
SELECT d.event_type,
       count(*)::BIGINT AS n_values,
       max(m.med)::BIGINT AS median,
       max(x.madv)::BIGINT AS mad,
       CAST(sum(CASE WHEN d.av > 3 * x.madv THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM d JOIN med m USING (event_type) JOIN mad x USING (event_type)
GROUP BY 1
"""


@register("streaming_mad_audit", MAD_ORACLE)
def q_streaming_mad_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MAD outlier audit read from a STREAM-MAINTAINED histogram state:
    the same fold rail as ``streaming_quantile_maintenance`` (4 micro-batches,
    count-sum fold, exactly-once sidecar), finalized through
    ``mad_outlier_stats_from_state`` instead of percentiles. The histogram is
    a lossless sufficient statistic, so EVERY state-grain readout — not just
    the one anticipated at build time — must reproduce the batch recompute
    bit-for-bit on the streamed state; this query pins that composability
    claim with a driver row (same oracle as ``mad_outlier_audit``)."""
    import tempfile

    from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
        histogram_state,
        mad_outlier_stats_from_state,
        merge_histogram_states,
    )
    from airflow_courier_payout_ledger_pipeline_spark.sources.lakehouse import Lakehouse
    from airflow_courier_payout_ledger_pipeline_spark.streaming.ingest import (
        stream_fold_state,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    e = events.filter(F.col("value").isNotNull()).select(
        "event_type", F.round(F.col("value") * 100, 0).cast("bigint").alias("v")
    )

    tmp = tempfile.mkdtemp(prefix="stream_mad_")
    src = f"{tmp}/v"
    e.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lake = Lakehouse(f"{tmp}/lake")
    state_schema = histogram_state(e, ["event_type"], "v").schema
    q = stream_fold_state(
        stream,
        lake,
        "idx",
        "mad_state",
        state_fn=lambda b: histogram_state(b, ["event_type"], "v"),
        merge_fn=lambda a, b: merge_histogram_states(a, b, ["event_type"]),
        checkpoint=f"{tmp}/ckpt",
        query_name="drv_stream_mad",
    )
    q.awaitTermination()
    state = lake.read(spark, "idx", "mad_state", state_schema)
    return mad_outlier_stats_from_state(state, ["event_type"], k=3)


@register("mad_outlier_audit", MAD_ORACLE)
def q_mad_outlier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type value-outlier audit
    (``operators/quantile.mad_outlier_stats``): median and MAD as exact
    integer order statistics over the cents domain (two histogram passes —
    exchanges carry DISTINCT values, never rows), then one row-grain count of
    ``|v − median| > 3·MAD``. MAD resists the heavy tail that drags a
    stddev-based z-score (a single $10M glitch row shifts mean AND sigma;
    it cannot move either median or MAD), so the audit is the day-over-day
    diffable quality gate for ingest telemetry. Pure integer arithmetic
    end-to-end — bit-reproducible, hash-checked against the replicated
    DuckDB formula."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
        mad_outlier_stats,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    e = events.filter(F.col("value").isNotNull()).select(
        "event_type", F.round(F.col("value") * 100, 0).cast("bigint").alias("v")
    )
    return mad_outlier_stats(e, ["event_type"], "v", k=3)


N_TRAINING_SHARDS = 8

SHARD_LAYOUT_ORACLE = f"""
WITH d AS (
    SELECT doc_id, md5(doc_id::VARCHAR) AS p
    FROM documents WHERE doc_id IS NOT NULL
),
s AS (
    SELECT doc_id, p,
           (('0x' || substr(p, 1, 4))::BIGINT % {N_TRAINING_SHARDS})::INT AS shard
    FROM d
)
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY p, doc_id)::BIGINT
           AS shard_pos
FROM s
"""


@register("training_shard_layout", SHARD_LAYOUT_ORACLE)
def q_training_shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard layout
    (``operators/sampling.training_shard_layout``): every document gets a
    shard (16-bit md5 draw mod 8) and a within-shard pseudo-random position
    — the global-shuffle file layout training jobs consume, reproducible
    bit-for-bit with no rand()/seed and APPEND-STABLE (a doc's shard is a
    pure function of its id, so corpus updates never migrate existing docs
    between shards — repartition(N)/round-robin layouts reshuffle
    everything). One shard-keyed exchange (the writer's partitioning) +
    the per-shard sort the sorted-shard writer performs anyway; no global
    sort. The operator preserves every input column (it IS the writer's
    frame); this query feeds a pruned id projection because only the layout
    table is oracle-checked here — the payload-carrying composition is
    `training_shards_end_to_end`."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.sampling import (
        training_shard_layout,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return training_shard_layout(docs.select("doc_id"), "doc_id", N_TRAINING_SHARDS)


CHUNK_W, CHUNK_S = 32, 24

CHUNK_ORACLE = f"""
WITH norm AS (
    SELECT doc_id, string_split({NORM}, ' ') AS ws
    FROM documents WHERE text IS NOT NULL AND {NORM} != ''
),
szn AS (SELECT doc_id, ws, len(ws) AS n FROM norm),
c AS (
    SELECT doc_id, ws, n,
           unnest(generate_series(
               0,
               CASE WHEN n <= {CHUNK_W} THEN 0
                    ELSE (n - {CHUNK_W} + {CHUNK_S - 1}) // {CHUNK_S} END
           )) AS j
    FROM szn
)
SELECT doc_id, j::BIGINT AS chunk_id, (j * {CHUNK_S} + 1)::BIGINT AS start_tok,
       (least(j * {CHUNK_S} + {CHUNK_W}, n) - j * {CHUNK_S})::BIGINT AS n_tokens,
       array_to_string(
           list_slice(ws, j * {CHUNK_S} + 1, least(j * {CHUNK_S} + {CHUNK_W}, n)),
           ' '
       ) AS chunk_text
FROM c
"""


@register("document_chunks", CHUNK_ORACLE)
def q_document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking of the corpus into training sequences
    (``operators/tokenize.chunk_documents``): 32-token windows advancing by
    24 (8-token overlap carries context across boundaries), tail chunks kept
    at natural length — the cleaning→packing bridge every pretraining
    pipeline runs. Chunk boundaries are a pure function of the normalized
    text (BIGINT ceil arithmetic, no float), so the output is deterministic
    and the DuckDB oracle replays it token-for-token. Zero shuffles: split /
    sequence-explode / slice / re-join are map-side expressions in one
    codegen span; fan-out is ~n/stride rows per doc and the token array
    never reaches an exchange. TOKEN-grain complement of ``doc_chunking``
    (character-window chunks for embedding/retrieval units): model context
    budgets are token counts, so training-sequence cutting must window
    tokens, not characters."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        chunk_documents,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return chunk_documents(docs, CHUNK_W, CHUNK_S)


WSAMPLE_K = 8

WSAMPLE_ORACLE = f"""
WITH d AS (
    SELECT source, doc_id, n_chars FROM documents
    WHERE doc_id IS NOT NULL AND n_chars > 0
),
p AS (
    SELECT source, doc_id, n_chars,
           (CAST(n_chars AS BIGINT) * 65536)
               // (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT + 1)
               AS wp
    FROM d
),
r AS (
    SELECT source, doc_id, n_chars,
           row_number() OVER (
               PARTITION BY source ORDER BY wp DESC, doc_id
           ) AS rank
    FROM p
)
SELECT source, doc_id, n_chars::BIGINT AS n_chars, rank::BIGINT AS rank
FROM r WHERE rank <= {WSAMPLE_K}
"""


@register("weighted_sample_per_source", WSAMPLE_ORACLE)
def q_weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted fixed-size document sample per source, as MERGED state
    (``operators/sample.weighted_sample_state``): quantized priority sampling
    (Duffield–Lund–Thorup) — priority = ⌊n_chars·65536/u⌋ with u the 16-bit
    md5(doc_id) draw, sample = top-k by (priority DESC, id) per source. The
    weight-proportional counterpart of `sample_state_maintenance`'s uniform
    draw and the fixed-size counterpart of `weighted_sample`'s Bernoulli:
    the curation shape for \"show me k docs per source, longer docs more
    likely\". Built as two merged halves (top-k closure under union ⇒ merge
    ≡ full rebuild, which is what the oracle computes); all-BIGINT priority
    arithmetic replays exactly in DuckDB (`div` = `//`)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.sample import (
        merge_weighted_sample_states,
        weighted_sample_from_state,
        weighted_sample_state,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    d = docs.filter(
        F.col("doc_id").isNotNull() & (F.col("n_chars") > 0)
    ).select("source", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"))
    state = merge_weighted_sample_states(
        weighted_sample_state(
            d.filter(F.col("doc_id") % 2 == 0), ["source"], "doc_id", "n_chars", WSAMPLE_K
        ),
        weighted_sample_state(
            d.filter(F.col("doc_id") % 2 == 1), ["source"], "doc_id", "n_chars", WSAMPLE_K
        ),
        ["source"],
        "doc_id",
        WSAMPLE_K,
    )
    return weighted_sample_from_state(state, ["source"], "doc_id")


KMV_ROLL_K = 128

KMV_ROLLING_ORACLE = f"""
WITH du AS (
    SELECT DISTINCT ts::DATE AS day, user_id FROM events WHERE user_id IS NOT NULL
),
pr AS (SELECT day, user_id, md5(user_id::VARCHAR) AS p FROM du),
st AS (
    SELECT day, user_id, p,
           row_number() OVER (PARTITION BY day ORDER BY p, user_id) AS rn
    FROM pr
),
state AS (SELECT day, user_id, p FROM st WHERE rn <= {KMV_ROLL_K}),
spine AS (SELECT DISTINCT day FROM du),
contrib AS (
    SELECT d.day AS rd, s.user_id, s.p
    FROM state s
    JOIN spine d ON d.day BETWEEN s.day AND s.day + 6
),
ded AS (SELECT DISTINCT rd, user_id, p FROM contrib),
rk AS (
    SELECT rd, p,
           row_number() OVER (PARTITION BY rd ORDER BY p, user_id) AS rn
    FROM ded
),
agg AS (
    SELECT rd, count(*) AS nrows,
           max(('0x' || substr(p, 1, 12))::BIGINT / 281474976710656.0) AS uk
    FROM rk WHERE rn <= {KMV_ROLL_K} GROUP BY 1
)
SELECT rd AS day,
       CASE WHEN nrows < {KMV_ROLL_K} THEN nrows
            ELSE CAST(floor({KMV_ROLL_K - 1} / uk) AS BIGINT) END AS distinct_est,
       nrows < {KMV_ROLL_K} AS exact
FROM agg
"""


@register("kmv_rolling_7d_distinct", KMV_ROLLING_ORACLE)
def q_kmv_rolling_7d_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKETCH-ROLLUP window readout: rolling 7-day distinct users per day,
    computed by MERGING day-grain KMV states instead of rescanning events —
    the pattern that makes windowed distinct counts O(days x k) at 100 TB:

      1. one pass builds a bottom-k state PER DAY
         (``operators/sample.sample_state`` — WindowGroupLimit prunes to k
         rows/day before the exchange);
      2. each day-state fans out to the <= 7 readout days it serves (a
         sequence-explode, k x 7 rows/day — no range join, no re-scan);
      3. per readout day, the union of contributing states is deduped and
         re-capped to bottom-k (KMV closure under union: merge == rebuild),
         then ``kmv_distinct_estimate`` reads the cardinality.

    The exact twin `rolling_distinct_users_7d` re-aggregates (user, day)
    rows per window — correct, but its shuffle carries the full user-day
    grain every run; this rollup persists k rows/day and answers ANY
    trailing window (7d here, 30d tomorrow) from states alone. Same
    merged-then-readout dedupe discipline as ``merge_sample_states`` (lag
    over the shared window spec — same user in two day-states has the same
    md5 priority, so copies are adjacent; shuffle-neutral). Bit-exact
    cross-engine (md5 draw, 48-bit->double, one IEEE division, floor), so
    the DuckDB oracle replays the estimator end-to-end."""
    from pyspark.sql.window import Window

    from airflow_courier_payout_ledger_pipeline_spark.operators.sample import (
        kmv_distinct_estimate,
        sample_state,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    du = (
        events.filter(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    state = sample_state(du, ["day"], "user_id", KMV_ROLL_K)
    days = du.select("day").distinct().withColumnRenamed("day", "rd")
    contrib = state.withColumn(
        "rd", F.explode(F.expr("sequence(day, date_add(day, 6))"))
    ).join(F.broadcast(days), "rd", "left_semi")
    w = Window.partitionBy("rd").orderBy("__priority", "user_id")
    merged = (
        contrib.withColumn(
            "__dup", F.lag("user_id").over(w) == F.col("user_id")
        )
        .filter(~F.coalesce(F.col("__dup"), F.lit(False)))
        .drop("__dup")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= KMV_ROLL_K)
        .drop("__rn", "day")
    )
    return kmv_distinct_estimate(merged, ["rd"], KMV_ROLL_K).withColumnRenamed(
        "rd", "day"
    )


QUANTILE_ROLLING_ORACLE = """
WITH e AS (
    SELECT ts::DATE AS day, CAST(round(value * 100, 0) AS BIGINT) AS v
    FROM events WHERE value IS NOT NULL
),
spine AS (SELECT DISTINCT day FROM e),
w AS (
    SELECT s.day AS rd, e.v
    FROM e JOIN spine s ON e.day BETWEEN s.day - 6 AND s.day
),
h AS (SELECT rd, v, count(*) AS c FROM w GROUP BY 1, 2),
cum AS (
    SELECT rd, v,
           sum(c) OVER (PARTITION BY rd ORDER BY v) AS cum,
           sum(c) OVER (PARTITION BY rd) AS n
    FROM h
)
SELECT rd AS day,
       max(n)::BIGINT AS n_values,
       min(CASE WHEN cum * 2 >= n THEN v END) AS p50,
       min(CASE WHEN cum * 10 >= 9 * n THEN v END) AS p90,
       min(CASE WHEN cum * 100 >= 99 * n THEN v END) AS p99
FROM cum GROUP BY 1
"""


@register("quantile_rolling_7d", QUANTILE_ROLLING_ORACLE)
def q_quantile_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day EXACT value percentiles per day (p50/p90/p99 in cents)
    from day-grain histogram states — the histogram twin of
    `kmv_rolling_7d_distinct`'s sketch-rollup pattern, proving the rollup
    shape generalizes across the mergeable-state family:

      1. one pass reduces events to a per-DAY (value, cnt) histogram
         (``operators/quantile.histogram_state`` — the lossless quantile
         sufficient statistic, bounded by the cents domain, not row count);
      2. each day-state fans out to the <= 7 readout days it serves
         (sequence-explode; the exchange carries day x distinct-cents rows,
         never events);
      3. per readout day, contributions merge by count sum (the histogram
         fold law — merge == rebuild, exactly) and
         ``quantiles_from_state`` reads exact integer percentiles.

    Unlike a row-grain RANGE window over events (re-shuffles the full event
    grain every run, and percentiles would need a per-window sort), the
    states are persisted once and answer ANY trailing window from
    O(days x domain) rows — and the readout stays bit-exact, so the DuckDB
    oracle replays it without tolerance. No row-grain or global sort
    anywhere."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
        histogram_state,
        quantiles_from_state,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    e = events.filter(F.col("value").isNotNull()).select(
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    day_state = histogram_state(e, ["day"], "v")
    spine = e.select("day").distinct().withColumnRenamed("day", "rd")
    contrib = day_state.withColumn(
        "rd", F.explode(F.expr("sequence(day, date_add(day, 6))"))
    ).join(F.broadcast(spine), "rd", "left_semi")
    merged = contrib.groupBy("rd", "value").agg(F.sum("cnt").alias("cnt"))
    return quantiles_from_state(merged, ["rd"]).withColumnRenamed("rd", "day")


HEAVY_ROLLING_PCT = 1  # heavy = >= 1% of the window's event mass

HEAVY_ROLLING_ORACLE = f"""
WITH e AS (SELECT ts::DATE AS day, user_id FROM events WHERE user_id IS NOT NULL),
spine AS (SELECT DISTINCT day FROM e),
w AS (
    SELECT s.day AS rd, e.user_id
    FROM e JOIN spine s ON e.day BETWEEN s.day - 6 AND s.day
),
tot AS (SELECT rd, count(*)::BIGINT AS total FROM w GROUP BY 1),
per AS (SELECT rd, user_id, count(*)::BIGINT AS freq FROM w GROUP BY 1, 2)
SELECT per.rd AS day, per.user_id, per.freq, tot.total AS window_total
FROM per JOIN tot USING (rd)
WHERE per.freq * 100 >= {HEAVY_ROLLING_PCT} * tot.total
"""


@register("heavy_users_rolling_7d", HEAVY_ROLLING_ORACLE)
def q_heavy_users_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day HEAVY USERS per day (>= 1% of the window's event mass)
    through day-grain CMS states — the frequency-sketch instance of the
    rollup pattern (`kmv_rolling_7d_distinct` = cardinality,
    `quantile_rolling_7d` = ranks, this = heavy hitters):

      1. one pass builds a per-DAY count-min sketch
         (``operators/sketch.cms_state_grouped`` — <= 4x1024 state rows/day,
         map-side partials, never raw events on the exchange);
      2. day states fan out to the <= 7 readout days they serve and merge by
         bucket-wise count sum (the CMS fold law); window totals read off
         the merged states exactly (sum cnt = depth * N);
      3. the PASSING-BUCKET table per (window, seed) — <= 100/pct buckets by
         mass conservation — broadcasts back, and an event qualifies as a
         candidate only if ALL depth seeds pass (one-sided CMS error: the
         candidate set is a guaranteed superset);
      4. exact counts over candidate rows restore oracle equality.

    UNLIKE the exact twin shape (`rolling_distinct_users_7d`'s re-aggregate),
    the only corpus-grain exchange carries candidate rows — at 100 TB with a
    heavy-tailed user distribution that is the difference between shuffling
    the fan-out of every event and shuffling ~1/pct of it. Fully distributed:
    no driver-side literal candidate lists (the per-window candidate tables
    ride a broadcast join), so the day count can grow without driver cost."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.sketch import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_state_grouped,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    e = events.filter(F.col("user_id").isNotNull()).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    day_state = cms_state_grouped(e, ["day"], "user_id")
    spine = e.select("day").distinct().withColumnRenamed("day", "rd")
    merged = (
        day_state.withColumn(
            "rd", F.explode(F.expr("sequence(day, date_add(day, 6))"))
        )
        .join(F.broadcast(spine), "rd", "left_semi")
        .groupBy("rd", "seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        # PIN the merged state: it is referenced by totals, passing, and the
        # final join — without a barrier each reference re-executes the
        # day-sketch + merge aggs (measured 14 exchanges vs 5). State grain
        # (<= windows x depth x width rows); LAZY pin (deterministic
        # lineage, so first-action materialization is race-safe and skips
        # the synchronous construction-time job — the r17 pin A/B).
        .localCheckpoint(eager=False)
    )
    # exact window totals off the merged state: every event lands in exactly
    # one bucket per seed, so sum(cnt) = depth * N per window. Integer DIV,
    # not float /: the quotient must stay exact past double's 2^52 range
    # (the repo's standard 100 TB offset rule)
    totals = merged.groupBy("rd").agg(
        F.expr(f"CAST(sum(cnt) DIV {CMS_DEPTH} AS BIGINT)").alias("window_total")
    )
    # mass conservation: <= 100/pct passing buckets per (window, seed) -> tiny
    passing = merged.join(totals, "rd").filter(
        F.col("cnt") * 100 >= HEAVY_ROLLING_PCT * F.col("window_total")
    ).select("rd", "seed", "bucket")
    ef = e.withColumn(
        "rd", F.explode(F.expr("sequence(day, date_add(day, 6))"))
    ).join(F.broadcast(spine), "rd", "left_semi")
    seeds = F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("seed")
    ef4 = ef.select(
        "rd",
        "user_id",
        seeds,
    ).withColumn(
        # probe hashing MUST use the build width: a drifted literal here would
        # silently break the candidate superset (the cms_probe_expr width
        # lesson, applied to the distributed probe)
        "bucket",
        F.pmod(F.xxhash64(F.col("user_id"), F.col("seed")), F.lit(CMS_WIDTH)),
    )
    cand = ef4.join(F.broadcast(passing), ["rd", "seed", "bucket"], "inner")
    per = cand.groupBy("rd", "user_id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct("seed").alias("__seeds"),
    )
    exact = per.filter(F.col("__seeds") == CMS_DEPTH).select(
        "rd",
        "user_id",
        F.expr(f"CAST(__n DIV {CMS_DEPTH} AS BIGINT)").alias("freq"),
    )
    return (
        exact.join(F.broadcast(totals), "rd")
        .filter(F.col("freq") * 100 >= HEAVY_ROLLING_PCT * F.col("window_total"))
        .select(F.col("rd").alias("day"), "user_id", "freq", "window_total")
    )
