"""Pipeline/mart maintenance: snapshot diff, funnels, skew profile, PII scrub, corpus curation funnel, centroid stats, chunking, OOV, per-source caps, streaming ledger maintenance.

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


# =====================================================================================
# Round-3 surface: snapshot reconciliation, funnel analytics, skew diagnosis,
# PII scrubbing, corpus curation, embedding column stats
# =====================================================================================

# Snapshot diff simulates two versions of the orders table from one base (the
# testdata has no version axis): v_old drops every 7th key (later inserts),
# v_new drops every 11th (deletes) and bumps price by 10 on every 5th key
# (updates). Decimal + integer is exact in both engines, so 'changed' is an
# exact comparison, never a float tolerance.
SNAPSHOT_DIFF_ORACLE = """
WITH base AS (
    SELECT o_orderkey, o_orderstatus AS status,
           CAST(o_totalprice AS DECIMAL(14,2)) AS price
    FROM orders
),
v_old AS (SELECT * FROM base WHERE o_orderkey % 7 != 0),
v_new AS (
    SELECT o_orderkey, status,
           CAST(price + CASE WHEN o_orderkey % 5 = 0 THEN 10 ELSE 0 END
                AS DECIMAL(14,2)) AS price
    FROM base WHERE o_orderkey % 11 != 0
),
j AS (
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           o.status AS old_status, n.status AS new_status,
           o.price AS old_price, n.price AS new_price,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.status IS DISTINCT FROM n.status
                     OR o.price IS DISTINCT FROM n.price THEN 'changed'
           END AS change_type
    FROM v_old o FULL OUTER JOIN v_new n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey, change_type, old_status, new_status,
       old_price::DOUBLE AS old_price, new_price::DOUBLE AS new_price
FROM j WHERE change_type IS NOT NULL
"""


@register("snapshot_diff_orders", SNAPSHOT_DIFF_ORACLE)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal changelog between two table snapshots (added/removed/changed keys
    with before/after values) — the read side of CDC, pairing with
    Lakehouse.read_versioned time travel (operators/merge.snapshot_diff)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.merge import snapshot_diff

    base = load_tables(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(14,2)").alias("price"),
    )
    v_old = base.filter(F.col("o_orderkey") % 7 != 0)
    v_new = base.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "price",
        (
            F.col("price")
            + F.when(F.col("o_orderkey") % 5 == 0, F.lit(10)).otherwise(F.lit(0))
        ).cast("decimal(14,2)"),
    )
    return snapshot_diff(v_old, v_new, ["o_orderkey"], ["status", "price"])


FUNNEL_ORACLE = """
WITH f AS (
    SELECT user_id,
           min(ts) FILTER (WHERE event_type = 'view') AS first_view,
           min(ts) FILTER (WHERE event_type = 'click') AS first_click,
           min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
    FROM events GROUP BY user_id
)
SELECT user_id, first_view, first_click, first_purchase,
       (first_click IS NOT NULL AND first_view IS NOT NULL
        AND first_click > first_view) AS clicked_after_view,
       (first_purchase IS NOT NULL AND first_click IS NOT NULL
        AND first_purchase > first_click) AS converted
FROM f WHERE first_view IS NOT NULL
"""


@register("funnel_conversion", FUNNEL_ORACLE)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user view → click → purchase funnel: first event time per stage
    (conditional min — one grouped agg, one shuffle on user_id regardless of
    stage count) and strict-progression flags. The canonical product-analytics
    query a training-events pipeline materializes daily."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    f = ev.groupBy("user_id").agg(
        first_of("view").alias("first_view"),
        first_of("click").alias("first_click"),
        first_of("purchase").alias("first_purchase"),
    )
    return f.filter(F.col("first_view").isNotNull()).select(
        "user_id",
        "first_view",
        "first_click",
        "first_purchase",
        (
            F.col("first_click").isNotNull()
            & (F.col("first_click") > F.col("first_view"))
        ).alias("clicked_after_view"),
        (
            F.col("first_purchase").isNotNull()
            & F.col("first_click").isNotNull()
            & (F.col("first_purchase") > F.col("first_click"))
        ).alias("converted"),
    )


SKEW_PROFILE_ORACLE = """
WITH c AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
t AS (SELECT SUM(n)::DOUBLE / count(*) AS mean FROM c)
SELECT c.l_suppkey, c.n,
       round(c.n::DOUBLE / t.mean, 4) AS skew_ratio,
       (round(c.n::DOUBLE / t.mean, 4) > 2.0) AS is_hot
FROM c CROSS JOIN t
"""


@register("key_skew_profile", SKEW_PROFILE_ORACLE)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis over the fact table's courier key: per-key load
    vs the mean, flagging keys that would dominate a shuffle partition — the
    measurement that decides between AQE skew split and operators/skew.salted_join."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.skew import (
        key_skew_profile,
    )

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return key_skew_profile(li.select("l_suppkey"), "l_suppkey", hot_ratio=2.0)


# --- PII scrubbing -------------------------------------------------------------------

from airflow_courier_payout_ledger_pipeline_spark.functions.text import (  # noqa: E402
    PII_PATTERNS,
)

# The synthetic docs carry no PII, so the query plants deterministic markers
# (per-doc email, phone on every 3rd doc, ssn on every 5th) in BOTH engines and
# then audits + scrubs them. Counts are measured against the same augmented
# text for every kind (a phone-shaped ssn counts in both audits — intentional:
# the audit is per-pattern exposure, the scrub is order-aware).
_PII_AUG_SQL = (
    "text || ' contact u' || doc_id::VARCHAR || '@example.com'"
    " || CASE WHEN doc_id % 3 = 0 THEN ' call 555-010-2233' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-6789' ELSE '' END"
)
_PII_COUNTS_SQL = ", ".join(
    f"len(regexp_extract_all(aug, '{p}'))::BIGINT AS {k}_n"
    for k, p in PII_PATTERNS.items()
)
_PII_RED_SQL = "aug"
for _k, _p in PII_PATTERNS.items():
    _PII_RED_SQL = f"regexp_replace({_PII_RED_SQL}, '{_p}', '[{_k.upper()}]', 'g')"

PII_SCRUB_ORACLE = f"""
WITH a AS (SELECT doc_id, {_PII_AUG_SQL} AS aug FROM documents)
SELECT doc_id, {_PII_COUNTS_SQL}, md5({_PII_RED_SQL}) AS redacted_fp
FROM a
"""


@register("pii_scrub", PII_SCRUB_ORACLE)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus PII scrubbing: per-kind audit counts + ordered regexp_replace
    redaction (functions/text.redact_pii) — pure map-side codegen, zero
    shuffles at any corpus size; the redacted text is fingerprinted so the
    full scrub output is hash-checked without shipping megabytes of text
    through the driver compare."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import (
        pii_counts,
        redact_pii,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    aug = F.concat(
        F.col("text"),
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" call 555-010-2233")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" ssn 123-45-6789")).otherwise(
            F.lit("")
        ),
    )
    a = docs.select("doc_id", aug.alias("aug"))
    counts = pii_counts(F.col("aug"))
    return a.select(
        "doc_id",
        *[c.cast("long").alias(f"{k}_n") for k, c in counts.items()],
        F.md5(redact_pii(F.col("aug"))).alias("redacted_fp"),
    )


# --- End-to-end corpus curation ------------------------------------------------------

CURATION_ORACLE = f"""
WITH kept AS (
    SELECT doc_id, md5({NORM}) AS fp
    FROM documents
    WHERE length(text) BETWEEN 100 AND 20000
),
dedup AS (SELECT fp, min(doc_id) AS doc_id FROM kept GROUP BY fp)
SELECT doc_id, fp FROM dedup
WHERE substr(md5(doc_id::VARCHAR), 1, 2) < '40'
"""


@register("corpus_curation", CURATION_ORACLE)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical curation pipeline in one plan: length gate (map-side,
    pushed to the scan) → exact near-free dedup on the normalized-content
    fingerprint keeping the lowest doc_id (one shuffle) → deterministic ~25%
    md5-threshold sample (map-side, reproducible across runs and cluster
    sizes). Order matters and is the production order: dedup before sampling
    so the sample rate applies to unique content, not to duplicate mass."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import fingerprint

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    kept = docs.filter(F.length("text").between(100, 20000)).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )
    dedup = kept.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return dedup.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "40"
    ).select("doc_id", "fp")


# --- Embedding column statistics -----------------------------------------------------

LABEL_CENTROID_ORACLE = """
SELECT label, count(*) AS n,
       round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))), 4) AS avg_norm,
       round(avg(embedding[1]::DOUBLE), 4) AS dim0_mean
FROM embeddings GROUP BY label
"""


@register("label_centroid_stats", LABEL_CENTROID_ORACLE)
def q_label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding profile (row count, mean L2 norm, mean of the first
    coordinate): grouped agg over JVM higher-order array functions — the sanity
    sweep a training pipeline runs before trusting an embedding table. Rounded
    to 4 decimals before the driver hash (float sum order differs across
    engines at ~1e-15)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import norm

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(norm(F.col("embedding"))), 4).alias("avg_norm"),
        F.round(F.avg(F.element_at("embedding", 1).cast("double")), 4).alias(
            "dim0_mean"
        ),
    )


# --- Document chunking ---------------------------------------------------------------

CHUNK_SIZE, CHUNK_STRIDE = 500, 400  # 100-char overlap between adjacent chunks

CHUNKING_ORACLE = f"""
WITH c AS (
    SELECT doc_id, text, greatest(length(text), 1) AS n FROM documents
),
starts AS (
    SELECT doc_id, text, unnest(generate_series(0, (n - 1) // {CHUNK_STRIDE})) AS i
    FROM c
)
SELECT doc_id, i::INT AS chunk_idx,
       length(substr(text, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE}))::BIGINT AS chunk_len,
       md5(substr(text, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})) AS chunk_fp
FROM starts
"""


@register("doc_chunking", CHUNKING_ORACLE)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width chunking (500-char windows, 400-char stride) —
    the doc → embedding-unit explosion every retrieval/training pipeline runs.
    Pure JVM generate: sequence + posexplode-style explode + substr, zero
    Python, zero shuffles; output fan-out is len/stride per doc and each chunk
    is fingerprinted so the driver hash covers content, not just counts."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    n = F.greatest(F.length("text"), F.lit(1))
    idx = F.explode(
        F.sequence(F.lit(0).cast("long"), F.floor((n - 1) / F.lit(CHUNK_STRIDE)))
    ).alias("i")
    chunks = docs.select("doc_id", "text", idx)
    chunk = F.col("text").substr(
        (F.col("i") * CHUNK_STRIDE + 1).cast("int"), F.lit(CHUNK_SIZE)
    )
    return chunks.select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_idx"),
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_fp"),
    )


# --- OOV rate vs learned vocabulary --------------------------------------------------

OOV_VOCAB_K = 10  # testdata's word salad has ~50 distinct tokens; production: ~1e5

OOV_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS token FROM documents
),
t AS (SELECT doc_id, token FROM tok WHERE token != ''),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY token),
vocab AS (SELECT token FROM dfreq ORDER BY df DESC, token LIMIT {OOV_VOCAB_K}),
per AS (
    SELECT t.doc_id, count(*) AS n_tok,
           count(*) FILTER (WHERE v.token IS NULL) AS oov
    FROM t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY t.doc_id
)
SELECT doc_id, n_tok::BIGINT AS n_tokens, oov::BIGINT AS oov_tokens,
       round(oov::DOUBLE / n_tok, 4) AS oov_rate
FROM per
"""


@register("oov_rate", OOV_ORACLE)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against a corpus-learned top-k
    vocabulary (df-ranked, ties broken by token — deterministic at any
    parallelism). Two-phase plan that scales: the vocab is a driver-bounded
    top-k (TakeOrdered, O(k) per partition — never a global sort of the term
    table) broadcast into a map-side membership join; the corpus tokens
    shuffle once for the per-doc aggregation."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import (
        normalize_text,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    tok = (
        docs.select("doc_id", F.explode(F.split(normalize_text(F.col("text")), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    dfreq = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    vocab = (
        dfreq.orderBy(F.desc("df"), F.asc("token"))
        .limit(OOV_VOCAB_K)
        .select(F.col("token").alias("v_token"))
    )
    joined = tok.join(
        F.broadcast(vocab), tok["token"] == vocab["v_token"], "left"
    )
    per = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count(F.when(F.col("v_token").isNull(), F.lit(1))).alias("oov_tokens"),
    )
    return per.select(
        "doc_id",
        "n_tokens",
        "oov_tokens",
        F.round(F.col("oov_tokens").cast("double") / F.col("n_tokens"), 4).alias(
            "oov_rate"
        ),
    )


# --- Per-source cap (domain balancing) -----------------------------------------------

SOURCE_CAP = 50

SOURCE_CAP_ORACLE = f"""
SELECT doc_id, source FROM (
    SELECT doc_id, source,
           row_number() OVER (
               PARTITION BY source ORDER BY md5(doc_id::VARCHAR), doc_id
           ) AS rn
    FROM documents
) WHERE rn <= {SOURCE_CAP}
"""


@register("per_source_cap", SOURCE_CAP_ORACLE)
def q_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: keep at most 50 documents per source, selected by a
    deterministic content-independent order (md5 of the id — a reshuffleable
    random-but-reproducible draw). Same WindowGroupLimit pushdown family as
    topk_per_group: the per-group limit prunes before the full sort."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SOURCE_CAP)
        .select("doc_id", "source")
    )


# --- Streaming incremental mart maintenance ------------------------------------------

from airflow_courier_payout_ledger_pipeline_spark.registry import LEDGER_ORACLE  # noqa: E402


@register("streaming_ledger_maintenance", LEDGER_ORACLE)
def q_streaming_ledger_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship mart maintained CONTINUOUSLY: the fact table replayed as a
    4-file stream (maxFilesPerTrigger=1 → 4 micro-batches), each batch folded
    into the mergeable ledger state via foreachBatch (stream-static dim joins +
    additive Decimal state, streaming/ingest.stream_fold_state), then finalized
    once. Hash-checked against the FULL-recompute oracle — the streaming fold
    must be indistinguishable from recomputing history under any batch split,
    the contract that licenses O(increment) continuous maintenance at 100 TB."""
    import tempfile

    from airflow_courier_payout_ledger_pipeline_spark.plans.ledger import (
        finalize_ledger_state,
        ledger_state,
        merge_ledger_states,
    )
    from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import (
        courier_domain,
    )
    from airflow_courier_payout_ledger_pipeline_spark.sources.lakehouse import Lakehouse
    from airflow_courier_payout_ledger_pipeline_spark.streaming.ingest import (
        stream_fold_state,
    )

    d = courier_domain(spark, sf_dir)
    fct = d["fct_deliveries"]
    dims = (d["dm_couriers"], d["dm_orders"], d["dm_timestamps"])

    tmp = tempfile.mkdtemp(prefix="stream_mart_")
    src = f"{tmp}/fct"
    fct.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(fct.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lake = Lakehouse(f"{tmp}/lake")
    state_schema = ledger_state(fct, *dims).schema
    q = stream_fold_state(
        stream,
        lake,
        "cdm",
        "ledger_state",
        state_fn=lambda b: ledger_state(b, *dims),
        merge_fn=lambda existing, s: merge_ledger_states(existing, s),
        checkpoint=f"{tmp}/ckpt",
        query_name="drv_stream_mart",
    )
    q.awaitTermination()
    return finalize_ledger_state(lake.read(spark, "cdm", "ledger_state", state_schema))
