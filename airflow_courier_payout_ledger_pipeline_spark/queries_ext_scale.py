"""Scale techniques: salted skew joins, keep-best dedup, decile bands, partition manifests, rolling distinct, MinHash calibration, decontamination.

Split out of the former monolithic queries_ext.py (round 10) so the
changed-file -> re-adjudicate rule schedules only this domain's queries.
Registration side effects: importing this module registers its queries.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import load_tables
from airflow_courier_payout_ledger_pipeline_spark.registry import register
from airflow_courier_payout_ledger_pipeline_spark.queries_ext_dedup import BANDS, LSH_MAX_BUCKET, NUM_HASHES, ROWS_PER_BAND, _AGREE_SQL, _BANDS_SQL, _SHINGLES_CTE
from airflow_courier_payout_ledger_pipeline_spark.queries_ext_text import CONTAMINATION_N, NORM, _C8


# =====================================================================================
# Round-4 additions: skew-safe joins proven equivalent, curation argmax dedup,
# histogram-based banding, manifest statistics, rolling distinct, LSH calibration,
# benchmark decontamination. Registered inside the driver adjudication window
# (registry.ADJUDICATION_WINDOW_FIRST) so each gets driver evidence this round.
# =====================================================================================

SALTED_JOIN_ORACLE = """
SELECT s.s_nationkey AS nation_key,
       count(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS DECIMAL(14,2))::DOUBLE
           AS total_price
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1
"""


@register("salted_join_agg", SALTED_JOIN_ORACLE)
def q_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join proven result-identical to the plain join: the fact side
    carries a deterministic 8-way salt (xxhash64 of the row's order key — task
    retries resalt identically), the dim side is exploded once per salt, and the
    grouped rollup hash-matches the unsalted SQL oracle. This is the explicit
    mitigation for a single pathological key (one courier = 10% of the facts)
    that AQE's partition splitting cannot fix, packaged as a driver-checked
    query rather than only a unit test (operators/skew.salted_join)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    big = t["lineitem"].select(
        F.col("l_suppkey").alias("suppkey"), "l_orderkey",
        F.col("l_extendedprice").cast("decimal(14,2)").alias("price"),
    )
    small = t["supplier"].select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    joined = salted_join(big, small, "suppkey", "l_orderkey", num_salts=8)
    return joined.groupBy(F.col("s_nationkey").alias("nation_key")).agg(
        F.count("*").alias("n_items"),
        F.sum("price").cast("decimal(14,2)").alias("total_price"),
    )


KEEP_BEST_ORACLE = f"""
WITH fp AS (
    SELECT doc_id, n_chars, source, md5({NORM}) AS fp FROM documents
),
best AS (
    SELECT fp, doc_id AS best_id, n_chars AS best_n_chars,
           row_number() OVER (PARTITION BY fp ORDER BY n_chars DESC, doc_id) AS rn
    FROM fp
),
counts AS (SELECT fp, count(*) AS dup_count FROM fp GROUP BY 1)
SELECT b.fp, b.best_id, b.best_n_chars, c.dup_count
FROM best b JOIN counts c USING (fp) WHERE b.rn = 1
"""


@register("dedup_keep_best", KEEP_BEST_ORACLE)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-grade exact dedup: within each identical-content group keep the
    highest-quality copy (longest raw text, ties to the lowest doc_id) instead
    of the arbitrary min-id representative — the policy real corpus curation
    wants when duplicates differ in truncation. One shuffle on the fingerprint;
    the rank window and the group count share that partitioning."""
    from pyspark.sql.window import Window

    from airflow_courier_payout_ledger_pipeline_spark.functions.text import fingerprint

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    fp = docs.select(
        "doc_id", "n_chars", fingerprint(F.col("text")).alias("fp")
    )
    w = Window.partitionBy("fp").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    wc = Window.partitionBy("fp")
    return (
        fp.withColumn("rn", F.row_number().over(w))
        .withColumn("dup_count", F.count("*").over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "fp",
            F.col("doc_id").alias("best_id"),
            F.col("n_chars").alias("best_n_chars"),
            "dup_count",
        )
    )


LENGTH_BANDS_ORACLE = """
WITH h AS (SELECT n_chars, count(*) AS c FROM documents GROUP BY 1),
cum AS (
    SELECT n_chars, c,
           coalesce(SUM(c) OVER (ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
           SUM(c) OVER () AS total
    FROM h
),
banded AS (
    SELECT n_chars, c, least(9, (below * 10) // total)::INT AS band FROM cum
)
SELECT band, SUM(c)::BIGINT AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM banded GROUP BY 1
"""


@register("length_decile_bands", LENGTH_BANDS_ORACLE)
def q_length_decile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile banding by document length WITHOUT a global row sort: build the
    length histogram (one shuffle, |distinct lengths| rows), assign each length
    a band from its cumulative count with integer arithmetic (engine-portable —
    no percentile interpolation), and roll up. The window runs over the tiny
    histogram, never the corpus — the 100 TB-safe way to get quantile bands;
    equal lengths always share a band (no tie-order dependence)."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    h = docs.groupBy("n_chars").agg(F.count("*").alias("c"))
    # histogram-sized window: |distinct lengths| rows, bounded regardless of SF
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    total = h.agg(F.sum("c").alias("total"))
    banded = (
        h.withColumn("below", F.coalesce(F.sum("c").over(w), F.lit(0)))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "band", F.least(F.lit(9), F.expr("(below * 10) div total")).cast("int")
        )
    )
    return banded.groupBy("band").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


MANIFEST_ORACLE = """
SELECT CAST(ts AS DATE) AS day,
       count(*) AS n_rows,
       min(event_id) AS min_event_id, max(event_id) AS max_event_id,
       min(ts) AS min_ts, max(ts) AS max_ts,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


@register("partition_stats_manifest", MANIFEST_ORACLE)
def q_partition_stats_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg/Delta-style partition manifest: per day-partition row counts and
    per-column min/max bounds (+ distinct users), the statistics table that
    lets a planner prune files without opening them. One grouped agg; at scale
    this runs per-ingest over the new partition only and appends to the
    manifest (cf. sources/lakehouse.py partitioned writes)."""
    events = load_tables(spark, sf_dir, "events")["events"]
    return events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n_rows"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.countDistinct("user_id").alias("n_users"),
    )


ROLLING_DISTINCT_ORACLE = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM du)
SELECT d0.day, count(DISTINCT du.user_id) AS users_7d
FROM days d0
JOIN du ON du.day BETWEEN d0.day - 6 AND d0.day
GROUP BY 1
"""


@register("rolling_distinct_users_7d", ROLLING_DISTINCT_ORACLE)
def q_rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the metric a RANGE window
    cannot express (COUNT(DISTINCT) isn't window-able): dedup to (day, user)
    grain first (the only corpus-sized shuffle), then broadcast the tiny
    day-spine against it with a range predicate (≤ 7× fan-out of the deduped
    grain, not of the raw events) and count distinct per anchor day."""
    events = load_tables(spark, sf_dir, "events")["events"]
    du = events.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select(F.col("day").alias("d0")).distinct()
    joined = du.join(
        F.broadcast(days),
        (F.col("day") >= F.date_sub(F.col("d0"), 6)) & (F.col("day") <= F.col("d0")),
    )
    return joined.groupBy(F.col("d0").alias("day")).agg(
        F.countDistinct("user_id").alias("users_7d")
    )


LSH_CALIBRATION_ORACLE = f"""
WITH {_SHINGLES_CTE},
bands AS ({_BANDS_SQL}),
ok AS (
    SELECT band, band_hash FROM bands
    GROUP BY band, band_hash HAVING count(*) <= {LSH_MAX_BUCKET}
),
capped AS (SELECT b.* FROM bands b JOIN ok USING (band, band_hash)),
pairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id
),
est AS (
    SELECT p.id_a, p.id_b, ({_AGREE_SQL}) / {NUM_HASHES}.0 AS est_jaccard
    FROM pairs p JOIN sig sa ON p.id_a = sa.id JOIN sig sb ON p.id_b = sb.id
),
wnorm AS (SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents),
wpos AS (SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i FROM wnorm),
g AS (SELECT DISTINCT doc_id AS id, concat_ws(' ', ws[i], ws[i+1], ws[i+2]) AS ngram FROM wpos),
sizes AS (SELECT id, count(*) AS n FROM g GROUP BY id),
inter AS (
    SELECT e.id_a, e.id_b, count(*) AS ci
    FROM est e
    JOIN g a ON a.id = e.id_a
    JOIN g b ON b.id = e.id_b AND b.ngram = a.ngram
    GROUP BY 1, 2
),
exact AS (
    SELECT id_a, id_b, ci::DOUBLE / (sa.n + sb.n - ci)::DOUBLE AS jaccard
    FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
)
SELECT e.id_a, e.id_b, e.est_jaccard,
       coalesce(x.jaccard, 0.0) AS exact_jaccard,
       round(abs(e.est_jaccard - coalesce(x.jaccard, 0.0)), 4) AS abs_err
FROM est e LEFT JOIN exact x ON e.id_a = x.id_a AND e.id_b = x.id_b
"""


@register("minhash_calibration", LSH_CALIBRATION_ORACLE)
def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-stack calibration: for every LSH candidate pair, the signature-
    agreement Jaccard ESTIMATE next to the exact trigram Jaccard and their
    absolute error — the measurement that justifies (bands, rows) and the
    dedup threshold before a 100 TB run. Cost is bounded by the capped
    candidate set; the n² space is never touched (candidates with zero shared
    trigrams keep exact=0 via the left join)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_inline,
        verify_pairs_ngram_jaccard,
        word_ngrams,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    sig = minhash_signatures_inline(docs, "doc_id", "text", k=9, num_hashes=NUM_HASHES)
    # materialize the candidate set once: it feeds BOTH the join's left side
    # and the exact-verify subquery, whose column-pruned copy defeats
    # ReusedExchange — without the barrier the whole shingle+minhash+bucket
    # pipeline (the expensive part) would execute twice
    cand = lsh_candidate_pairs(
        sig, BANDS, ROWS_PER_BAND, max_bucket=LSH_MAX_BUCKET
    ).localCheckpoint(eager=False)
    grams = word_ngrams(docs, "doc_id", "text", n=3)
    exact = verify_pairs_ngram_jaccard(cand.select("id_a", "id_b"), grams, 0.0)
    return (
        cand.join(exact, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            F.coalesce(F.col("jaccard"), F.lit(0.0)).alias("exact_jaccard"),
            F.round(
                F.abs(F.col("est_jaccard") - F.coalesce(F.col("jaccard"), F.lit(0.0))), 4
            ).alias("abs_err"),
        )
    )


DECONTAMINATED_ORACLE = f"""
WITH norm AS (SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents),
pos AS (
    SELECT doc_id, ws,
           unnest(generate_series(1, greatest(len(ws) - {CONTAMINATION_N - 1}, 1))) AS i
    FROM norm
),
g AS (SELECT DISTINCT doc_id AS id, concat_ws(' ', {_C8}) AS ngram FROM pos),
b AS (SELECT DISTINCT ngram FROM g WHERE id % 20 = 0),
dirty AS (SELECT DISTINCT c.id FROM g c JOIN b USING (ngram) WHERE c.id % 20 != 0)
SELECT d.source, count(*) AS n_docs, SUM(d.n_chars)::BIGINT AS total_chars
FROM documents d
WHERE d.doc_id % 20 != 0 AND d.doc_id NOT IN (SELECT id FROM dirty)
GROUP BY 1
"""


@register("decontaminated_corpus", DECONTAMINATED_ORACLE)
def q_decontaminated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination ACTION (ngram_contamination is the screen): drop
    every corpus document sharing any word 8-gram with the benchmark suite and
    report what survives per source. The benchmark gram set is broadcast; the
    corpus is filtered with one semi-join probe + one anti-join — no shuffle of
    corpus text, and the output is the per-source budget a training-mix planner
    consumes."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import word_ngrams

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    grams = word_ngrams(docs, "doc_id", "text", n=CONTAMINATION_N)
    bench_grams = grams.filter(F.col("id") % 20 == 0).select("ngram").distinct()
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    dirty = (
        grams.filter(F.col("id") % 20 != 0)
        .join(F.broadcast(bench_grams), "ngram", "left_semi")
        .select(F.col("id").alias("doc_id"))
        .distinct()
    )
    clean = corpus.join(dirty, "doc_id", "left_anti")
    return clean.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
