"""Audit & governance: contrastive triplets, pagerank, k-anonymity, winsorization, weighted sampling, span profiles, dataset cards, split assignment/leakage, quantile normalization.

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
from airflow_courier_payout_ledger_pipeline_spark.queries_ext_text import NORM


# Mirrors operators/similarity.contrastive_triplets exactly: sign-bucket LSH,
# per-bucket (min, second-min) positives, fixed-128 md5-ordered negative pool,
# 16-bit md5 draw mod |pool| (the weighted_sample integer-hash discipline).
CONTRASTIVE_ORACLE = """
WITH b AS (
    SELECT vec_id,
           (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
            + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
            + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
            + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
    FROM embeddings
),
m1 AS (SELECT bucket, min(vec_id) AS m1 FROM b GROUP BY 1),
m2 AS (
    SELECT b.bucket, min(b.vec_id) AS m2
    FROM b JOIN m1 USING (bucket) WHERE b.vec_id != m1.m1 GROUP BY 1
),
pool AS (
    SELECT vec_id AS negative_id, bucket AS neg_bucket,
           row_number() OVER (ORDER BY md5('pool:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS idx
    FROM b
    ORDER BY md5('pool:' || CAST(vec_id AS VARCHAR)), vec_id
    LIMIT 128
),
ps AS (SELECT count(*) AS m FROM pool),
tri AS (
    SELECT b.vec_id AS anchor_id, b.bucket,
           CASE WHEN b.vec_id = m1.m1 THEN m2.m2 ELSE m1.m1 END AS positive_id,
           ('0x' || substr(md5('neg:' || CAST(b.vec_id AS VARCHAR)), 1, 4))::BIGINT % ps.m AS draw
    FROM b JOIN m1 USING (bucket) LEFT JOIN m2 USING (bucket) CROSS JOIN ps
)
SELECT anchor_id, positive_id, negative_id,
       (pool.neg_bucket != tri.bucket) AS neg_is_clean
FROM tri JOIN pool ON tri.draw = pool.idx
WHERE positive_id IS NOT NULL
"""


@register("contrastive_triplets", CONTRASTIVE_ORACLE)
def q_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, negative) triplet mining for contrastive embedding
    training: positives from the anchor's hyperplane-LSH bucket via per-bucket
    (min, second-min) tables — O(n) + 2^bits state, NO self-join — and
    negatives drawn deterministically (16-bit md5 mod |pool|) from a fixed
    128-id pool, `neg_is_clean` marking out-of-bucket draws
    (operators/similarity.contrastive_triplets)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        contrastive_triplets,
    )

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return contrastive_triplets(emb)


PAGERANK_ORACLE = """
WITH o AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
),
e0 AS (SELECT prev_type AS src, event_type AS dst, count(*)::DOUBLE AS w
       FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2),
ow AS (SELECT src, SUM(w) AS out_w FROM e0 GROUP BY 1),
e AS (SELECT e0.src, e0.dst, e0.w, ow.out_w FROM e0 JOIN ow USING (src)),
nodes AS (SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
c1 AS (SELECT e.dst AS node, list_sum(list(r.rank * e.w / e.out_w ORDER BY e.src)) AS s
       FROM e JOIN r0 r ON r.node = e.src GROUP BY 1),
r1 AS (SELECT n.node, 0.15 / nn.n + 0.85 * coalesce(c.s, 0.0) AS rank
       FROM nodes n CROSS JOIN nn LEFT JOIN c1 c ON c.node = n.node),
c2 AS (SELECT e.dst AS node, list_sum(list(r.rank * e.w / e.out_w ORDER BY e.src)) AS s
       FROM e JOIN r1 r ON r.node = e.src GROUP BY 1),
r2 AS (SELECT n.node, 0.15 / nn.n + 0.85 * coalesce(c.s, 0.0) AS rank
       FROM nodes n CROSS JOIN nn LEFT JOIN c2 c ON c.node = n.node),
c3 AS (SELECT e.dst AS node, list_sum(list(r.rank * e.w / e.out_w ORDER BY e.src)) AS s
       FROM e JOIN r2 r ON r.node = e.src GROUP BY 1),
r3 AS (SELECT n.node, 0.15 / nn.n + 0.85 * coalesce(c.s, 0.0) AS rank
       FROM nodes n CROSS JOIN nn LEFT JOIN c3 c ON c.node = n.node)
SELECT node, round(rank, 6) AS rank FROM r3
"""


@register("event_pagerank", PAGERANK_ORACLE)
def q_event_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 iterations, d=0.85) over the event-type transition
    graph — the iterative-algorithm pattern made driver-checkable by unrolling
    the fixed iterations into one SQL statement, with every float fold pinned
    to source-id order in both engines (a bare SUM's addition order varies
    with partitioning and compounds across iterations). Edge building is the
    corpus-sized work (per-user lag + one grouped count); the rank loop
    touches only the |types|² transition matrix
    (operators/graph.pagerank)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.graph import pagerank
    from pyspark.sql.window import Window

    events = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        events.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count("*").alias("weight"))
    )
    return pagerank(edges, iters=3, damping=0.85)


K_ANON = 5

K_ANONYMITY_ORACLE = f"""
SELECT c_nationkey AS nation_key, c_mktsegment AS segment,
       count(*) AS group_size,
       count(*) >= {K_ANON} AS meets_k
FROM customer GROUP BY 1, 2
"""


@register("k_anonymity_audit", K_ANONYMITY_ORACLE)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy governance: k-anonymity audit over the quasi-identifier tuple
    (nation, market segment) — groups smaller than k are re-identification
    risks a release/training-data policy must suppress or generalize. One
    grouped count; the output is |QI-combinations| rows regardless of SF, and
    the same grouping feeds the suppression step (filter meets_k) at no extra
    shuffle."""
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    return cust.groupBy(
        F.col("c_nationkey").alias("nation_key"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(
        F.count("*").alias("group_size"),
        (F.count("*") >= K_ANON).alias("meets_k"),
    )


# Winsorization thresholds as integer RANKS (ceil(n/20), ceil(19n/20)) over the
# per-type cents histogram — no float percentile math anywhere, so both engines
# pick identical thresholds by construction.
WINSORIZE_ORACLE = """
WITH c AS (
    SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events
),
h AS (SELECT event_type, cents, count(*) AS cnt FROM c GROUP BY 1, 2),
cum AS (
    SELECT event_type, cents, cnt,
           SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS cm,
           SUM(cnt) OVER (PARTITION BY event_type) AS n
    FROM h
),
thr AS (
    SELECT event_type,
           min(CASE WHEN cm >= (n + 19) // 20 THEN cents END) AS lo,
           min(CASE WHEN cm >= (19 * n + 19) // 20 THEN cents END) AS hi
    FROM cum GROUP BY 1
)
SELECT c.event_type,
       count(*) AS n_values,
       (t.lo::DOUBLE / 100) AS p05,
       (t.hi::DOUBLE / 100) AS p95,
       SUM(CASE WHEN c.cents < t.lo THEN 1 WHEN c.cents > t.hi THEN 1 ELSE 0 END)::BIGINT
           AS n_clipped,
       (SUM(least(greatest(c.cents, t.lo), t.hi))::DOUBLE / 100) AS winsorized_sum
FROM c JOIN thr t USING (event_type)
GROUP BY 1, 3, 4
"""


@register("value_winsorize", WINSORIZE_ORACLE)
def q_value_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact winsorization (outlier clipping at p05/p95) with engine-portable
    thresholds: per-type integer-cents histogram → cumulative counts →
    thresholds picked by integer RANK (ceil(n/20), ceil(19n/20)) — no float
    percentile interpolation, so any engine picks the same cents. The
    histogram window is per-type over |distinct cents| rows; the thresholds
    table (|types| rows) broadcasts back into a map-side clip. The standard
    pre-normalization step before value statistics feed a training mix."""
    from pyspark.sql.window import Window

    events = load_tables(spark, sf_dir, "events")["events"]
    c = events.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("bigint").alias("cents")
    )
    h = c.groupBy("event_type", "cents").agg(F.count("*").alias("cnt"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = h.select(
        "event_type",
        "cents",
        F.sum("cnt").over(wcum).alias("cm"),
        F.sum("cnt").over(wall).alias("n"),
    )
    thr = cum.groupBy("event_type").agg(
        F.min(F.when(F.col("cm") >= F.expr("(n + 19) div 20"), F.col("cents"))).alias("lo"),
        F.min(F.when(F.col("cm") >= F.expr("(19 * n + 19) div 20"), F.col("cents"))).alias("hi"),
    )
    clipped = c.join(F.broadcast(thr), "event_type").select(
        "event_type",
        "lo",
        "hi",
        F.when(F.col("cents") < F.col("lo"), 1)
        .when(F.col("cents") > F.col("hi"), 1)
        .otherwise(0)
        .alias("was_clipped"),
        F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi")).alias("w"),
    )
    return clipped.groupBy("event_type").agg(
        F.count("*").alias("n_values"),
        (F.first("lo").cast("double") / 100).alias("p05"),
        (F.first("hi").cast("double") / 100).alias("p95"),
        F.sum("was_clipped").cast("bigint").alias("n_clipped"),
        (F.sum("w").cast("double") / 100).alias("winsorized_sum"),
    )


W_CAP = 2000  # weight cap: chars beyond this add no selection mass

WEIGHTED_SAMPLE_ORACLE = f"""
WITH w AS (
    SELECT doc_id, source, n_chars, least(n_chars, {W_CAP})::BIGINT AS wt
    FROM documents
),
k AS (
    SELECT source, n_chars,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                     * {W_CAP} < 65536 * wt
                THEN 1 ELSE 0 END AS keep
    FROM w
)
SELECT source, count(*) AS n_docs, SUM(keep)::BIGINT AS n_kept,
       SUM(CASE WHEN keep = 1 THEN n_chars ELSE 0 END)::BIGINT AS kept_chars
FROM k GROUP BY 1
"""


@register("weighted_sample", WEIGHTED_SAMPLE_ORACLE)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional (importance) sampling: each document kept with
    probability weight/cap, weight = min(n_chars, cap) — the up-weight-long-
    documents policy of token-aware corpus subsampling. The Bernoulli draw is
    PURE INTEGER arithmetic (draw16 · cap < 65536 · weight): no float rate
    anywhere, so the kept set is bit-identical on any engine, partitioning,
    or cluster size, and the filter is a zero-shuffle map-side predicate fused
    into the scan (cf. stratified_sample's fixed-rate variant)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    draw = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    wt = F.least(F.col("n_chars"), F.lit(W_CAP)).cast("long")
    k = docs.select(
        "source",
        "n_chars",
        F.when(draw * W_CAP < 65536 * wt, 1).otherwise(0).alias("keep"),
    )
    return k.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("keep").cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("keep") == 1, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("kept_chars"),
    )


# =====================================================================================
# Round-4 additions II: span-level dup profiling, split leakage, quantile norm
# =====================================================================================

# Cross-document duplicated-span coverage (the exact-substring dedup signal of
# "Deduplicating Training Data Makes Language Models Better", Lee et al. 2022:
# a position is duplicated when its n-gram also occurs in another document).
SPAN_N = 5

SPAN_PROFILE_ORACLE = f"""
WITH norm AS (SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents),
pos AS (SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws) - {SPAN_N - 1}, 1))) AS i FROM norm),
g AS (SELECT doc_id AS id,
             concat_ws(' ', {", ".join(f"ws[i+{j}]" for j in range(SPAN_N))}) AS ngram
      FROM pos),
shared AS (
    SELECT ngram FROM (SELECT DISTINCT id, ngram FROM g)
    GROUP BY ngram HAVING count(*) >= 2
),
sizes AS (SELECT id, count(*) AS n_grams FROM g GROUP BY id),
dup AS (SELECT g.id, count(*) AS n_dup FROM g JOIN shared USING (ngram) GROUP BY g.id)
SELECT s.id AS doc_id,
       s.n_grams,
       coalesce(d.n_dup, 0)::BIGINT AS n_dup_grams,
       coalesce(d.n_dup, 0)::DOUBLE / s.n_grams::DOUBLE AS dup_frac
FROM sizes s LEFT JOIN dup d ON s.id = d.id
"""


@register("dedup_span_profile", SPAN_PROFILE_ORACLE)
def q_dedup_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: the fraction of word-5-gram
    positions whose gram also appears in >= 2 distinct documents — the
    exact-substring dedup signal (Lee et al. 2022) that pairwise Jaccard
    queries can't see (a doc can be 30%% boilerplate yet near-dup to nothing).

    Scale shape: ONE explode pass and three keyed shuffles. The positional
    grams roll up to (ngram, doc, occurrences) first — the only corpus-sized
    shuffle, keyed on near-unique (ngram, doc). Doc-frequency is then a count
    window over ngram on that rolled-up grain (one row per containing doc,
    never per position), and the per-doc fold computes total and duplicated
    positions in a single aggregation — no self-join, no re-reading the
    corpus, no branch recomputing the explode. A hot boilerplate gram costs
    one linear count over its containing-doc rows."""
    from pyspark.sql.window import Window

    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        word_ngrams,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    grams = word_ngrams(docs, "doc_id", "text", n=SPAN_N, distinct=False)
    per_doc_gram = grams.groupBy("ngram", "id").agg(F.count("*").alias("__c"))
    with_df = per_doc_gram.withColumn(
        "__df", F.count("*").over(Window.partitionBy("ngram"))
    )
    return (
        with_df.groupBy("id")
        .agg(
            F.sum("__c").alias("n_grams"),
            F.sum(F.when(F.col("__df") >= 2, F.col("__c")).otherwise(0))
            .cast("bigint")
            .alias("n_dup_grams"),
        )
        .select(
            F.col("id").alias("doc_id"),
            "n_grams",
            "n_dup_grams",
            (
                F.col("n_dup_grams").cast("double") / F.col("n_grams").cast("double")
            ).alias("dup_frac"),
        )
    )


# Train/test assignment is a pure function of doc_id (salted md5 draw), so the
# leakage audit needs NO join against a split table — the partition label is
# recomputed inline on both pair sides. ~80% train: first hex byte < 0xcc.
SPLIT_TRAIN_HEX = "cc"

def _split_part_sql(idcol: str) -> str:
    return (
        f"CASE WHEN substr(md5('split:' || CAST({idcol} AS VARCHAR)), 1, 2)"
        f" < '{SPLIT_TRAIN_HEX}' THEN 'train' ELSE 'test' END"
    )


# Every metric is an exact BIGINT (counts, sums, basis points via integer
# floor-div) so the card hashes identically in both engines — no float rates.
DATASET_CARD_ORACLE = f"""
WITH f AS (SELECT doc_id, source, n_chars, md5({NORM}) AS fp FROM documents),
s AS (
    SELECT count(*)::BIGINT AS n_docs,
           SUM(n_chars)::BIGINT AS total_chars,
           count(DISTINCT source)::BIGINT AS n_sources,
           count(DISTINCT fp)::BIGINT AS n_unique
    FROM f
)
SELECT 'n_docs' AS metric, n_docs AS value FROM s
UNION ALL SELECT 'total_chars', total_chars FROM s
UNION ALL SELECT 'n_sources', n_sources FROM s
UNION ALL SELECT 'n_unique_docs', n_unique FROM s
UNION ALL SELECT 'n_exact_dup_docs', n_docs - n_unique FROM s
UNION ALL SELECT 'dup_rate_bp',
    CASE WHEN n_docs = 0 THEN 0 ELSE ((n_docs - n_unique) * 10000) // n_docs END
FROM s
"""


@register("dataset_card", DATASET_CARD_ORACLE)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary: the headline numbers a corpus release ships
    (docs, chars, sources, unique-content count, exact-dup count and rate) as
    one scan + one single-row aggregate, pivoted to (metric, value) rows.
    All metrics are exact BIGINTs — the dup rate is basis points via integer
    floor-div — so the card is engine-exact and diffable run-over-run."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import fingerprint

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    s = docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct(fingerprint(F.col("text"))).cast("bigint").alias("n_unique"),
    )
    dup = F.col("n_docs") - F.col("n_unique")
    rate = F.when(F.col("n_docs") == 0, F.lit(0).cast("bigint")).otherwise(
        F.expr("(n_docs - n_unique) * 10000 DIV n_docs")
    )
    return s.select(
        F.explode(
            F.create_map(
                F.lit("n_docs"), F.col("n_docs"),
                F.lit("total_chars"), F.col("total_chars"),
                F.lit("n_sources"), F.col("n_sources"),
                F.lit("n_unique_docs"), F.col("n_unique"),
                F.lit("n_exact_dup_docs"), dup,
                F.lit("dup_rate_bp"), rate,
            )
        ).alias("metric", "value")
    )


# Integer split thresholds over a 16-bit md5 draw: floor(0.8·65536) and
# floor(0.9·65536) — exact in both engines (the weighted_sample discipline).
GSPLIT_TRAIN_MAX = 52428
GSPLIT_VAL_MAX = 58982

# The draw is keyed on the CONTENT FINGERPRINT, not the doc id: every document
# with identical normalized text lands in the same split by construction —
# the leakage class split_leakage_audit measures cannot occur for exact dups.
GROUPED_SPLIT_ORACLE = f"""
WITH f AS (
    SELECT doc_id,
           ('0x' || substr(md5('gsplit:' || md5({NORM})), 1, 4))::BIGINT AS h
    FROM documents
)
SELECT doc_id,
       CASE WHEN h < {GSPLIT_TRAIN_MAX} THEN 'train'
            WHEN h < {GSPLIT_VAL_MAX} THEN 'val'
            ELSE 'test' END AS split
FROM f
"""


@register("grouped_split_assign", GROUPED_SPLIT_ORACLE)
def q_grouped_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/10/10 train/val/test assignment: the split draw hashes
    the content FINGERPRINT (md5 of normalized text), so exact duplicates —
    however many ids they hide behind — always share a split; hashing the doc
    id instead is exactly the leakage `split_leakage_audit` quantifies.
    Zero-shuffle map-side projection; thresholds are exact 16-bit integers."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import fingerprint

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("gsplit:"), fingerprint(F.col("text")))), 1, 4),
        16,
        10,
    ).cast("long")
    return docs.select(
        "doc_id",
        F.when(h < GSPLIT_TRAIN_MAX, F.lit("train"))
        .when(h < GSPLIT_VAL_MAX, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


SPLIT_LEAKAGE_ORACLE = f"""
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
    SELECT p.id_a, p.id_b, ({_AGREE_SQL}) / {NUM_HASHES}.0 AS est_jaccard,
           {_split_part_sql('p.id_a')} AS part_a,
           {_split_part_sql('p.id_b')} AS part_b
    FROM pairs p JOIN sig sa ON p.id_a = sa.id JOIN sig sb ON p.id_b = sb.id
)
SELECT CASE WHEN part_a = 'train' THEN id_a ELSE id_b END AS train_doc_id,
       CASE WHEN part_a = 'train' THEN id_b ELSE id_a END AS test_doc_id,
       est_jaccard
FROM est
WHERE part_a <> part_b
"""


@register("split_leakage_audit", SPLIT_LEAKAGE_ORACLE)
def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: near-dup candidate pairs (MinHash+LSH,
    same banding and skew cap as dedup_minhash_lsh) that STRADDLE a
    deterministic 80/20 split — the document pairs that would leak evaluation
    content into training. Emits (train_doc_id, test_doc_id, est_jaccard).

    Scale shape: identical to the LSH pair query (sub-quadratic, capped
    buckets) plus a zero-cost filter — the split label is a pure salted-md5
    function of doc_id recomputed inline on both pair sides, so no split
    table is joined, shuffled, or even materialized."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_inline,
    )

    def part(idcol: str):
        return F.when(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col(idcol).cast("string"))), 1, 2
            )
            < SPLIT_TRAIN_HEX,
            "train",
        ).otherwise("test")

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    sig = minhash_signatures_inline(docs, "doc_id", "text", k=9, num_hashes=NUM_HASHES)
    pairs = lsh_candidate_pairs(sig, BANDS, ROWS_PER_BAND, max_bucket=LSH_MAX_BUCKET)
    labeled = pairs.select(
        "id_a", "id_b", "est_jaccard", part("id_a").alias("pa"), part("id_b").alias("pb")
    ).filter(F.col("pa") != F.col("pb"))
    return labeled.select(
        F.when(F.col("pa") == "train", F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("train_doc_id"),
        F.when(F.col("pa") == "train", F.col("id_b"))
        .otherwise(F.col("id_a"))
        .alias("test_doc_id"),
        "est_jaccard",
    )


# NULL-signal rows are excluded EXPLICITLY: a NULL n_chars has no rank (and
# Spark/DuckDB disagree on default NULL ordering inside a window), and a NULL
# source is not a calibratable domain. The filter makes that a stated
# contract in both engines instead of an accidental inner-join drop.
QUANTILE_NORM_ORACLE = """
SELECT doc_id, source, n_chars,
       percent_rank() OVER (PARTITION BY source ORDER BY n_chars) AS pct_rank
FROM documents
WHERE source IS NOT NULL AND n_chars IS NOT NULL
"""


@register("score_quantile_norm", QUANTILE_NORM_ORACLE)
def q_score_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile normalization of a quality signal (n_chars):
    percent_rank = (rank - 1) / (n - 1) with RANK tie semantics — the
    calibration step that makes per-domain quality thresholds comparable
    before mixing sources.

    The oracle states the semantics as the naive corpus-wide window; the Spark
    plan computes the IDENTICAL values from the per-source value histogram
    (cf. length_decile_bands): rank - 1 = cumulative count of strictly-smaller
    values, so the window sort runs over distinct (source, n_chars) rows —
    histogram-sized, never corpus-sized — and the corpus is touched only by a
    map-side broadcast join attaching the precomputed rank. At 100 TB the
    naive form is a per-source global sort; this form is one grouped count
    plus a window over thousands of rows."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    docs = docs.filter(F.col("source").isNotNull() & F.col("n_chars").isNotNull())
    hist = docs.groupBy("source", "n_chars").agg(F.count("*").alias("__c"))
    w = Window.partitionBy("source").orderBy("n_chars")
    ranked = hist.select(
        "source",
        "n_chars",
        F.coalesce(
            F.sum("__c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__below"),
        F.sum("__c").over(Window.partitionBy("source")).alias("__tot"),
    )
    pct = (
        F.when(F.col("__tot") > 1,
               F.col("__below").cast("double") / (F.col("__tot") - 1).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("pct_rank")
    )
    return docs.join(
        F.broadcast(ranked), ["source", "n_chars"]
    ).select("doc_id", "source", "n_chars", pct)
