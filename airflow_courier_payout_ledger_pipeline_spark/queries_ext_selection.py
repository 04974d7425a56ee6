"""Data selection: DSIR importance scoring & resampling, duplicated-span scrubbing.

Split out of the former monolithic queries_ext.py (round 10) so the
changed-file -> re-adjudicate rule schedules only this domain's queries.
Registration side effects: importing this module registers its queries.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import load_tables
from airflow_courier_payout_ledger_pipeline_spark.registry import register
from airflow_courier_payout_ledger_pipeline_spark.queries_ext_audit import SPAN_N
from airflow_courier_payout_ledger_pipeline_spark.queries_ext_text import NORM


# --- DSIR importance scoring (hashed n-gram data selection) --------------------------

# DuckDB twin of operators/sampling.dsir_importance_scores: same normalize →
# unigram+bigram explode → md5-bucket → add-1-smoothed target/raw ratio → doc
# mean. The per-gram ratio is exact cross-engine: Spark computes it driver-side
# with Python's exact int/int division; here both BIGINT products are exact in
# DOUBLE (< 2^53 far beyond bench scale), so the single division is the same
# correctly-rounded quotient. The floor-quantization to 2^-20 multiples
# (replayed below) makes the per-doc SUM order-free exact — see the operator
# docstring — so avg's aggregation order can never flip round(·,4).
DSIR_ORACLE = f"""
WITH w AS (
    SELECT doc_id, (lang = 'en') AS t, string_split({NORM}, ' ') AS ws
    FROM documents
),
w2 AS (SELECT * FROM w WHERE len(ws) > 1 OR ws[1] != ''),
uni AS (SELECT doc_id, t, unnest(ws) AS gram FROM w2),
bi AS (
    SELECT doc_id, t, ws[i] || ' ' || ws[i + 1] AS gram
    FROM w2, unnest(generate_series(1, len(ws) - 1)) AS g(i)
),
g AS (
    SELECT * FROM uni WHERE gram != ''
    UNION ALL
    SELECT * FROM bi WHERE gram != ''
),
gb AS (
    SELECT doc_id, t,
           (('0x' || substr(md5(gram), 1, 8))::BIGINT % 1024)::INT AS bucket
    FROM g
),
cnt AS (
    SELECT bucket, count(*)::BIGINT AS raw_n,
           count(*) FILTER (WHERE t)::BIGINT AS tgt_n
    FROM gb GROUP BY 1
),
tot AS (SELECT SUM(raw_n)::BIGINT AS big_r, SUM(tgt_n)::BIGINT AS big_t FROM cnt),
r AS (
    SELECT gb.doc_id,
           floor(CAST((c.tgt_n + 1) * (tot.big_r + 1024) AS DOUBLE)
                 / CAST((c.raw_n + 1) * (tot.big_t + 1024) AS DOUBLE)
                 * 1048576) / 1048576 AS ratio
    FROM gb JOIN cnt c USING (bucket) CROSS JOIN tot
)
SELECT doc_id, count(*)::BIGINT AS n_grams, round(avg(ratio), 4) AS dsir_score
FROM r GROUP BY 1
"""


@register("dsir_importance", DSIR_ORACLE)
def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance score per document against an English-target mix
    (operators/sampling.dsir_importance_scores): hashed unigram+bigram models
    of the target subset vs the raw corpus, add-1 smoothed, probability-domain
    mean ratio (ln-free — the bigram_lm_score discipline). The top of this
    ranking is what a curated-target resample of a raw crawl keeps; the
    deterministic keep-draw is `weighted_sample`'s integer-hash machinery.

    Plan: the O(1024)-row (bucket, raw_n, tgt_n) state is its own action
    (collected like the CMS state, one map-side-partial exchange); the
    RETURNED scoring plan re-enters the ratios as one literal-array lookup —
    no join, no vocabulary anywhere — and pays a single doc-grain exchange."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.sampling import (
        dsir_importance_scores,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return dsir_importance_scores(docs, F.col("lang") == "en")


# DSIR step 2 — the RESAMPLE: keep each document with probability
# min(1, score/2) using the repo's deterministic integer-hash Bernoulli
# (weighted_sample's machinery): draw16(doc_id)·CAP < 65536·min(w, CAP) with
# w = round(score·10⁴) exact in both engines (score is already 4-decimal).
# Zero extra shuffles beyond scoring: the draw and the keep test are map-side
# column expressions over the score output.
DSIR_RESAMPLE_CAP = 20_000  # score 2.0 -> kept with certainty

DSIR_RESAMPLE_ORACLE = f"""
WITH scored AS ({DSIR_ORACLE}),
k AS (
    SELECT doc_id, n_grams, dsir_score,
           CAST(round(dsir_score * 10000) AS BIGINT) AS w
    FROM scored
)
SELECT doc_id, n_grams, dsir_score
FROM k
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
      * {DSIR_RESAMPLE_CAP} < 65536 * least(w, {DSIR_RESAMPLE_CAP})
"""


@register("dsir_resample", DSIR_RESAMPLE_ORACLE)
def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end DSIR data selection: score every document against the
    English-target mix (`dsir_importance`), then KEEP each with probability
    proportional to its importance (min(1, score/2)) — the resampling step
    that actually tilts a raw crawl toward the target distribution. The keep
    decision is the deterministic integer-hash Bernoulli of
    `weighted_sample` (draw·cap < 65536·weight, no float rate, no rand()):
    re-running months later on re-partitioned data keeps byte-identical rows,
    and the filter is a map-side predicate over the scoring output — zero
    exchanges beyond the score's own doc-grain mean."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.sampling import (
        dsir_importance_scores,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    scored = dsir_importance_scores(docs, F.col("lang") == "en")
    draw = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    w = F.round(F.col("dsir_score") * 10000).cast("bigint")
    return scored.filter(
        draw * DSIR_RESAMPLE_CAP
        < 65536 * F.least(w, F.lit(DSIR_RESAMPLE_CAP))
    )


# --- Duplicated-span removal (the scrub step of Lee et al. 2022) ---------------------

# Same positional-gram topology as SPAN_PROFILE_ORACLE, then: shared-gram
# occurrences expand to covered word positions, and each doc is rebuilt from
# its uncovered words (order preserved). Sub-n docs yield one partial gram via
# NULL-skipping concat_ws in both engines.
SPAN_SCRUB_ORACLE = f"""
WITH norm AS (SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents),
pos AS (SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws) - {SPAN_N - 1}, 1))) AS s FROM norm),
g AS (SELECT doc_id, s,
             concat_ws(' ', {", ".join(f"ws[s+{j}]" for j in range(SPAN_N))}) AS ngram
      FROM pos),
shared AS (
    SELECT ngram FROM (SELECT DISTINCT doc_id, ngram FROM g)
    GROUP BY ngram HAVING count(*) >= 2
),
cov AS (
    SELECT DISTINCT doc_id, p FROM (
        SELECT g.doc_id,
               unnest(generate_series(g.s, least(g.s + {SPAN_N - 1}, len(n.ws)))) AS p
        FROM g JOIN shared USING (ngram) JOIN norm n USING (doc_id)
    )
),
kept AS (
    SELECT n.doc_id, t.i AS p, n.ws[t.i] AS w
    FROM norm n, unnest(generate_series(1, len(n.ws))) AS t(i)
    WHERE NOT EXISTS (SELECT 1 FROM cov WHERE cov.doc_id = n.doc_id AND cov.p = t.i)
),
rebuilt AS (
    SELECT doc_id, string_agg(w, ' ' ORDER BY p) AS scrubbed_text FROM kept GROUP BY 1
),
ncov AS (SELECT doc_id, count(*)::BIGINT AS n_dup FROM cov GROUP BY 1)
SELECT n.doc_id,
       len(n.ws)::BIGINT AS n_words,
       coalesce(c.n_dup, 0)::BIGINT AS n_dup_words,
       coalesce(r.scrubbed_text, '') AS scrubbed_text
FROM norm n
LEFT JOIN ncov c USING (doc_id)
LEFT JOIN rebuilt r USING (doc_id)
"""


@register("dedup_span_scrub", SPAN_SCRUB_ORACLE)
def q_dedup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span REMOVAL (Lee et al. 2022's rewrite step;
    `dedup_span_profile` is the measurement): every word position covered by a
    5-gram shared across ≥ 2 documents is cut, and the document is rebuilt
    from the surviving words. The whole corpus comes back rewritten —
    (doc_id, n_words, n_dup_words, scrubbed_text) — hash-checked against a
    DuckDB replay including the rebuilt strings
    (operators/dedup.duplicated_span_scrub)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        duplicated_span_scrub,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return duplicated_span_scrub(docs, "doc_id", "text", n=SPAN_N).select(
        F.col("id").alias("doc_id"), "n_words", "n_dup_words", "scrubbed_text"
    )
