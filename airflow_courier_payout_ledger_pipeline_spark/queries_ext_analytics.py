"""Warehouse analytics: CUBE, date spines, rolling windows, SCD2, cohorts, co-occurrence, bigram LM, interpolation, DQ reports, quantization, anomalies, IVF nprobe sweep.

Split out of the former monolithic queries_ext.py (round 10) so the
changed-file -> re-adjudicate rule schedules only this domain's queries.
Registration side effects: importing this module registers its queries.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import load_tables
from airflow_courier_payout_ledger_pipeline_spark.registry import register
from airflow_courier_payout_ledger_pipeline_spark.queries_ext_similarity import IVF_K, _IVF_ORACLE_TEMPLATE, _ivf_seed_centroids
from airflow_courier_payout_ledger_pipeline_spark.queries_ext_text import NORM


# --- CUBE / date spine / rolling range windows ---------------------------------------

CUBE_ORACLE = """
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       grouping(o_orderstatus)::INT AS g_status,
       grouping(o_orderpriority)::INT AS g_priority,
       count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DECIMAL(14,2))::DOUBLE AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
-- Spark's cube over an EMPTY relation emits no rows; ANSI (and DuckDB) emit a
-- lone grand-total row with count 0. Pin the engine's observed-rows semantics:
-- on any non-empty input every grouping-set row aggregates >= 1 row, so this
-- only removes the empty-input phantom total.
HAVING count(*) > 0
"""


@register("cube_status_priority", CUBE_ORACLE)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (status, priority): all 4 grouping combinations in ONE
    expand + single shuffle (never 4 scans unioned); grouping() flags
    disambiguate subtotal NULLs from genuine NULL group values."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("decimal(14,2)")
            .alias("total"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "g_status",
            "g_priority",
            "n",
            "total",
        )
    )


DATE_SPINE_ORACLE = """
WITH bounds AS (SELECT min(ts)::DATE AS lo, max(ts)::DATE AS hi FROM events),
days AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds
),
per AS (SELECT ts::DATE AS day, count(*) AS n FROM events GROUP BY 1)
SELECT d.day, coalesce(p.n, 0)::BIGINT AS n_events
FROM days d LEFT JOIN per p USING (day)
"""


@register("date_spine_fill", DATE_SPINE_ORACLE)
def q_date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap filling: generate the min..max day spine with
    sequence+explode (distributed from a 1-row bounds agg — no driver literals,
    no Python date loop) and left-join the per-day counts so missing days
    surface as explicit zeros — the mart shape time-series dashboards need."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    days = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    per = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("n"))
    return days.join(per, "day", "left").select(
        "day", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events")
    )


ROLLING_ORACLE = """
WITH per AS (
    SELECT user_id, ts::DATE AS day, count(*) AS n FROM events GROUP BY 1, 2
)
SELECT user_id, day, n::BIGINT AS n,
       SUM(n) OVER (
           PARTITION BY user_id ORDER BY (day - DATE '1970-01-01')
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       )::BIGINT AS n_7d
FROM per
"""


@register("rolling_7d_counts", ROLLING_ORACLE)
def q_rolling_7d_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 7-day event counts: day-grain pre-aggregation first
    (shrinks the window input from events to user-days), then a RANGE frame
    over epoch-day numbers — the interval window that skips missing days
    correctly, partitioned by user so no global sort exists."""
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, "events")["events"]
    per = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    dn = F.datediff(F.col("day"), F.lit("1970-01-01"))
    w = Window.partitionBy("user_id").orderBy(dn).rangeBetween(-6, 0)
    return per.select(
        "user_id",
        "day",
        F.col("n").cast("long").alias("n"),
        F.sum("n").over(w).cast("long").alias("n_7d"),
    )


# --- Audio features (multimodal triad: image / video / audio) ------------------------

# FAUD sample i of clip m is (m*37 + i*11) % 201 - 100 — closed-form, so the
# whole decode path (synthesize binary → mapInPandas feature extraction)
# hash-checks against SQL that re-derives every sample.
AUDIO_FEATURES_ORACLE = """
WITH meta AS (
    SELECT doc_id AS media_id, (doc_id % 400 + 100)::INT AS n FROM documents
),
s AS (SELECT media_id, n, unnest(generate_series(0, n - 1)) AS i FROM meta),
v AS (
    SELECT media_id, n, i,
           ((media_id * 37 + i * 11) % 201 - 100) AS si,
           CASE WHEN i < n - 1
                THEN ((media_id * 37 + (i + 1) * 11) % 201 - 100) END AS sj
    FROM s
),
agg AS (
    SELECT media_id, n,
           SUM(si)::DOUBLE / COUNT(*)::DOUBLE AS mean_amp,
           SUM(CASE WHEN si * sj < 0 THEN 1 ELSE 0 END)::BIGINT AS zero_crossings
    FROM v GROUP BY 1, 2
)
SELECT media_id, 8000::INT AS sample_rate, n AS n_samples,
       n::DOUBLE / 8000 AS duration_s, mean_amp, zero_crossings
FROM agg
"""


@register("audio_features", AUDIO_FEATURES_ORACLE)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio as an opaque binary column: deterministic FAUD clips (8 kHz,
    100-499 samples per doc) synthesized and decoded Arrow-batch-wise into
    duration / exact mean amplitude / zero-crossing counts — the third modality
    of the multimodal path, same mapInPandas contract as images and video
    (operators/multimodal.extract_audio_features)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        extract_audio_features,
        synthesize_audio_payloads,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(8000).cast("int").alias("sample_rate"),
        (F.col("doc_id") % 400 + 100).cast("int").alias("n_samples"),
    )
    return extract_audio_features(synthesize_audio_payloads(media))


# --- SCD2 history from a changelog ---------------------------------------------------

SCD2_ORACLE = """
WITH o AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER w AS prev,
           (lag(ts) OVER w IS NULL) AS is_first
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ch AS (
    SELECT user_id, event_type, ts, event_id FROM o
    WHERE is_first OR event_type IS DISTINCT FROM prev
)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER w2 AS valid_to,
       (lead(ts) OVER w2 IS NULL) AS is_current
FROM ch WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("scd2_history", SCD2_ORACLE)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history of each user's event_type attribute: consecutive
    duplicates collapse, each surviving change opens a validity interval closed
    by the next change (valid_from/valid_to/is_current) — the SCD2 dimension
    pattern the reference's SCD0/SCD1 design omits
    (operators/merge.scd2_from_changelog; window algebra, one shuffle, output
    rows = value changes, not events)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.merge import (
        scd2_from_changelog,
    )

    ev = load_tables(spark, sf_dir, "events")["events"]
    return scd2_from_changelog(
        ev.select("user_id", "event_type", "ts", "event_id"),
        ["user_id"],
        "event_type",
        "ts",
        tiebreaker="event_id",
    )


# --- Retention cohorts & co-occurrence lift ------------------------------------------

RETENTION_ORACLE = """
WITH f AS (SELECT user_id, min(ts::DATE) AS first_day FROM events GROUP BY 1),
cohort AS (
    SELECT user_id, ((first_day - DATE '1970-01-01') // 7)::BIGINT AS cohort_week
    FROM f
),
active AS (
    SELECT DISTINCT user_id, ((ts::DATE - DATE '1970-01-01') // 7)::BIGINT AS week
    FROM events
)
SELECT c.cohort_week, (a.week - c.cohort_week)::BIGINT AS week_offset,
       count(*) AS n_active
FROM active a JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


@register("retention_cohorts", RETENTION_ORACLE)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by first-seen week, then
    distinct active (user, week) pairs counted per (cohort, week offset) — the
    standard growth-analytics mart. Three aggregations, all key-partitioned
    (first-seen per user, distinct activity, final matrix); the user-grain
    cohort table rides the same user_id shuffle as the activity dedup."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    day = F.to_date("ts")
    week = F.floor(F.datediff(day, F.lit("1970-01-01")) / 7).cast("long")
    cohort = (
        ev.groupBy("user_id")
        .agg(F.min(day).alias("first_day"))
        .select(
            "user_id",
            F.floor(F.datediff("first_day", F.lit("1970-01-01")) / 7)
            .cast("long")
            .alias("cohort_week"),
        )
    )
    active = ev.select("user_id", week.alias("week")).distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


COOCCURRENCE_ORACLE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
tot AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
per AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
pair AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
    FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT type_a, type_b, n_both::BIGINT AS n_both,
       round((n_both::DOUBLE * n_users) / (pa.n::DOUBLE * pb.n), 4) AS lift
FROM pair
JOIN per pa ON type_a = pa.event_type
JOIN per pb ON type_b = pb.event_type
CROSS JOIN tot
"""


@register("event_type_cooccurrence", COOCCURRENCE_ORACLE)
def q_event_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift between event types: the per-user self-join runs on
    the DEDUPLICATED (user, type) table, so fan-out is bounded by (types per
    user choose 2) — never |events|²; the type-frequency and user-count sides
    are tiny broadcast aggregates. lift = P(a,b) / (P(a)·P(b)), computed with
    the identical multiply/divide order in both engines before the 4-decimal
    round."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    ut = ev.select("user_id", "event_type").distinct()
    tot = ev.agg(F.countDistinct("user_id").alias("n_users"))
    per = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pair = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    pa = per.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    pb = per.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pair.join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                (F.col("n_both").cast("double") * F.col("n_users"))
                / (F.col("n_a").cast("double") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


# --- Bigram LM quality score ---------------------------------------------------------

BIGRAM_LM_ORACLE = f"""
WITH norm AS (SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents),
pos AS (
    SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
    FROM norm WHERE len(ws) >= 2
),
bg AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM pos),
c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1),
scored AS (
    SELECT b.doc_id, c2.n2::DOUBLE / c1.n1::DOUBLE AS p
    FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
)
SELECT doc_id, count(*) AS n_bigrams, round(avg(p), 4) AS avg_cond_prob
FROM scored GROUP BY doc_id
"""


@register("bigram_lm_score", BIGRAM_LM_ORACLE)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model fluency score: each document's mean
    conditional probability P(w2|w1) under the corpus's own bigram counts — the
    probability-domain twin of perplexity (monotone in it, but free of ln(),
    whose last-ulp behavior differs across libm implementations and would break
    the cross-engine hash). Plan: the bigram explode is referenced by both
    count tables and the scoring join — each reference re-runs the map-side
    explode (cheap relative to the three key-partitioned shuffles it feeds; a
    100 TB run would persist the bigram table once instead). The (unbounded)
    vocabulary is never broadcast or collected."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import (
        normalize_text,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "doc_id", F.split(normalize_text(F.col("text")), " ").alias("ws")
    ).filter(F.size("ws") >= 2)
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1), "
                "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .select("doc_id", (F.col("n2").cast("double") / F.col("n1").cast("double")).alias("p"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("p"), 4).alias("avg_cond_prob"),
    )


# --- Time-series linear interpolation ------------------------------------------------

INTERP_ORACLE = """
WITH per AS (
    SELECT user_id, ts::DATE AS day,
           CAST(round(SUM(CAST(value AS DECIMAL(14,2))), 2) AS DECIMAL(14,2))::DOUBLE AS v
    FROM events GROUP BY 1, 2
),
bounds AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM per GROUP BY 1),
spine AS (
    SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
    FROM bounds
),
j AS (SELECT s.user_id, s.day, p.v FROM spine s LEFT JOIN per p USING (user_id, day)),
f AS (
    SELECT user_id, day, v,
           last_value(v IGNORE NULLS) OVER w AS pv,
           last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER w AS pd,
           first_value(v IGNORE NULLS) OVER w2 AS nv,
           first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER w2 AS nd
    FROM j
    WINDOW w AS (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w2 AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day,
       round(CASE WHEN v IS NOT NULL THEN v
             ELSE pv + (nv - pv) * ((day - pd)::DOUBLE / (nd - pd)::DOUBLE)
             END, 4) AS v_interp,
       (v IS NULL) AS interpolated
FROM f
"""


@register("timeseries_interpolate", INTERP_ORACLE)
def q_timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation of each user's daily value series: per-user day
    spine (sequence from the user's own min..max — no cross of users × global
    calendar), exact-Decimal daily sums at the anchors, then forward/backward
    IGNORE-NULLS window carries supply the bracketing anchors for the linear
    blend. Per-user partitioned windows — no global sort; spine rows are
    bounded by Σ per-user day spans, not users × calendar."""
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, "events")["events"]
    per = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.round(F.sum(F.col("value").cast("decimal(14,2)")), 2)
        .cast("decimal(14,2)")
        .cast("double")
        .alias("v")
    )
    bounds = per.groupBy("user_id").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select("user_id", F.explode(F.sequence("lo", "hi")).alias("day"))
    j = spine.join(per, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    day_if_v = F.when(F.col("v").isNotNull(), F.col("day"))
    f = j.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("pv"),
        F.last(day_if_v, ignorenulls=True).over(w).alias("pd"),
        F.first("v", ignorenulls=True).over(w2).alias("nv"),
        F.first(day_if_v, ignorenulls=True).over(w2).alias("nd"),
    )
    frac = F.datediff(F.col("day"), F.col("pd")).cast("double") / F.datediff(
        F.col("nd"), F.col("pd")
    ).cast("double")
    return f.select(
        "user_id",
        "day",
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
                F.col("pv") + (F.col("nv") - F.col("pv")) * frac
            ),
            4,
        ).alias("v_interp"),
        F.col("v").isNull().alias("interpolated"),
    )


# --- Data-quality violation report ---------------------------------------------------

# The testdata facts are clean, so violations are PLANTED deterministically in
# both engines (NULL courier every 13th order, out-of-range rating every 19th,
# negative tips every 17th) and the report counts them per rule — including
# zero-violation rules, which must still appear as rows.
DQ_REPORT_ORACLE = """
WITH del AS (
    SELECT l_orderkey AS order_id, l_suppkey AS courier_id,
           CAST(l_extendedprice AS DECIMAL(14,2)) AS order_sum,
           CAST(l_linenumber % 6 AS SMALLINT) AS rating,
           CAST(round(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(4,2)), 2)
                AS DECIMAL(14,2)) AS tips
    FROM lineitem
),
corrupted AS (
    SELECT order_id,
           CASE WHEN order_id % 13 = 0 THEN NULL ELSE courier_id END AS courier_id,
           order_sum,
           CASE WHEN order_id % 19 = 0 THEN CAST(9 AS SMALLINT) ELSE rating END AS rating,
           CASE WHEN order_id % 17 = 0 THEN -tips ELSE tips END AS tips
    FROM del
),
agg AS (
    SELECT count(*) AS total,
           count(*) FILTER (WHERE courier_id IS NULL) AS c_null,
           count(*) FILTER (WHERE rating NOT BETWEEN 0 AND 5) AS c_rating,
           count(*) FILTER (WHERE tips < 0) AS c_tips,
           count(*) FILTER (WHERE order_sum < 0) AS c_sum
    FROM corrupted
)
SELECT 'courier_id_not_null' AS rule, c_null::BIGINT AS n_violations, total AS n_rows FROM agg
UNION ALL SELECT 'rating_between_0_5', c_rating::BIGINT, total FROM agg
UNION ALL SELECT 'tips_non_negative', c_tips::BIGINT, total FROM agg
UNION ALL SELECT 'order_sum_non_negative', c_sum::BIGINT, total FROM agg
"""


@register("dq_violation_report", DQ_REPORT_ORACLE)
def q_dq_violation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule violation counts over the (deterministically corrupted) fact
    increment, computed through the write-path validator machinery
    (operators/validate.annotate → one aggregation over the violations array,
    unpivoted via stack) — zero-violation rules still report a row, the dbt-
    test/Great-Expectations shape on Spark. Single pass, map-side flags."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.validate import (
        annotate,
        between,
        non_negative,
        not_null,
    )
    from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import (
        courier_domain,
    )

    fct = courier_domain(spark, sf_dir)["fct_deliveries"]
    corrupted = fct.select(
        "order_id",
        F.when(F.col("order_id") % 13 == 0, F.lit(None)).otherwise(
            F.col("courier_id")
        ).alias("courier_id"),
        "order_sum",
        F.when(F.col("order_id") % 19 == 0, F.lit(9).cast("smallint")).otherwise(
            F.col("rating")
        ).alias("rating"),
        F.when(F.col("order_id") % 17 == 0, -F.col("tips")).otherwise(
            F.col("tips")
        ).alias("tips"),
    )
    checks = [
        not_null("courier_id")[0],
        between("rating", 0, 5),
        non_negative("tips")[0],
        non_negative("order_sum")[0],
    ]
    flagged = annotate(corrupted, checks)
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.count(F.when(F.array_contains("violations", c.name), F.lit(1)))
            .cast("long")
            .alias(c.name)
            for c in checks
        ],
    )
    stack = ", ".join(f"'{c.name}', {c.name}" for c in checks)
    return agg.select(
        F.expr(f"stack({len(checks)}, {stack}) AS (rule, n_violations)"), "n_rows"
    )


# --- Embedding normalization + int8 quantization -------------------------------------

QUANTIZE_ORACLE = """
WITH n AS (
    SELECT vec_id,
           sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm,
           embedding::DOUBLE[] AS v
    FROM embeddings
)
SELECT vec_id,
       round(nrm, 4) AS norm,
       to_json(list_transform(v, x -> CAST(round(x / nrm * 127, 0) AS INTEGER)))::VARCHAR AS qvec
FROM n
"""


@register("embedding_quantize", QUANTIZE_ORACLE)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization of L2-normalized embeddings (the 4× storage / SIMD
    compression step before ANN indexing): per-row norm computed once, each
    coordinate scaled to [-127, 127] — pure JVM higher-order array expressions,
    zero shuffles, zero Python. The quantized vector round-trips through the
    driver's array→JSON canonicalization, hash-checked element-for-element."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import norm

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    with_norm = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
        norm(F.col("embedding")).alias("nrm"),
    )
    q = F.transform(
        F.col("v"), lambda x: F.round(x / F.col("nrm") * 127, 0).cast("int")
    )
    return with_norm.select(
        "vec_id", F.round(F.col("nrm"), 4).alias("norm"), q.alias("qvec")
    )


# --- Daily volume anomaly detection --------------------------------------------------

ANOMALY_ORACLE = """
WITH per AS (
    SELECT event_type, ts::DATE AS day, count(*) AS n FROM events GROUP BY 1, 2
),
s AS (
    SELECT event_type, SUM(n) AS s1, SUM(n * n) AS s2, count(*) AS k
    FROM per GROUP BY 1
),
z AS (
    SELECT p.event_type, p.day, p.n,
           round((p.n - s1::DOUBLE / k)
                 / sqrt((s2::DOUBLE - s1::DOUBLE * s1 / k) / (k - 1)), 4) AS zscore
    FROM per p JOIN s USING (event_type) WHERE k > 1
)
SELECT event_type, day, n::BIGINT AS n, zscore FROM z WHERE abs(zscore) > 2
"""


@register("daily_anomaly_zscore", ANOMALY_ORACLE)
def q_daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume anomaly detection: days whose per-type event count deviates more
    than 2σ from that type's mean. Mean and variance are derived from EXACT
    integer sums (Σn, Σn², k) so every double is bit-identical across engines —
    never stddev_samp(), whose streaming accumulation order differs. Two
    grouped aggs + a broadcast of the per-type stats; the day-grain
    pre-aggregation bounds everything downstream by (types × days)."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    per = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    s = per.groupBy("event_type").agg(
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.count(F.lit(1)).alias("k"),
    )
    z = (
        per.join(F.broadcast(s.filter(F.col("k") > 1)), "event_type")
        .select(
            "event_type",
            "day",
            F.col("n").cast("long").alias("n"),
            F.round(
                (F.col("n") - F.col("s1").cast("double") / F.col("k"))
                / F.sqrt(
                    (
                        F.col("s2").cast("double")
                        - F.col("s1").cast("double") * F.col("s1") / F.col("k")
                    )
                    / (F.col("k") - 1)
                ),
                4,
            ).alias("zscore"),
        )
    )
    return z.filter(F.abs(F.col("zscore")) > 2)


# nprobe=2: each query probes its TWO nearest inverted lists — the recall dial.
# Same plan topology as nprobe=1; candidate volume ×~2. The shared oracle
# template keeps rn <= 2 on the query side, exactly mirroring _centroid_probes.
IVF_NPROBE2_ORACLE = _IVF_ORACLE_TEMPLATE.format(k=IVF_K, nprobe=2)


@register("similarity_ivf_nprobe2", IVF_NPROBE2_ORACLE)
def q_similarity_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF recall dial, hash-checked: nprobe=2 recovers neighbors sitting
    just across a Voronoi boundary at ~2× candidate volume with the identical
    join topology (operators/similarity.ivf_topk's explode of the two nearest
    probe lists)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        ivf_topk,
    )

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 20), _ivf_seed_centroids(emb), k=5, nprobe=2
    )


TREND_ORACLE = """
WITH per AS (
    SELECT event_type, (ts::DATE - DATE '1970-01-01') AS x, count(*)::BIGINT AS y
    FROM events GROUP BY 1, 2
),
s AS (
    SELECT event_type, count(*)::BIGINT AS n,
           SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
           SUM(x * y)::BIGINT AS sxy, SUM(x * x)::BIGINT AS sxx
    FROM per GROUP BY 1
)
SELECT event_type, n AS n_days,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE round((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE, 6)
       END AS slope_per_day,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE round((sy::DOUBLE - ((n * sxy - sx * sy)::DOUBLE
                        / (n * sxx - sx * sx)::DOUBLE) * sx::DOUBLE) / n::DOUBLE, 6)
       END AS intercept
FROM s
"""


@register("trend_slope_per_type", TREND_ORACLE)
def q_trend_slope_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily-volume TREND via closed-form least squares: slope
    and intercept of (epoch day -> daily count), computed from five exact
    integer sufficient sums (n, Sx, Sy, Sxy, Sxx) — the regression shape of
    drift monitoring ('is this event type growing or dying?') as two grouped
    aggs, no ML library, no iterative solver. The sums are BIGINT-exact
    (epoch-days x daily counts stay far below 2^63 at any scale) so the one
    double division per group is bit-identical cross-engine; degenerate
    single-day groups yield NULL slope rather than a divide-by-zero. Scale
    shape: day-grain pre-agg shrinks events -> (type, day) rows before the
    tiny per-type fold — the same two-level agg discipline as
    `rolling_7d_counts`."""
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long")
    events = load_tables(spark, sf_dir, "events")["events"]
    per = events.groupBy(
        "event_type", day.alias("x")
    ).agg(F.count(F.lit(1)).alias("y"))
    s = per.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / det.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.when(det != 0, F.round(slope, 6)).alias("slope_per_day"),
        F.when(det != 0, F.round(intercept, 6)).alias("intercept"),
    )
