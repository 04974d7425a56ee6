"""Event-time analytics: tumbling/sliding windows, sessionization, as-of & range joins, window analytics, distributions, term importance, pivots.

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
# Event-time windows & sessionization
# =====================================================================================

TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DECIMAL(14,2))::DOUBLE AS value_sum
FROM events GROUP BY 1, 2
"""


@register("event_windows_tumbling", TUMBLING_ORACLE)
def q_event_windows_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airflow_courier_payout_ledger_pipeline_spark.operators.windows import (
        tumbling_counts,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    return tumbling_counts(events, "1 hour")


SLIDING_ORACLE = """
WITH x AS (SELECT ts, unnest(generate_series(0, 3)) AS k FROM events)
SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS window_start,
       count(*) AS n_events
FROM x GROUP BY 1
"""


@register("event_windows_sliding", SLIDING_ORACLE)
def q_event_windows_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airflow_courier_payout_ledger_pipeline_spark.operators.windows import (
        sliding_counts,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    return sliding_counts(events, "1 hour", "15 minutes")


SESSION_ORACLE = """
WITH o AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
    SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM o
)
SELECT user_id, session_seq::BIGINT AS session_seq,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DECIMAL(14,2))::DOUBLE AS value_sum
FROM s GROUP BY 1, 2
"""


# Boundary semantics differ from SESSION_ORACLE on purpose: Spark's native
# session_window is half-open [start, last+gap) — an event landing EXACTLY at
# last+gap starts a NEW session — so this oracle breaks on `>=` where the
# custom sessionizer (and its oracle above) breaks on `>`. Pinning the builtin
# against lag-reconstructed SQL is the point of this query: it proves the
# builtin's gap semantics, not just that it runs.
SESSION_NATIVE_ORACLE = """
WITH o AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
    SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS seq
    FROM o
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DECIMAL(14,2))::DOUBLE AS value_sum
FROM s GROUP BY user_id, seq
"""


@register("session_window_native", SESSION_NATIVE_ORACLE)
def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through Spark's BUILT-IN session_window (dynamic gap
    merging inside the aggregation operator — the same primitive Structured
    Streaming uses for stateful session aggs), hash-checked against a
    lag-reconstruction oracle with the builtin's exact half-open boundary
    semantics. Batch and streaming share this operator; proving it here is
    what licenses the streaming session marts."""
    events = load_tables(spark, sf_dir, "events")["events"]
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,2)"))
            .cast("decimal(14,2)")
            .alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


@register("event_sessionization", SESSION_ORACLE)
def q_event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30-min inactivity), lag + running-sum formulation —
    batch twin of the streaming stateful operator in streaming/."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.windows import sessionize

    events = load_tables(spark, sf_dir, "events")["events"]
    return sessionize(events, 30)


# =====================================================================================
# As-of join (temporal enrichment)
# =====================================================================================

# Right side pre-aggregated to one row per (user, instant) so tied purchase
# timestamps carry a deterministic payload in both engines.
ASOF_ORACLE = """
WITH p AS (
    SELECT user_id, ts AS pts, max(CAST(value AS DECIMAL(14,2))) AS pval
    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       p.pts AS pts_asof,
       p.pval::DOUBLE AS last_purchase_value
FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.pts
"""


@register("asof_join_events", ASOF_ORACLE)
def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of-backward join: each event enriched with the user's most recent
    purchase at or before it (union + ordered-window carry — one shuffle,
    linear; see operators/asof.py). Oracle is DuckDB's native ASOF JOIN."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.asof import asof_join

    events = load_tables(spark, sf_dir, "events")["events"]
    left = events.select("event_id", "user_id", "ts", "event_type")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("pts"))
        .agg(F.max(F.col("value").cast("decimal(14,2)")).alias("last_purchase_value"))
    )
    return asof_join(
        left, purchases, "user_id", "ts", "pts", ["last_purchase_value"]
    )


# =====================================================================================
# Analytic window functions
# =====================================================================================

WINDOW_ANALYTICS_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(row_number() OVER w AS INT) AS rn,
       CAST(lag(o_orderkey) OVER w AS BIGINT) AS prev_orderkey,
       CAST(lead(o_orderkey) OVER w AS BIGINT) AS next_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,2))::DOUBLE AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("window_analytics", WINDOW_ANALYTICS_ORACLE)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order sequence analytics: row_number / lag / lead / running
    Decimal sum over a deterministic (date, key) total order. One shuffle on
    customer; all four functions share a single window ordering (one sort)."""
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.row_number().over(w).alias("rn"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("decimal(18,2)")
        .alias("running_spend"),
    )


# =====================================================================================
# Distributional aggregates (exact quantiles over integer cents)
# =====================================================================================

# Quartile fractions (0.25/0.5/0.75) are binary-exact and the inputs are exact
# integer cents, so every interpolation step is exact in double arithmetic —
# identical across engines regardless of interpolation formula. (0.9-style
# fractions are NOT binary-exact; see SCALE.md.)
DISTRIBUTION_ORACLE = """
WITH c AS (
    SELECT l_suppkey AS courier_sk,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
           l_partkey
    FROM lineitem
)
SELECT courier_sk,
       count(*) AS n,
       count(DISTINCT l_partkey) AS n_parts,
       (min(cents)::DOUBLE / 100) AS price_min,
       (quantile_cont(cents, 0.25)::DOUBLE / 100) AS price_p25,
       (quantile_cont(cents, 0.50)::DOUBLE / 100) AS price_median,
       (quantile_cont(cents, 0.75)::DOUBLE / 100) AS price_p75,
       (max(cents)::DOUBLE / 100) AS price_max
FROM c GROUP BY 1
"""


@register("distribution_stats", DISTRIBUTION_ORACLE)
def q_distribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-courier price distribution: exact interpolated quartiles over integer
    cents (engine-portable, see oracle note) + exact distinct part count. At
    100 TB the same shape runs with approx_percentile / approx_count_distinct —
    one pass, mergeable sketches — at the cost of the oracle; the exact form is
    the correctness baseline."""
    orders = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    c = orders.select(F.col("l_suppkey").alias("courier_sk"), cents.alias("cents"), "l_partkey")
    return c.groupBy("courier_sk").agg(
        F.count("*").alias("n"),
        F.countDistinct("l_partkey").alias("n_parts"),
        (F.min("cents").cast("double") / 100).alias("price_min"),
        (F.percentile("cents", F.lit(0.25)).cast("double") / 100).alias("price_p25"),
        (F.percentile("cents", F.lit(0.50)).cast("double") / 100).alias("price_median"),
        (F.percentile("cents", F.lit(0.75)).cast("double") / 100).alias("price_p75"),
        (F.max("cents").cast("double") / 100).alias("price_max"),
    )


# =====================================================================================
# Range (interval) join
# =====================================================================================

RANGE_JOIN_ORACLE = """
WITH incidents AS (
    SELECT event_id AS incident_id, user_id, ts AS t0, ts + INTERVAL 30 MINUTE AS t1
    FROM events WHERE event_type = 'error'
)
SELECT i.incident_id, i.user_id,
       count(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(14,2))) AS DECIMAL(14,2))::DOUBLE AS value_sum
FROM incidents i
JOIN events e ON e.user_id = i.user_id AND e.ts >= i.t0 AND e.ts < i.t1
GROUP BY 1, 2
"""


@register("range_join_incidents", RANGE_JOIN_ORACLE)
def q_range_join_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join at scale: every 'error' event opens a 30-minute
    incident window; count and sum the same user's events inside it. Bucketed
    equi-join shape (operators/rangejoin.py) — never a nested-loop range join."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.rangejoin import (
        range_join_bucketed,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    incidents = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t1"),
    )
    matched = range_join_bucketed(
        events.select("user_id", "ts", "value"), incidents, "user_id", "ts", "t0", "t1", 30
    )
    return matched.groupBy("incident_id", "user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(14,2)")).cast("decimal(14,2)").alias("value_sum"),
    )


# =====================================================================================
# Term importance (TF-IDF family) — vocabulary + per-doc top terms
# =====================================================================================

# Exact rational importance: tf * (N / df). The classic log-idf would hash-
# mismatch across engines (ln() is not bit-specified); tf*N/df is one correctly-
# rounded division of exact ints — identical doubles everywhere, same ranking
# monotonicity in df as log-idf for fixed tf.
TERM_IMPORTANCE_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, count(*) AS tf FROM toks WHERE term != '' GROUP BY 1, 2
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf,
           (tf.tf * (SELECT n_docs FROM n))::DOUBLE / df.df::DOUBLE AS importance
    FROM tf JOIN df USING (term)
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY importance DESC, term) AS INT) AS rank
    FROM scored
)
SELECT doc_id, term, tf::BIGINT AS tf, importance, rank FROM ranked WHERE rank <= 5
"""


@register("term_importance", TERM_IMPORTANCE_ORACLE)
def q_term_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 terms by tf × (N/df): token explode → (doc, term) tf
    agg → document-frequency agg → broadcast-joined scoring → per-doc top-k
    window. The df table is vocabulary-sized (small) → broadcast; the heavy
    (doc, term) side shuffles once for the tf groupBy and once for the window."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import normalize_text
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    n_docs = docs.count()  # O(1) driver scalar, same class as a watermark cursor
    toks = docs.select(
        "doc_id", F.explode(F.split(normalize_text(F.col("text")), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.col("tf").cast("bigint").alias("tf"),
        ((F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df").cast("double")).alias(
            "importance"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("importance"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "term", "tf", "importance", "rank")
    )


# =====================================================================================
# Fuzzy (edit-distance) matching with blocking
# =====================================================================================

FUZZY_ORACLE = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_distance
FROM names a
JOIN names b
  ON string_split(a.p_name, ' ')[-1] = string_split(b.p_name, ' ')[-1]
 AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
"""


@register("fuzzy_name_pairs", FUZZY_ORACLE)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-match: candidate pairs share a blocking key (last
    token — at scale: phonetic/sorted-neighborhood keys), then exact
    Levenshtein ≤ 3 verifies. The equi-join on the block key keeps the pair
    space |block|² instead of n² — the textbook entity-resolution shape;
    unit-cost edit distance is identical in every engine (exact int oracle)."""
    parts = load_tables(spark, sf_dir, "part")["part"]
    names = parts.select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    block = lambda c: F.element_at(F.split(F.col(c), " "), -1)  # noqa: E731
    return (
        a.join(b, (block("name_a") == block("name_b")) & (F.col("name_a") < F.col("name_b")))
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_distance") <= 3)
    )


# =====================================================================================
# Column profiling (data-quality stats, one pass)
# =====================================================================================

_PROFILE_COLS = ["doc_id", "lang", "text", "source", "n_chars"]

PROFILE_ORACLE = " UNION ALL ".join(
    f"""SELECT '{c}' AS column, count(*) AS n_rows,
        sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        count(DISTINCT {c}) AS n_distinct FROM documents"""
    for c in _PROFILE_COLS
)


@register("profile_documents", PROFILE_ORACLE)
def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column row/null/exact-distinct counts for the documents table in one
    scan (single agg + stack unpivot, operators/profile.py)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.profile import (
        profile_columns,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return profile_columns(docs, _PROFILE_COLS)


# =====================================================================================
# Pivot & deterministic sampling
# =====================================================================================

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

PIVOT_ORACLE = f"""
SELECT user_id,
       {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in EVENT_TYPES)}
FROM events GROUP BY 1
"""


@register("pivot_event_counts", PIVOT_ORACLE)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user activity profile via pivot. The value list is explicit —
    an unlisted pivot triggers an extra distinct pass AND makes the output
    schema data-dependent (schema drift at scale); missing combos surface as 0
    like the SQL FILTER form, not NULL."""
    events = load_tables(spark, sf_dir, "events")["events"]
    wide = (
        events.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    )
    return wide.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


# 30-minute forward horizon, in nanoseconds for the DuckDB side (events ts is
# TIMESTAMP(NANOS) there; Spark sees micros after read_events' truncation —
# the testdata is micro-aligned so both gaps are identical)
ASOF_FWD_TOL_S = 1800

ASOF_FWD_ORACLE = f"""
WITH p AS (
    SELECT user_id, ts AS pts, max(CAST(value AS DECIMAL(14,2))) AS pval
    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
j AS (
    SELECT e.event_id, e.user_id, e.ts, e.event_type, p.pts, p.pval
    FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.pts
)
SELECT event_id, user_id, ts, event_type,
       CASE WHEN pts IS NOT NULL
                 AND epoch_ns(pts) - epoch_ns(ts) <= {ASOF_FWD_TOL_S}::BIGINT * 1000000000
            THEN pts END AS pts_asof,
       CASE WHEN pts IS NOT NULL
                 AND epoch_ns(pts) - epoch_ns(ts) <= {ASOF_FWD_TOL_S}::BIGINT * 1000000000
            THEN pval::DOUBLE END AS next_purchase_value
FROM j
"""


@register("asof_join_forward_tolerance", ASOF_FWD_ORACLE)
def q_asof_join_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a bounded horizon: each event labeled with the
    user's NEXT purchase within 30 minutes — the supervised-target builder
    ("did a conversion follow this event, and for how much?") that must look
    forward a fixed horizon and NO further (a nearest match beyond the
    horizon nulls out rather than falling through; pandas merge_asof
    tolerance semantics). Same union + ordered-window shape as the backward
    twin `asof_join_events` (one key shuffle, linear scan — the per-key scan
    just runs time-descending), so the cost at 100 TB is identical.
    Oracle: DuckDB's native ASOF JOIN with the inequality reversed + an
    epoch-ns horizon guard."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.asof import asof_join

    events = load_tables(spark, sf_dir, "events")["events"]
    left = events.select("event_id", "user_id", "ts", "event_type")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("pts"))
        .agg(F.max(F.col("value").cast("decimal(14,2)")).alias("next_purchase_value"))
    )
    return asof_join(
        left,
        purchases,
        "user_id",
        "ts",
        "pts",
        ["next_purchase_value"],
        direction="forward",
        tolerance_seconds=ASOF_FWD_TOL_S,
    )


ATTRIBUTION_ORACLE = """
WITH p AS (
    SELECT event_id AS pid, user_id, ts AS pts, CAST(value AS DECIMAL(14,2)) AS val
    FROM events WHERE event_type = 'purchase'
),
t AS (
    SELECT p.pid, p.val, e.event_id, e.user_id
    FROM p JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >= p.pts - INTERVAL 30 MINUTE AND e.ts < p.pts
),
n AS (SELECT *, count(*) OVER (PARTITION BY pid) AS n_t FROM t),
c AS (
    SELECT event_id, user_id,
           CAST(round(val / n_t, 4) AS DECIMAL(18,4)) AS credit
    FROM n
)
SELECT event_id, user_id, count(*)::BIGINT AS n_conversions,
       CAST(SUM(credit) AS DECIMAL(18,4))::DOUBLE AS credit_sum
FROM c GROUP BY 1, 2
"""


@register("attribution_linear", ATTRIBUTION_ORACLE)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution: each purchase's value splits equally
    over the same user's touch events in the preceding 30 minutes (the
    purchase itself excluded — the window is end-exclusive at the purchase
    instant), and every event reports its total earned credit across all
    conversions it preceded. The many-to-many companion of the as-of pair:
    `asof_join_events` keeps ONE prior state row, `asof_join_forward_
    tolerance` ONE next outcome — attribution needs ALL touches per
    conversion AND all conversions per touch, which is the bucketed range
    join (operators/rangejoin.py: <= 2 bucket-grain equi-join probes per
    interval, never a nested-loop). Money discipline: per-pair credit is
    round(value/n, 4) as DECIMAL — deterministic per pair, so the per-event
    Decimal sum is order-independent and the DuckDB oracle hash-matches
    exactly. Scale shape: one bucket-keyed equi-join + a purchase-grain
    count window + an event-grain fold; at 100 TB the join carries only
    (user, 30-minute bucket) collisions, not user x user history."""
    from pyspark.sql.window import Window

    from airflow_courier_payout_ledger_pipeline_spark.operators.rangejoin import (
        range_join_bucketed,
    )

    events = load_tables(spark, sf_dir, "events")["events"]
    purch = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("t0"),
        F.col("ts").alias("t1"),
        F.col("value").cast("decimal(14,2)").alias("val"),
    )
    touches = range_join_bucketed(
        events.select("event_id", "user_id", "ts"), purch, "user_id", "ts", "t0", "t1", 30
    )
    w = Window.partitionBy("pid")
    credited = touches.withColumn("__n", F.count(F.lit(1)).over(w)).withColumn(
        "credit", F.round(F.col("val") / F.col("__n"), 4).cast("decimal(18,4)")
    )
    return credited.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.sum("credit").cast("decimal(18,4)").alias("credit_sum"),
    )


ASOF_NEAREST_ORACLE = """
WITH p AS (
    SELECT user_id, ts AS pts, max(CAST(value AS DECIMAL(14,2))) AS pval
    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
b AS (
    SELECT e.event_id, e.user_id, e.ts, e.event_type, p.pts AS bts, p.pval AS bval
    FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.pts
),
f AS (
    SELECT e.event_id, p.pts AS fts, p.pval AS fval
    FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.pts
),
j AS (SELECT b.*, f.fts, f.fval FROM b JOIN f USING (event_id)),
pick AS (
    SELECT event_id, user_id, ts, event_type,
           CASE WHEN bts IS NOT NULL AND (fts IS NULL OR
                     epoch_ns(ts) - epoch_ns(bts) <= epoch_ns(fts) - epoch_ns(ts))
                THEN bts ELSE fts END AS pts_asof,
           CASE WHEN bts IS NOT NULL AND (fts IS NULL OR
                     epoch_ns(ts) - epoch_ns(bts) <= epoch_ns(fts) - epoch_ns(ts))
                THEN bval ELSE fval END AS pv
    FROM j
)
SELECT event_id, user_id, ts, event_type, pts_asof,
       pv::DOUBLE AS nearest_purchase_value
FROM pick
"""


@register("asof_join_nearest", ASOF_NEAREST_ORACLE)
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — the third merge_asof direction, completing the
    backward (`asof_join_events`) / forward (`asof_join_forward_tolerance`)
    family: each event labeled with the user's temporally CLOSEST purchase,
    before or after, equal-gap ties to the backward match (state over future
    — a tie never leaks). Plan shape: the same one-key-shuffle union with
    BOTH carries on one ascending sort in one Window exec (backward =
    trailing frame, forward = following frame; plan-asserted in
    tests/test_asof.py), then a per-row closer-gap pick — linear like its
    siblings, never a range explosion. Oracle: two native DuckDB ASOF joins
    + the identical gap CASE."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.asof import asof_join

    events = load_tables(spark, sf_dir, "events")["events"]
    left = events.select("event_id", "user_id", "ts", "event_type")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("pts"))
        .agg(F.max(F.col("value").cast("decimal(14,2)")).alias("nearest_purchase_value"))
    )
    return asof_join(
        left,
        purchases,
        "user_id",
        "ts",
        "pts",
        ["nearest_purchase_value"],
        direction="nearest",
    )
