"""Core-pipeline operator queries (SURVEY.md §2.1-§2.6), one registry entry per
operator row, each with a DuckDB oracle twin.

These run over the driver testdata via the FIXTURES.md §5 analogy; the operator
implementations themselves live in ``operators/`` / ``functions/`` and are reused by
the real pipeline jobs in ``plans/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import (
    MONEY,
    load_tables,
    timestamps_dim_from_orders,
)
from airflow_courier_payout_ledger_pipeline_spark.registry import register

# --- P1/P2: JSON field extraction + casts (sql/deliveries_stg_to_dds.sql:4-10) ------

JSON_EXTRACT_ORACLE = """
SELECT
    event_id,
    CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
    CAST(value AS DECIMAL(14,2))::DOUBLE AS value_dec,
    event_type
FROM events
"""


@register("json_extract", JSON_EXTRACT_ORACLE)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: schema-on-read JSON projection (``json_response::json ->> 'k'``) + P2
    casts, over the events table's ``props`` JSON column."""
    events = load_tables(spark, sf_dir, "events")["events"]
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.col("value").cast(MONEY).alias("value_dec"),
        "event_type",
    )


# --- P1 variant: typed from_json struct parse (parse once, not per-field) ----------

JSON_STRUCT_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events
"""


@register("json_struct_parse", JSON_STRUCT_ORACLE)
def q_json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1, the scale-preferred form: ``from_json`` into a typed struct ONCE, then
    field access — one parse per row regardless of how many fields downstream
    reads (get_json_object re-parses per call)."""
    events = load_tables(spark, sf_dir, "events")["events"]
    parsed = events.withColumn("p", F.from_json("props", "k int"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("prop_k"),
        F.when(F.col("p.k") >= 50, "high").otherwise("low").alias("k_band"),
    )


# --- API-side sort/limit/offset pagination semantics (SURVEY §2.5 note) -------------

PAGED_SCAN_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 50 OFFSET 100
"""


@register("paged_scan", PAGED_SCAN_ORACLE)
def q_paged_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The API's limit/offset pagination contract (modules/load_couriers.py:10-13)
    as a relational operator: total order + offset + limit (Spark ≥3.4)."""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


# --- P3/P4: watermark predicate with coalesce fallback (deliveries_stg_to_dds:13-16) -

WATERMARK_FILTER_ORACLE = """
SELECT
    l_orderkey,
    l_linenumber,
    l_shipdate,
    CAST(l_extendedprice AS DECIMAL(14,2))::DOUBLE AS order_sum
FROM lineitem
WHERE l_shipdate > COALESCE(NULL, TIMESTAMP '1998-01-01 00:00:00')
"""


@register("watermark_filter", WATERMARK_FILTER_ORACLE)
def q_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+P4: strictly-greater-than watermark filter with a COALESCE'd default
    cursor — the incremental-ingest predicate. The literal binds driver-side
    (constant-folded → parquet predicate pushdown, SURVEY.md §4)."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    watermark = F.coalesce(F.lit(None).cast("timestamp"), F.lit("1998-01-01 00:00:00").cast("timestamp"))
    return li.filter(F.col("l_shipdate") > watermark).select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.col("l_extendedprice").cast(MONEY).alias("order_sum"),
    )


# --- P5/P6 + A1: timestamp dimension expansion (sql/timestamps_stg_to_dds.sql:10-22) -

TIMESTAMP_DIM_ORACLE = """
SELECT DISTINCT
    o_orderdate AS ts,
    CAST(year(o_orderdate) AS SMALLINT) AS year,
    CAST(month(o_orderdate) AS SMALLINT) AS month,
    CAST(day(o_orderdate) AS SMALLINT) AS day,
    strftime(o_orderdate, '%H:%M:%S') AS time,
    CAST(o_orderdate AS DATE) AS date
FROM orders
"""


@register("timestamp_dim", TIMESTAMP_DIM_ORACLE)
def q_timestamp_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 dedup + P5/P6 date-part expansion → dm_timestamps rows (surrogate id
    excluded: engine-specific)."""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return timestamps_dim_from_orders(orders).drop("id")


# --- J1: broadcast dimension enrichment join (sql/couriers_stg_to_dds.sql:12-19) ----

BROADCAST_ENRICH_ORACLE = """
SELECT s.s_suppkey AS courier_sk, s.s_name AS courier_name, n.n_name AS nation, r.r_name AS region
FROM supplier s
INNER JOIN nation n ON s.s_nationkey = n.n_nationkey
INNER JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@register("broadcast_enrich", BROADCAST_ENRICH_ORACLE)
def q_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: attribute-enrichment inner equi-join over small dims — explicitly
    broadcast (zero shuffles at any scale)."""
    t = load_tables(spark, sf_dir, "supplier", "nation", "region")
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("s_suppkey").alias("courier_sk"),
            F.col("s_name").alias("courier_name"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


# --- J2: surrogate-key lookup join, drops rows with missing dims --------------------

DIM_LOOKUP_ORACLE = """
SELECT
    l.l_orderkey || '-' || l.l_linenumber AS delivery_key,
    o.o_orderkey AS order_sk,
    s.s_suppkey AS courier_sk,
    CAST(l.l_extendedprice AS DECIMAL(14,2))::DOUBLE AS order_sum
FROM lineitem l
INNER JOIN orders o ON l.l_orderkey = o.o_orderkey
INNER JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE o.o_orderstatus = 'F'
"""


@register("dim_lookup_join", DIM_LOOKUP_ORACLE)
def q_dim_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (sql/deliveries_stg_to_dds.sql:23-36): business-key → surrogate-key lookup
    via chained inner joins; missing dims silently drop facts (here: only orders with
    status 'F' "exist" in the dim). Dims broadcast."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    orders_dim = t["orders"].filter(F.col("o_orderstatus") == "F")
    return (
        t["lineitem"]
        .join(orders_dim, F.col("l_orderkey") == F.col("o_orderkey"), "inner")
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"), "inner")
        .select(
            F.concat_ws("-", "l_orderkey", "l_linenumber").alias("delivery_key"),
            F.col("o_orderkey").alias("order_sk"),
            F.col("s_suppkey").alias("courier_sk"),
            F.col("l_extendedprice").cast(MONEY).alias("order_sum"),
        )
    )


# --- A2/A3: ungrouped watermark cursor (max ts + non-empty guard) -------------------

WATERMARK_CURSOR_ORACLE = """
SELECT max(l_shipdate) AS last_loaded_ts, count(*) AS increment_rows
FROM lineitem
WHERE l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
"""


@register("watermark_cursor", WATERMARK_CURSOR_ORACLE)
def q_watermark_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3 (sql/deliveries_stg_to_dds.sql:19-21, modules/load_deliveries.py:66-75):
    the new watermark cursor = max event time of the increment, with the row count
    used as the empty-increment guard."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(F.col("l_shipdate") > F.lit("1997-06-01 00:00:00").cast("timestamp")).agg(
        F.max("l_shipdate").alias("last_loaded_ts"),
        F.count("*").alias("increment_rows"),
    )


# --- A4/A5/A6: grouped agg with FILTERed average ------------------------------------

FILTERED_AGG_ORACLE = """
SELECT
    l_suppkey AS courier_sk,
    COUNT(*) AS deliveries,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DECIMAL(14,2))::DOUBLE AS orders_total_sum,
    avg(l_linenumber % 6) FILTER (WHERE l_linenumber % 6 BETWEEN 1 AND 5) AS rate_avg,
    CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) * 0.25, 2) AS DECIMAL(14,2))::DOUBLE
        AS order_processing_fee
FROM lineitem
GROUP BY l_suppkey
"""


@register("filtered_agg", FILTERED_AGG_ORACLE)
def q_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 hash-agg + A5 FILTERed avg (rating 0 = unrated, excluded) + A6 derived
    aggregate (sql/courier_ledger_update.sql:2-25). Partial (map-side) aggregation
    is automatic for all of these — one shuffle total."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.payout import (
        order_processing_fee,
        rated_avg,
    )

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    rating = (F.col("l_linenumber") % 6).cast("smallint")
    total = F.sum(F.col("l_extendedprice").cast(MONEY)).cast(MONEY)
    return li.groupBy(F.col("l_suppkey").alias("courier_sk")).agg(
        F.count("*").alias("deliveries"),
        total.alias("orders_total_sum"),
        rated_avg(rating).alias("rate_avg"),
        F.round(order_processing_fee(total), 2).cast(MONEY).alias("order_processing_fee"),
    )


# --- C1/C2/C3: tier CASE logic standalone (sql/courier_ledger_update.sql:27-72) -----

TIER_PAYOUT_ORACLE = """
WITH m AS (
    SELECT
        l_suppkey AS courier_sk,
        CAST(year(l_shipdate) AS SMALLINT) AS y,
        CAST(month(l_shipdate) AS SMALLINT) AS m,
        COUNT(*) AS orders_count_l,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DECIMAL(14,2)) AS total,
        avg(l_linenumber % 6) FILTER (WHERE l_linenumber % 6 BETWEEN 1 AND 5) AS rate_avg_x
    FROM lineitem
    GROUP BY 1, 2, 3
),
u1 AS (
    SELECT *,
        CASE
            WHEN rate_avg_x < 4 THEN total * 0.05
            WHEN rate_avg_x < 4.5 AND rate_avg_x >= 4 THEN total * 0.07
            WHEN rate_avg_x < 4.9 AND rate_avg_x >= 4.5 THEN total * 0.08
            WHEN rate_avg_x >= 4.9 THEN total * 0.10
        END AS payout
    FROM m
)
SELECT
    courier_sk, y AS settlement_year, m AS settlement_month,
    CAST(rate_avg_x AS DECIMAL(3,2))::DOUBLE AS rate_avg,
    CAST(round(payout, 2) AS DECIMAL(14,2))::DOUBLE AS pct_payout,
    CAST(round(
        CASE
            WHEN rate_avg_x < 4 AND payout < 100 * orders_count_l THEN 100 * orders_count_l
            WHEN rate_avg_x < 4.5 AND rate_avg_x >= 4 AND payout < 150 * orders_count_l THEN 150 * orders_count_l
            WHEN rate_avg_x < 4.9 AND rate_avg_x >= 4.5 AND payout < 175 * orders_count_l THEN 175 * orders_count_l
            WHEN rate_avg_x >= 4.9 AND payout < 200 * orders_count_l THEN 200 * orders_count_l
            ELSE payout
        END, 2) AS DECIMAL(14,2))::DOUBLE AS floored_payout
FROM u1
"""


@register("tier_payout", TIER_PAYOUT_ORACLE)
def q_tier_payout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+C2 standalone: tier percentage then per-order floor enforcement, grouped by
    courier × delivery month (uses l_shipdate so it differs from the flagship's
    order-month attribution)."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.payout import (
        rated_avg,
        tier_floor_payout,
        tier_percentage_payout,
    )

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    rating = (F.col("l_linenumber") % 6).cast("smallint")
    m = li.groupBy(
        F.col("l_suppkey").alias("courier_sk"),
        F.year("l_shipdate").cast("smallint").alias("y"),
        F.month("l_shipdate").cast("smallint").alias("m"),
    ).agg(
        F.count("*").alias("orders_count_l"),
        F.sum(F.col("l_extendedprice").cast(MONEY)).cast(MONEY).alias("total"),
        rated_avg(rating).alias("rate_avg_x"),
    )
    u1 = m.withColumn("payout", tier_percentage_payout(F.col("rate_avg_x"), F.col("total")))
    return u1.select(
        "courier_sk",
        F.col("y").alias("settlement_year"),
        F.col("m").alias("settlement_month"),
        F.col("rate_avg_x").cast("decimal(3,2)").alias("rate_avg"),
        F.round("payout", 2).cast(MONEY).alias("pct_payout"),
        F.round(
            tier_floor_payout(F.col("rate_avg_x"), F.col("payout"), F.col("orders_count_l")), 2
        )
        .cast(MONEY)
        .alias("floored_payout"),
    )


# --- M2: SCD0 insert-ignore via anti-join (modules/load_deliveries.py:59-64) --------

SCD0_ORACLE = """
WITH existing AS (
    SELECT CAST(o_orderkey AS VARCHAR) AS delivery_key
    FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
),
increment AS (
    -- overlapping re-extraction window: some rows already exist
    SELECT CAST(o_orderkey AS VARCHAR) AS delivery_key,
           o_orderdate,
           CAST(o_totalprice AS DECIMAL(14,2))::DOUBLE AS order_sum
    FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
)
SELECT i.delivery_key, i.o_orderdate, i.order_sum
FROM increment i
WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.delivery_key = i.delivery_key)
"""


@register("scd0_insert_ignore", SCD0_ORACLE)
def q_scd0_insert_ignore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: ``INSERT … ON CONFLICT DO NOTHING`` → left-anti join of the (overlapping)
    increment against existing keys; only never-seen rows survive."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.merge import scd0_new_rows

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    key = F.col("o_orderkey").cast("string").alias("delivery_key")
    existing = orders.filter(F.col("o_orderdate") < "1998-01-01").select(key)
    increment = orders.filter(F.col("o_orderdate") >= "1997-01-01").select(
        key, "o_orderdate", F.col("o_totalprice").cast(MONEY).alias("order_sum")
    )
    return scd0_new_rows(increment, existing, ["delivery_key"])


# --- M1: SCD1 upsert via anti-join ∪ new (sql/couriers_stg_to_dds.sql:21-27) --------

SCD1_ORACLE = """
WITH existing AS (
    SELECT s_suppkey AS courier_sk, 'stale-' || s_name AS courier_name
    FROM supplier WHERE s_suppkey % 2 = 0
),
full_reload AS (
    SELECT s_suppkey AS courier_sk, s_name AS courier_name
    FROM supplier WHERE s_suppkey % 3 != 0
)
SELECT courier_sk, courier_name FROM full_reload
UNION ALL
SELECT e.courier_sk, e.courier_name
FROM existing e
WHERE NOT EXISTS (SELECT 1 FROM full_reload f WHERE f.courier_sk = e.courier_sk)
"""


@register("scd1_upsert", SCD1_ORACLE)
def q_scd1_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: ``INSERT … ON CONFLICT DO UPDATE`` → source rows win on key conflict,
    unmatched target rows are kept (anti-join ∪ source). Here: a full reload
    (suppkey % 3 != 0) upserted over a stale-named subset (suppkey % 2 = 0)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.merge import scd1_upsert

    sup = load_tables(spark, sf_dir, "supplier")["supplier"]
    existing = sup.filter(F.col("s_suppkey") % 2 == 0).select(
        F.col("s_suppkey").alias("courier_sk"),
        F.concat(F.lit("stale-"), F.col("s_name")).alias("courier_name"),
    )
    full_reload = sup.filter(F.col("s_suppkey") % 3 != 0).select(
        F.col("s_suppkey").alias("courier_sk"), F.col("s_name").alias("courier_name")
    )
    return scd1_upsert(existing, full_reload, ["courier_sk"])


# --- S1/S2 scale path: page-parallel REST extraction (rows-only) --------------------


def _fake_courier_api_page(params: dict) -> list[dict]:
    """Deterministic stand-in for the couriers endpoint (module-level so executors
    can pickle it): 1000 couriers served in offset/limit pages, name-sorted —
    mirrors modules/load_couriers.py:9-14 server behavior."""
    total = 1000
    off, lim = params.get("offset", 0), params.get("limit", 50)
    return [
        {"_id": f"c{i:04d}", "name": f"Courier {i:04d}"}
        for i in range(off, min(off + lim, total))
    ]


# The fake API is a pure function of (offset, limit), so the distributed fetch
# has an exact SQL twin: the same 1000 records via generate_series + printf.
REST_FETCH_ORACLE = """
SELECT printf('c%04d', i) AS courier_key, printf('Courier %04d', i) AS courier_name
FROM (SELECT unnest(generate_series(0, 999)) AS i)
"""


@register("rest_page_fetch_distributed", REST_FETCH_ORACLE)
def q_rest_page_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 at scale: fan page fetches out to executors over a page-range DF via
    mapInPandas (sources/rest.py), then schema-on-read JSON promotion (P1) — the
    backfill path where the reference's driver-side 5s-per-page loop would take
    ~17 minutes for 10k records."""
    from airflow_courier_payout_ledger_pipeline_spark.sources.rest import (
        fetch_pages_distributed,
    )

    raw = fetch_pages_distributed(spark, _fake_courier_api_page, {}, n_pages=20)
    return raw.select(
        F.get_json_object("json_response", "$._id").alias("courier_key"),
        F.get_json_object("json_response", "$.name").alias("courier_name"),
    )


# --- S2+M3: two-run watermark progression (the repo's signature incremental path) ---

# Emulates two successive incremental promotion runs against static data
# (sql/deliveries_stg_to_dds.sql:2-58, modules/load_deliveries.py:21-79):
# run 1 sees rows in (w0, snapshot1]; its cursor = max(ts) of that increment;
# run 2 extracts strictly after that cursor (S5), SCD0-deduped against run-1
# keys (M2); the final 'cursor' row materializes the advanced watermark (S6).
# delivery_key is NOT unique in the testdata, so within-batch dedup orders by
# (ts, order_sum) — mirrored by the oracle's QUALIFY row_number().
INCREMENTAL_PROMOTION_ORACLE = """
WITH base AS (
    SELECT l_orderkey || '-' || l_linenumber AS delivery_key,
           l_shipdate AS ts,
           CAST(l_extendedprice AS DECIMAL(14,2))::DOUBLE AS order_sum
    FROM lineitem
),
run1 AS (
    SELECT * FROM base
    WHERE ts > TIMESTAMP '1997-06-01 00:00:00' AND ts <= TIMESTAMP '1997-09-01 00:00:00'
),
run2 AS (
    SELECT * FROM base WHERE ts > (SELECT max(ts) FROM run1)
),
new2 AS (
    SELECT * FROM run2 r2
    WHERE NOT EXISTS (SELECT 1 FROM run1 r1 WHERE r1.delivery_key = r2.delivery_key)
    QUALIFY row_number() OVER (PARTITION BY delivery_key ORDER BY ts, order_sum) = 1
),
facts AS (
    SELECT delivery_key, ts, order_sum, 1 AS run_no FROM run1
    UNION ALL
    SELECT delivery_key, ts, order_sum, 2 AS run_no FROM new2
)
SELECT * FROM facts
UNION ALL
SELECT 'cursor', (SELECT max(ts) FROM facts), NULL::DOUBLE, 0
"""


@register("incremental_promotion", INCREMENTAL_PROMOTION_ORACLE)
def q_incremental_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+S5+S6+M2/M3 end-to-end: watermark-windowed increment, driver-side cursor
    bind (constant-folds into the second scan's pushed filter), SCD0 insert-ignore
    across runs, and the advanced cursor emitted last — the facts-first/
    cursor-last promotion pattern of plans/promotions.py, driver-checkable."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.merge import scd0_new_rows

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    base = li.select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("delivery_key"),
        F.col("l_shipdate").alias("ts"),
        F.col("l_extendedprice").cast(MONEY).alias("order_sum"),
    )
    w0 = F.lit("1997-06-01 00:00:00").cast("timestamp")
    snapshot1 = F.lit("1997-09-01 00:00:00").cast("timestamp")
    run1 = base.filter((F.col("ts") > w0) & (F.col("ts") <= snapshot1))
    # S6→S5 round-trip: run 1's cursor binds driver-side, exactly like
    # WatermarkStore.read_last_loaded_ts feeding the next run's filter
    cursor1 = run1.agg(F.max("ts")).first()[0]
    run2 = base.filter(F.col("ts") > F.lit(cursor1))
    new2 = scd0_new_rows(
        run2,
        run1.select("delivery_key"),
        ["delivery_key"],
        tiebreaker=F.struct(F.col("ts"), F.col("order_sum")),
    )
    facts = run1.withColumn("run_no", F.lit(1)).unionByName(
        new2.withColumn("run_no", F.lit(2))
    )
    cursor_row = facts.agg(F.max("ts").alias("ts")).select(
        F.lit("cursor").alias("delivery_key"),
        "ts",
        F.lit(None).cast(MONEY).alias("order_sum"),
        F.lit(0).alias("run_no"),
    )
    return facts.unionByName(cursor_row)


# --- Set operations & multi-level aggregation (general analytics surface) -----------

SET_OPS_ORACLE = """
WITH may AS (SELECT DISTINCT o_custkey FROM orders WHERE month(o_orderdate) = 5),
jun AS (SELECT DISTINCT o_custkey FROM orders WHERE month(o_orderdate) = 6)
SELECT o_custkey, 'may_only' AS membership FROM (SELECT * FROM may EXCEPT SELECT * FROM jun)
UNION ALL
SELECT o_custkey, 'both' AS membership FROM (SELECT * FROM may INTERSECT SELECT * FROM jun)
"""


@register("set_ops", SET_OPS_ORACLE)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT / UNION ALL: customers ordering in May vs June. (The
    reference has no set operations — SURVEY §2.5 — but a complete engine needs
    them; Spark plans them as hash anti/semi joins.)"""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    may = orders.filter(F.month("o_orderdate") == 5).select("o_custkey").distinct()
    jun = orders.filter(F.month("o_orderdate") == 6).select("o_custkey").distinct()
    return may.exceptAll(jun).withColumn("membership", F.lit("may_only")).unionByName(
        may.intersectAll(jun).withColumn("membership", F.lit("both"))
    )


ROLLUP_ORACLE = """
SELECT CAST(year(o_orderdate) AS SMALLINT) AS y,
       CAST(month(o_orderdate) AS SMALLINT) AS m,
       count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DECIMAL(18,2))::DOUBLE AS total
FROM orders
GROUP BY ROLLUP (1, 2)
"""


@register("rollup_totals", ROLLUP_ORACLE)
def q_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation via ROLLUP (year, month → year → grand total) —
    one pass, NULL-filled subtotal levels identical across engines.

    SQL standard (and DuckDB): the () grouping set yields its grand-total row
    even over EMPTY input; Spark's expand-based rollup yields zero rows there.
    So the () level is computed as a plain global aggregate (always 1 row) and
    the expand handles only (y,m)/(y) — identical output on non-empty data,
    standard-conformant on empty."""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    y = F.year("o_orderdate").cast("smallint").alias("y")
    m = F.month("o_orderdate").cast("smallint").alias("m")
    aggs = [
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("decimal(18,2)").alias("total"),
    ]
    levels = (
        orders.rollup(y, m)
        .agg(*aggs, F.grouping_id().alias("__gid"))
        .filter(F.col("__gid") < 3)  # keep (y,m) and (y); () comes from the global agg
        .drop("__gid")
    )
    grand = orders.agg(*aggs).select(
        F.lit(None).cast("smallint").alias("y"),
        F.lit(None).cast("smallint").alias("m"),
        "n_orders",
        "total",
    )
    return levels.unionByName(grand)


# --- Semi / anti joins (EXISTS / NOT EXISTS surface) --------------------------------

SEMI_ANTI_ORACLE = """
SELECT c_custkey, c_name, 'active' AS segment
FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, c_name, 'dormant' AS segment
FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register("semi_anti_join", SEMI_ANTI_ORACLE)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS as left-semi / left-anti joins: customer segmentation
    by order activity. Catalyst plans both as hash joins that carry only the
    probe side's columns (no orders payload is shuffled); at 100 TB the orders
    side reduces to its distinct join keys before the exchange."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    cust = t["customer"].select("c_custkey", "c_name")
    keys = t["orders"].select("o_custkey")
    cond = F.col("c_custkey") == F.col("o_custkey")
    active = cust.join(keys, cond, "left_semi").withColumn("segment", F.lit("active"))
    dormant = cust.join(keys, cond, "left_anti").withColumn("segment", F.lit("dormant"))
    return active.unionByName(dormant)


# --- GROUPING SETS (multi-dimensional aggregate in one pass) ------------------------

GROUPING_SETS_ORACLE = """
WITH e AS (
    SELECT event_type, CAST(hour(ts) AS INT) AS hr,
           CAST(value AS DECIMAL(14,2)) AS v
    FROM events
)
SELECT event_type, hr,
       CAST(grouping(event_type) AS INT) AS g_type,
       CAST(grouping(hr) AS INT) AS g_hr,
       count(*) AS n_events,
       CAST(SUM(v) AS DECIMAL(18,2))::DOUBLE AS value_total
FROM e
GROUP BY GROUPING SETS ((event_type, hr), (event_type), (hr))
"""

GROUPING_SETS_SPARK_SQL = """
SELECT event_type, hr,
       CAST(grouping(event_type) AS INT) AS g_type,
       CAST(grouping(hr) AS INT) AS g_hr,
       count(*) AS n_events,
       CAST(SUM(v) AS DECIMAL(18,2)) AS value_total
FROM {events}
GROUP BY GROUPING SETS ((event_type, hr), (event_type), (hr))
"""


@register("grouping_sets_hourly", GROUPING_SETS_ORACLE)
def q_grouping_sets_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: (type, hour) / (type) / (hour) marginals in ONE scan — the
    expand operator multiplies rows by the number of sets map-side, then a single
    shuffle aggregates all levels together (vs. 3 scans + a union). grouping()
    flags disambiguate subtotal NULLs. The empty set () is deliberately absent:
    Spark's expand emits no grand-total row on empty input where the SQL standard
    does (see rollup_totals for the conformant pattern)."""
    events = load_tables(spark, sf_dir, "events")["events"]
    e = events.select(
        "event_type",
        F.hour("ts").cast("int").alias("hr"),
        F.col("value").cast("decimal(14,2)").alias("v"),
    )
    e.createOrReplaceTempView("__gs_events")
    return spark.sql(GROUPING_SETS_SPARK_SQL.format(events="__gs_events"))


# --- Fixed-width histogram (distribution profiling) ---------------------------------

PRICE_HISTOGRAM_ORACLE = """
WITH c AS (
    SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
           CAST(o_totalprice AS DECIMAL(14,2)) AS price
    FROM orders
)
SELECT CAST(floor(cents / 5000000) AS INT) AS bucket,
       CAST(floor(cents / 5000000) AS INT) * 50000.0 AS bucket_lo,
       count(*) AS n_orders,
       (min(cents)::DOUBLE / 100) AS bucket_min,
       (max(cents)::DOUBLE / 100) AS bucket_max,
       CAST(SUM(price) AS DECIMAL(18,2))::DOUBLE AS bucket_total
FROM c GROUP BY 1
"""


@register("price_histogram", PRICE_HISTOGRAM_ORACLE)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width ($50k) histogram over order totals: bucketing on exact integer
    cents (engine-portable floor; the int→double quotient is exact below 2^53),
    one shuffle on ~20 bucket keys with map-side partial aggregation — the
    distribution-profiling primitive that stays one pass at any scale."""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    c = orders.select(
        cents.alias("cents"),
        F.col("o_totalprice").cast("decimal(14,2)").alias("price"),
    )
    bucket = F.floor(F.col("cents") / F.lit(5000000)).cast("int")
    return c.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_orders"),
        (F.min("cents").cast("double") / 100).alias("bucket_min"),
        (F.max("cents").cast("double") / 100).alias("bucket_max"),
        F.sum("price").cast("decimal(18,2)").alias("bucket_total"),
    ).select(
        "bucket",
        (F.col("bucket") * F.lit(50000.0)).alias("bucket_lo"),
        "n_orders",
        "bucket_min",
        "bucket_max",
        "bucket_total",
    )


# --- Ordered string aggregation (LISTAGG surface) -----------------------------------

LIST_AGG_ORACLE = """
SELECT o_custkey,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
       count(DISTINCT o_orderpriority) AS n_priorities
FROM orders GROUP BY 1
"""


@register("list_agg_priorities", LIST_AGG_ORACLE)
def q_list_agg_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg: per-customer sorted distinct priority list. collect_set
    is order-nondeterministic across partitions — array_sort before array_join
    makes the result total-order deterministic (the only portable way to emit an
    aggregated list across engines)."""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return orders.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


# --- S5/S6: watermark state round-trip (JSON KV document store) ---------------------

WATERMARK_STATE_ORACLE = """
SELECT
    'deliveries_stg_to_dds' AS workflow_key,
    to_json(struct_pack(last_loaded_ts := strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S')))
        AS workflow_settings
FROM lineitem
"""


@register("watermark_state", WATERMARK_STATE_ORACLE)
def q_watermark_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 + P7 (sql/deliveries_stg_to_dds.sql:44-56): build the watermark KV row —
    JSON document construction via to_json(struct(...)), the Spark analog of
    jsonb_build_object."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.agg(F.max("l_shipdate").alias("mx")).select(
        F.lit("deliveries_stg_to_dds").alias("workflow_key"),
        # ignoreNullFields=false: a NULL cursor (cold start, empty table) must
        # serialize as {"last_loaded_ts":null} like every other engine, not {}
        F.to_json(
            F.struct(F.date_format("mx", "yyyy-MM-dd HH:mm:ss").alias("last_loaded_ts")),
            {"ignoreNullFields": "false"},
        ).alias("workflow_settings"),
    )
