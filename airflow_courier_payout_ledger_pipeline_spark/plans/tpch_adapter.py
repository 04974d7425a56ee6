"""Adapter: driver testdata (TPC-H-ish parquet) → courier-domain snowflake frames.

The driver's oracle harness runs over ``/root/testdata/sf*/`` tables (TESTDATA.md),
not courier tables, so the pipeline's own correctness queries use this deterministic
analogy (FIXTURES.md §5):

    fct_deliveries ≈ lineitem   (order_sum = l_extendedprice, tips = price×discount,
                                 rating = l_linenumber % 6 — 0 means "not rated")
    dm_couriers    ≈ supplier   (small dim → broadcast)
    dm_orders      ≈ orders     (month attribution via o_orderdate)
    dm_timestamps  ≈ distinct o_orderdate expansion (timestamps_stg_to_dds.sql:12-19)

Every derivation is a pure deterministic column expression so the DuckDB oracle can
reproduce it exactly. Money is cast to Decimal **before** any arithmetic — Decimal
addition is order-independent, so cluster-parallel aggregation matches the
single-threaded oracle bit-for-bit (doubles would not).

Surrogate-key policy: the reference uses Postgres ``serial`` (nondeterministic
per-insert); we use the natural business key (suppkey/orderkey) or
``xxhash64(business_key)`` where no natural int exists — deterministic across
re-runs and partitions (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MONEY = "decimal(14,2)"

#: inferred parquet schemas keyed on ``idxcache.stat_key(path)`` — METADATA
#: caching, not result caching: ``spark.read.parquet(path)`` re-reads the
#: footer on the driver at every query CONSTRUCTION (~60 ms per table on this
#: box), which a bench/driver process pays hundreds of times over unchanged
#: files. A rewritten file (new size/mtime) misses the cache and re-infers,
#: exactly the idxcache eviction discipline. At 100 TB the analogue is a
#: catalog/table-format schema — no production reader re-infers per query.
_SCHEMA_CACHE: dict[tuple, object] = {}


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with the inferred schema memoized per file
    stats — construction-time metadata reuse; the data is still read from
    parquet at execution, every time. On a miss, entries for the SAME path
    built from older bytes are evicted (``idxcache.evict_superseded`` — a
    rewritten testdata file must not leave its dead schema accumulating),
    and an unstat-able path (the (path, 0, 0) fallback key) is never cached:
    with no stats to invalidate on, a remote rewrite would serve a stale
    schema forever (r17 ADVICE)."""
    from airflow_courier_payout_ledger_pipeline_spark.idxcache import (
        evict_superseded,
        stat_key,
    )

    key = stat_key(path)
    if key[1] == 0 and key[2] == 0:
        return spark.read.parquet(path)
    schema = _SCHEMA_CACHE.get(("schema", key))
    if schema is None:
        evict_superseded(_SCHEMA_CACHE, "schema", key)
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[("schema", key)] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader rejects;
    read nanos as long and truncate to micros (identical to DuckDB's nanos→micros
    truncation, so oracle comparisons stay exact)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = _read_parquet(spark, f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read testdata parquet tables; column pruning/pushdown left to Catalyst."""
    use = names or TABLES
    return {
        t: read_events(spark, sf_dir) if t == "events" else _read_parquet(spark, f"{sf_dir}/{t}.parquet")
        for t in use
    }


def deliveries_from_lineitem(lineitem: DataFrame) -> DataFrame:
    """lineitem → fct_deliveries analog (schema per sql/DDL_dds.fct_deliveries.sql:5-17).

    rating = l_linenumber % 6 yields 0..5 with 0 = "not rated", exercising the
    FILTERed average (sql/courier_ledger_update.sql:10).
    """
    price = F.col("l_extendedprice").cast(MONEY)
    disc = F.col("l_discount").cast("decimal(4,2)")
    return lineitem.select(
        F.xxhash64(F.concat_ws("-", "l_orderkey", "l_linenumber")).alias("id"),
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("delivery_key"),
        F.col("l_orderkey").alias("order_id"),
        F.xxhash64(F.col("l_shipdate").cast("string")).alias("timestamp_id"),
        price.alias("order_sum"),
        F.col("l_suppkey").alias("courier_id"),
        (F.col("l_linenumber") % 6).cast("smallint").alias("rating"),
        F.round(price * disc, 2).cast(MONEY).alias("tips"),
    )


def couriers_from_supplier(supplier: DataFrame) -> DataFrame:
    """supplier → dm_couriers analog (sql/DDL_dds.dm_couriers.sql:5-9)."""
    return supplier.select(
        F.col("s_suppkey").alias("id"),
        F.concat(F.lit("courier-"), F.col("s_suppkey").cast("string")).alias("courier_key"),
        F.col("s_name").alias("courier_name"),
    )


def orders_dim_from_orders(orders: DataFrame) -> DataFrame:
    """orders → dm_orders analog (columns per sql/deliveries_stg_to_dds.sql:33 and
    sql/courier_ledger_update.sql:16-19)."""
    return orders.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderkey").cast("string").alias("order_key"),
        F.xxhash64(F.col("o_orderdate").cast("string")).alias("timestamp_id"),
    )


def timestamps_dim_from_orders(orders: DataFrame) -> DataFrame:
    """distinct o_orderdate → dm_timestamps analog (sql/timestamps_stg_to_dds.sql:10-22):
    dedup (A1) + date-part expansion (P5/P6). Postgres TIME → 'HH:mm:ss' string."""
    return (
        orders.select(F.col("o_orderdate").alias("ts"))
        .distinct()
        .select(
            F.xxhash64(F.col("ts").cast("string")).alias("id"),
            F.col("ts"),
            F.year("ts").cast("smallint").alias("year"),
            F.month("ts").cast("smallint").alias("month"),
            F.dayofmonth("ts").cast("smallint").alias("day"),
            F.date_format("ts", "HH:mm:ss").alias("time"),
            F.to_date("ts").alias("date"),
        )
    )


def courier_domain(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All four courier-domain frames from one testdata directory."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    return {
        "fct_deliveries": deliveries_from_lineitem(t["lineitem"]),
        "dm_couriers": couriers_from_supplier(t["supplier"]),
        "dm_orders": orders_dim_from_orders(t["orders"]),
        "dm_timestamps": timestamps_dim_from_orders(t["orders"]),
    }
