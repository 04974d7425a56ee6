"""Streaming ingestion patterns: the reference's batch SCD semantics carried onto
unbounded streams.

- ``stream_dedup``: SCD0 insert-ignore as a *streaming* operator — watermarked
  ``dropDuplicates`` keeps (bounded) seen-key state and emits each key once,
  exactly the ``ON CONFLICT DO NOTHING`` contract of
  ``modules/load_deliveries.py:62`` with the state horizon made explicit.
- ``stream_scd1_sink``: SCD1 upsert of a stream into a lakehouse table via
  ``foreachBatch`` — each micro-batch runs the same ``scd1_upsert`` merge the
  batch pipeline uses (one code path for batch and streaming writes; on Delta the
  body becomes ``MERGE INTO`` unchanged).

State sizing at scale: dedup state = keys within the watermark horizon; choose the
horizon from the upstream's max lateness (the reference's daily batch ≈ a 1-day
horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from airflow_courier_payout_ledger_pipeline_spark.operators.merge import scd1_upsert
from airflow_courier_payout_ledger_pipeline_spark.sources.lakehouse import Lakehouse


def stream_dedup(
    stream: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming SCD0: first event per key (within the watermark horizon) passes,
    later duplicates are dropped from the stream."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(keys)


def latest_by_key(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """One row per key: the row with the greatest ``order_cols`` tuple
    (lexicographic, descending). The compaction step of a CDC changelog."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def stream_compact_latest(
    stream: DataFrame,
    lake: Lakehouse,
    layer: str,
    table: str,
    keys: list[str],
    order_cols: list[str],
    checkpoint: str,
    query_name: str = "compact_latest",
) -> StreamingQuery:
    """CDC log compaction: continuously fold a change stream into a
    latest-row-per-key table (Kafka compacted-topic / Delta CDF materialization
    semantics). Per micro-batch: existing state ∪ batch → argmax per key on
    ``order_cols`` → swap.

    Unlike source-wins SCD1 (which depends on arrival order), argmax on an
    explicit version tuple is **associative and commutative**, so the final
    table is identical under ANY micro-batch split or within-batch ordering —
    which is what makes the sink hash-checkable against a single batch SQL
    statement, and restart-safe at any checkpoint boundary.

    At scale: state size is bounded by key cardinality, not stream length; with
    a partitioned target (``merge_upsert_partitioned``) each trigger rewrites
    only touched partitions — O(batch + touched state), not O(table).
    """
    schema = stream.schema

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        existing = lake.read(spark, layer, table, schema)
        lake.overwrite(
            latest_by_key(existing.unionByName(batch_df), keys, order_cols),
            layer,
            table,
        )

    return (
        stream.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_scd1_sink(
    stream: DataFrame,
    lake: Lakehouse,
    layer: str,
    table: str,
    keys: list[str],
    checkpoint: str,
    query_name: str = "scd1_sink",
    partition_col: str | None = None,
) -> StreamingQuery:
    """Continuously upsert a stream into a lakehouse table: per micro-batch,
    source rows win on key conflict (the couriers full-reload contract,
    sql/couriers_stg_to_dds.sql:21-27), unmatched target rows survive.

    With ``partition_col`` set, each micro-batch rewrites only the partitions it
    touches (``Lakehouse.merge_upsert_partitioned``) instead of the whole table —
    the difference between O(batch) and O(table) work per trigger, which is what
    keeps a continuous upsert viable on a large target."""
    schema = stream.schema

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if partition_col is not None:
            lake.merge_upsert_partitioned(
                spark, batch_df, layer, table, schema, keys, partition_col
            )
        else:
            existing = lake.read(spark, layer, table, schema)
            lake.overwrite(scd1_upsert(existing, batch_df, keys), layer, table)

    return (
        stream.writeStream.foreachBatch(upsert_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_fold_state(
    stream: DataFrame,
    lake: Lakehouse,
    layer: str,
    table: str,
    state_fn,
    merge_fn,
    checkpoint: str,
    query_name: str = "fold_state",
) -> StreamingQuery:
    """Continuous incremental materialized-view maintenance: per micro-batch,
    compute the batch's mergeable partial-aggregate state (``state_fn``) and
    fold it into the stored state table (``merge_fn`` — must be associative and
    commutative, e.g. ``plans/ledger.merge_ledger_states``). Per-trigger cost is
    O(batch + |state|), never a history recompute; because the fold is
    order-insensitive, the final state is identical under ANY micro-batch split
    — which makes the maintained mart hash-checkable against the one-statement
    full-recompute oracle and restart-safe at any checkpoint boundary.

    At 100 TB: the state table is group-grain (courier-months), orders of
    magnitude smaller than the facts; partition it and swap in
    ``merge_upsert_partitioned`` as the writer to make each trigger O(batch +
    touched groups).

    Exactly-once under at-least-once foreachBatch: the fold is ADDITIVE (unlike
    the per-batch-idempotent scd1/argmax sinks), so a batch replayed after a
    crash between the state write and the checkpoint commit must NOT fold
    twice. The last-applied ``(checkpoint lineage, batch_id)`` is therefore
    committed in the SAME atomic directory swap as the state it produced (a
    ``_APPLIED_BATCH`` sidecar inside the staging dir — see
    ``Lakehouse.overwrite``), and the fold skips any batch with
    ``batch_id <= stored`` from the same lineage: the standard foreachBatch
    exactly-once pattern, with no window in which state and marker disagree.
    Batch ids restart at 0 under a NEW checkpoint, where the <= guard would
    silently swallow genuinely-new batches — so a lineage mismatch RAISES
    instead of skipping; rebuilding over existing state is a deliberate act
    (clear the sidecar or use a fresh table), never a silent data drop.
    """

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        applied = lake.read_sidecar(layer, table, "_APPLIED_BATCH")
        if applied is not None:
            stored_lineage, _, stored_id = applied.partition("\n")
            if stored_lineage != checkpoint:
                # A DIFFERENT checkpoint lineage is writing into existing
                # state: its batch ids restart at 0, so the <= guard would
                # silently swallow genuinely-new batches until they pass the
                # old high-water mark. Fail loudly — resuming over existing
                # state requires either the original checkpoint or a
                # deliberate reset (clear the sidecar / fresh table).
                raise ValueError(
                    f"state table {layer}.{table} was written by checkpoint "
                    f"{stored_lineage!r}; folding from {checkpoint!r} would "
                    "double-count or drop batches — clear the state (or its "
                    "_APPLIED_BATCH sidecar) to rebuild, or resume the "
                    "original checkpoint"
                )
            if batch_id <= int(stored_id):
                return  # replayed batch: already folded into committed state
        slice_ = state_fn(batch_df)
        existing = lake.read(spark, layer, table, slice_.schema)
        lake.overwrite(
            merge_fn(existing, slice_),
            layer,
            table,
            sidecar={"_APPLIED_BATCH": f"{checkpoint}\n{batch_id}"},
        )

    return (
        stream.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_index_sink(
    stream: DataFrame,
    lake: Lakehouse,
    layer: str,
    postings_table: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_name: str = "index_sink",
) -> StreamingQuery:
    """Continuous search-index maintenance: per micro-batch, the new docs'
    (trigram, doc) postings APPEND to the persisted inverted index — O(batch)
    work per trigger, never an index rebuild. foreachBatch is at-least-once,
    so a replayed batch may duplicate postings; the probe side
    (``operators.search.substring_search``) counts DISTINCT trigrams per doc,
    making duplicates a bytes cost, not a correctness cost (fold them away
    periodically with ``Lakehouse.compact`` + distinct, or swap the writer for
    ``merge_upsert_partitioned`` keyed on (tg, doc) for exactly-once storage).

    The ANN twin needs no dedicated sink: ``pq_encode`` is a map-side
    projection, so ``stream_scd1_sink(pq_encode(stream, books), ...)``
    continuously upserts fresh codes with latest-embedding-wins semantics —
    one code path for batch and streaming index builds (tested in
    test_streaming_ingest.py)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.search import (
        trigram_index,
    )

    def index_batch(batch_df: DataFrame, batch_id: int) -> None:
        postings = trigram_index(batch_df, id_col, text_col)
        lake.append(postings, layer, postings_table)

    return (
        stream.writeStream.foreachBatch(index_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
