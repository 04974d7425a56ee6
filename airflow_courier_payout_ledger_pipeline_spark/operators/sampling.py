"""Curation sampling operators: deterministic stratified (domain-mix) sampling,
distributed prefix sums, and sequence packing to a token budget.

All engine-portable and reproducible by construction: sampling predicates are
md5-hex threshold compares (no rand(), no seed plumbing — re-running months later
on re-partitioned data selects byte-identical rows), and packing derives from an
exact global prefix sum over a total order. The reference pipeline has no
sampling surface (its compute is Postgres SQL); these extend the engine's
training-data story the way a 100 TB corpus actually gets consumed: mixed by
domain weight, then packed into fixed-size training sequences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: hash-space width for thresholds: first 4 md5 hex chars = 65536 buckets
_HASH_BUCKETS = 16**4


def hash_threshold(fraction: float) -> str:
    """Hex threshold ``t`` such that ``substring(md5(key),1,4) < t`` keeps
    ~``fraction`` of keys (granularity 1/65536 — document when quoting rates).
    fraction ≥ 1 returns 'g', which sorts above every hex string ('10000' would
    NOT: lexicographic compare, '1…' < 'a…')."""
    bucket = max(0, min(_HASH_BUCKETS, round(fraction * _HASH_BUCKETS)))
    return "g" if bucket >= _HASH_BUCKETS else format(bucket, "04x")


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Domain-mix sampling: keep a per-stratum fraction of rows (e.g. up-weight
    curated sources, down-weight crawl), deterministically — the keep decision is
    a pure function of (key, stratum), independent of partitioning, cluster size,
    and run date.

    Scale shape: ZERO shuffles — a map-side CASE over the stratum column and one
    md5 per row, fused into the scan's codegen stage. This is how mixture
    weights are applied to a 100 TB corpus without materializing per-source
    splits: the filter runs inline in whatever job consumes the mix.

    The per-stratum rate is exact in expectation with 1/65536 granularity; the
    CASE (not a map-literal lookup) keeps the predicate portable to any SQL
    engine for audit queries.
    """
    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
    thr: Column | None = None
    for stratum in sorted(fractions):
        t = F.lit(hash_threshold(fractions[stratum]))
        cond = F.col(stratum_col) == stratum
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    assert thr is not None, "fractions must be non-empty"
    thr = thr.otherwise(F.lit(hash_threshold(default_fraction)))
    return df.filter(bucket < thr)


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact running sum of ``value_col`` over the global ``order_col`` order,
    WITHOUT collapsing to one partition (the naive
    ``Window.orderBy`` — no partitionBy — executes single-threaded on one
    executor and is the classic prefix-sum scale trap).

    Two-pass shape (the textbook distributed scan):
    1. range-repartition on ``order_col`` so partition i holds a contiguous key
       range, then a per-partition window computes local prefix sums;
    2. per-partition totals (one tiny row each) come back to the driver, their
       exclusive prefix becomes each partition's offset, broadcast-joined back.

    Driver-side data is O(num_partitions) scalars — the same class as a
    watermark cursor. The result is independent of the partition count or
    boundaries (offsets always reconcile), so the output is deterministic for
    any cluster size.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    d = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    # PIN the range assignment: repartitionByRange picks its boundaries by
    # SAMPLING, and this frame is executed three times (totals collect, the
    # offset join, the caller's action) — without a materialization barrier
    # each execution may re-sample different boundaries, so rows near a
    # boundary change __pid between the totals pass and the join and the
    # reconciled offsets go stale (observed at sf0.1: bins corrupted from the
    # first boundary onward, nondeterministically). localCheckpoint
    # materializes the partitioned projection once; every downstream action
    # reuses those blocks. Cost: one cached copy of the (order, value)
    # projection — the caller should pass a pruned frame, as pack_sequences
    # does.
    d = d.localCheckpoint()
    w = Window.partitionBy("__pid").orderBy(order_col)
    local = d.withColumn("__local", F.sum(F.col(value_col)).over(w))

    totals = (
        local.groupBy("__pid")
        .agg(F.sum(F.col(value_col)).alias("__total"), F.min(order_col).alias("__lo"))
        .collect()
    )
    # exclusive prefix of partition totals, in key-range order
    offsets, acc = [], 0
    for row in sorted(totals, key=lambda r: r["__lo"]):
        offsets.append((row["__pid"], acc))
        acc += row["__total"]
    off_df = df.sparkSession.createDataFrame(offsets, "__pid int, __offset bigint")
    return (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, F.col("__local") + F.col("__offset"))
        .drop("__pid", "__local")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    target: int,
) -> DataFrame:
    """Assign documents to fixed-budget training bins: documents are laid out in
    ``id_col`` order and bin ``b`` covers global token offsets
    [b·target, (b+1)·target) — a document belongs to the bin where it STARTS
    (offset-based packing: deterministic, one pass, no per-bin sequential
    state; the standard scalable approximation of first-fit, over-filling a bin
    by at most one document).

    Emits one row per document: id, size, ``bin_id``, and the document's start
    offset within the global layout. Built on :func:`distributed_prefix_sum`,
    so it never single-threads regardless of corpus size.
    """
    with_cs = distributed_prefix_sum(df, id_col, size_col, out_col="__cs")
    start = (F.col("__cs") - F.col(size_col)).cast("bigint")
    return with_cs.select(
        F.col(id_col),
        F.col(size_col),
        start.alias("start_offset"),
        # integer DIV, not floor(double /): offsets in a 100 TB layout overflow
        # double's 2^53 exact range
        F.expr(f"CAST((__cs - {size_col}) DIV {target} AS BIGINT)").alias("bin_id"),
    )


def pack_stats(packed: DataFrame, size_col: str) -> DataFrame:
    """Per-bin fill report for a :func:`pack_sequences` layout: document count,
    token total, and fill ratio vs a ``target``-sized budget carried by the
    caller. One grouped agg keyed by bin — linear, near-uniform keys."""
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(size_col).cast("bigint").alias("tokens_total"),
        F.min("start_offset").alias("first_offset"),
    )
