"""Multi-dimensional data layout: Z-order (Morton) clustering for row-group
skipping on MORE THAN ONE filter column.

``Lakehouse.write_sorted`` already gives single-key skipping (parquet min/max
stats per row group). But a table queried by BOTH courier and day — or user and
hour — can't serve two masters with a linear sort: the secondary column's
min/max spans the whole domain in every row group, so nothing prunes. Z-order
interleaves the bits of the filter columns into one sort key, so a contiguous
key range is a *hyper-rectangle* in value space: every row group gets bounded
min/max on EVERY participating column and any engine's stats-based pruning
(Spark parquet filter pushdown, DuckDB zone maps) skips on either predicate.

This is the layout trick behind Delta's OPTIMIZE ZORDER BY, built from plain
Catalyst bit arithmetic — no format extension, works on vanilla parquet. The
z-value is a pure deterministic function of the row, so an identical layout is
reproducible anywhere (and SQL-expressible: the oracle computes the same
interleave with `>>`/`&`/`*`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one int64 sort key:
    bit ``i`` of column ``c`` lands at position ``i * len(cols) + c``.

    Pure codegen'd shift/mask arithmetic (``len(cols) * bits`` terms, fused by
    whole-stage codegen) — no UDF. Callers must pre-scale values into
    [0, 2^bits): out-of-range bits are masked off (value % 2^bits), which keeps
    the key total but collapses distant values — scale explicitly instead.
    Requires ``len(cols) * bits <= 62`` (int64, sign bit untouched).
    """
    n = len(cols)
    assert n >= 1 and n * bits <= 62, "interleaved width must fit int64"
    terms = []
    for c_idx, col in enumerate(cols):
        v = col.cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + c_idx
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def morton_sql(cols: list[str], bits: int = 16) -> str:
    """The DuckDB/ANSI twin of :func:`morton_zvalue` over column-name strings —
    used by oracles and by engines auditing the layout key."""
    n = len(cols)
    terms = [
        f"(({c} >> {i}) & 1) * {1 << (i * n + c_idx)}"
        for c_idx, c in enumerate(cols)
        for i in range(bits)
    ]
    return " + ".join(terms)


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 16, num_files: int | None = None
) -> DataFrame:
    """Cluster ``df`` for a z-ordered write: range-repartition on the z-value
    (globally clusters key ranges into files) then sort within each partition.
    Write the result with ``mode("overwrite").parquet(...)`` or via
    ``Lakehouse.overwrite`` — each output file then covers a compact z-range,
    i.e. a bounded box in (col₁, col₂, …) space, and parquet row-group stats
    prune on any of the columns.

    One shuffle (the range partitioner), same cost class as any global sort;
    at 100 TB this runs as the final stage of a compaction job, not per query.
    """
    z = morton_zvalue([F.col(c) for c in cols], bits)
    d = df.withColumn("__z", z)
    n = num_files or d.sparkSession.sparkContext.defaultParallelism
    return d.repartitionByRange(n, F.col("__z")).sortWithinPartitions("__z").drop(
        "__z"
    )


def zorder_file_layout(
    df: DataFrame,
    part_col: str,
    zcols: list[str],
    bits: int = 16,
    rows_per_file: int = 4096,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """DETERMINISTIC per-partition z-ordered file layout: within each value of
    ``part_col`` (the coarse lakehouse partition — e.g. event day), rows are
    ranked by (z-value, tiebreak = the ``zcols`` themselves in order) and cut
    into files of ``rows_per_file``:

        ``file_id = (rank − 1) DIV rows_per_file``, ``pos = rank``.

    Unlike :func:`zorder_layout` (``repartitionByRange``, whose boundaries are
    SAMPLED and therefore run-dependent), this layout is a pure function of
    the partition's rowset — reproducible bit-for-bit in any engine, which is
    what lets an incremental compaction be PROVEN equivalent to a full
    rebuild (see :func:`incremental_zorder_compaction`) and lets an oracle
    replay it. Each file still covers a compact z-range (a bounded box in
    ``zcols`` space), so parquet row-group min/max stats prune on EVERY
    participating column.

    Scale shape: one exchange keyed by ``part_col`` + the per-partition sort
    the sorted writer performs anyway — never a global sort. Skew watch: a
    single giant lakehouse partition serializes its own sort; at 100 TB keep
    ``part_col`` at day/hour grain so partitions stay executor-sized.
    Ties in the full (z, *zcols) key are exact duplicate coordinates; rank
    assignment among them is engine-dependent, so callers needing row-grain
    (not coordinate-grain) determinism pass a unique ``tiebreak`` key — it
    joins the window ORDER only, never the z interleave.
    """
    z = morton_zvalue([F.col(c) for c in zcols], bits)
    from pyspark.sql.window import Window  # noqa: PLC0415

    order = [z, *[F.col(c) for c in zcols], *[F.col(c) for c in (tiebreak or [])]]
    w = Window.partitionBy(part_col).orderBy(*order)
    rank = F.row_number().over(w)
    return (
        df.select("*", z.alias("zvalue"), rank.cast("bigint").alias("pos"))
        # integer DIV (not floor(double /)): positions in a 100 TB partition
        # overflow double's 2^53 exact range
        .withColumn("file_id", F.expr(f"CAST((pos - 1) DIV {rows_per_file} AS INT)"))
    )


def incremental_zorder_compaction(
    base: DataFrame,
    increment: DataFrame,
    part_col: str,
    zcols: list[str],
    bits: int = 16,
    rows_per_file: int = 4096,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Incremental re-cluster: the nightly increment lands APPEND-ONLY, then
    compaction re-runs the z-ordered file layout ONLY for the lakehouse
    partitions the increment touched; untouched partitions keep their
    existing layout verbatim. Because :func:`zorder_file_layout` is a pure
    function of each partition's rowset, the result is row-identical to a
    full rebuild over base ∪ increment — the equivalence the registered
    query `zorder_incremental_compaction` hash-proves against a
    full-rebuild oracle.

    Scale shape: the distinct list of touched partition values is COLLECTED
    (day grain — O(touched days) scalars, the same bounded-driver-state
    class as a watermark cursor) and applied as literal ``isin`` filters, so
    the touched-side selection reaches the scan as a STATIC PartitionFilter:
    the re-cluster branch physically lists and reads ONLY the affected day
    directories (asserted from the executed scan's input files in
    tests/test_layout.py — a broadcast semi-join form would leave the
    pruning to runtime DPP, which a static file listing cannot prove and
    plain-parquet sources may not perform). The untouched branch passes
    through with no recompute and, in a real lakehouse, no rewrite:
    `Lakehouse.compact` rewrites only the touched directories. Cost is
    O(touched partitions), not O(table) — the difference between a nightly
    compaction that reads ~1/365th of a 100 TB table and one that rewrites
    all of it."""
    cols = base.columns
    distinct_parts = [
        r[0] for r in increment.select(part_col).distinct().collect()
    ]
    days = sorted(p for p in distinct_parts if p is not None)
    # Window.partitionBy groups all NULL partition values into ONE rowset, so
    # a full rebuild lays the NULL partition out as a single sequence. If the
    # increment contributes NULL rows, base's NULL rows must re-cluster WITH
    # them — leaving them untouched would emit two independent rowsets with
    # overlapping file_id/pos and break the full-rebuild equivalence.
    null_touched = None in distinct_parts
    part = F.col(part_col)
    if days or null_touched:
        # NULL base rows join whichever branch the increment dictates. isin
        # is three-valued (NULL for NULL keys), so each branch pairs it with
        # an explicit isNull term instead of a bare NOT — and every predicate
        # stays a pure partition-column expression so the touched selection
        # still reaches the scan as a STATIC PartitionFilter.
        in_days = part.isin(days) if days else F.lit(False)
        if null_touched:
            # NULL keys: in_days | TRUE -> touched; ~(TRUE) -> dropped from
            # untouched. Non-null: plain isin split.
            untouched = base.filter(~(in_days | part.isNull())).select(*cols)
            touched_base = base.filter(in_days | part.isNull()).select(*cols)
        else:
            # NULL keys: isin -> NULL drops them from touched; the explicit
            # isNull keeps them whole in untouched.
            untouched = base.filter(~in_days | part.isNull()).select(*cols)
            touched_base = base.filter(in_days).select(*cols)
    else:  # empty increment: nothing re-clusters
        untouched = base.select(*cols)
        touched_base = base.limit(0).select(*cols)
    touched = touched_base.unionByName(increment.select(*cols))
    kept = zorder_file_layout(untouched, part_col, zcols, bits, rows_per_file, tiebreak)
    recl = zorder_file_layout(touched, part_col, zcols, bits, rows_per_file, tiebreak)
    return kept.unionByName(recl)
