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
