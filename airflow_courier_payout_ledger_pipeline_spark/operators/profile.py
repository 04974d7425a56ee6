"""Column profiling: per-column row/null/distinct counts in ONE distributed pass
— the data-quality primitive a training pipeline runs before trusting a new drop
(null-rate drift, cardinality collapse, dead columns).

Shape: a single ``agg`` computes every column's stats (Spark plans the multiple
exact count-distincts with one expand + partial aggregation), then ``stack``
unpivots the 1-row result into (column, metric...) long format driver-free. No
per-column jobs, no collect loops — profiling an N-column table costs one scan
regardless of N.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """One row per column: (column, n_rows, n_null, n_distinct).

    ``n_distinct`` is exact (NULLs excluded, SQL semantics). At extreme
    cardinality swap ``countDistinct`` for ``approx_count_distinct`` — same
    single-pass shape, mergeable HLL sketches instead of expand."""
    cols = list(cols or df.columns)
    total = F.count(F.lit(1))
    aggs: list = [total.alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}" for c in cols
    )
    return one.select(
        F.expr(f"stack({len(cols)}, {stack_args}) as (column, n_null, n_distinct)"),
        F.col("__n").alias("n_rows"),
    ).select("column", "n_rows", "n_null", "n_distinct")
