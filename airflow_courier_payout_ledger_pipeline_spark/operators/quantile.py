"""Mergeable EXACT quantile state: percentiles at 100 TB without a sort.

The fourth member of the repo's mergeable-state family (CMS = frequency,
Bloom = membership, HLL = distinct): per-group quantiles from a persisted
value-HISTOGRAM state. Quantiles famously do not decompose — median(A ∪ B)
is not a function of median(A) and median(B) — but the (group, value, count)
histogram IS a lossless sufficient statistic, merges by count sum (the same
additive algebra as ``plans/ledger.merge_ledger_states``), and yields EXACT
discrete percentiles at finalize time. This is what Spark's own
``percentile_approx``/GK sketch trades away (rank error for unbounded value
domains); for QUANTIZED value domains — money in cents, latencies in ms,
lengths in tokens: the overwhelming case in pipeline telemetry — the
histogram is both smaller than a sketch would need to be AND exact, so
nightly increments fold into the state and every percentile readout is
reproducible to the bit (oracle-hashable, which no approximate sketch can
be; cf. SCALE.md on approx_percentile).

State size: Σ per group of |distinct quantized values| — bounded by the
value DOMAIN, not the row count (cents over a $0–$10k range ≤ 10^6 rows per
group worst-case; real distributions occupy a sliver). Build is one grouped
count with map-side partials: the exchange carries value-grain rows, never
raw events. Finalize sorts only the per-group DISTINCT values inside a
window — the classic exact-percentile trap (a corpus-wide sort, or a
single-partition global window) never appears; partitions are group-keyed.

Laws pinned in ``tests/test_quantile.py``:
- merge law: merged(A) ⊕ merged(B) ≡ build(A ∪ B) row-exact, any split/order;
- finalize(merged increments) ≡ finalize(full rebuild), bit-equal;
- percentile definition: smallest value whose cumulative count reaches
  ⌈p·N⌉, in pure INTEGER arithmetic (cum·q ≥ p_num·N — no float p·N, whose
  rounding is engine-dependent at exact boundaries); matches DuckDB's
  replicated-formula oracle exactly.

No reference twin: the reference pipeline has no percentile surface; this is
part of the 100 TB extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def histogram_state(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group value histogram: (group..., value, cnt) — the mergeable,
    lossless quantile state. One grouped count; duplicates in the input are
    the point (they become counts). NULL values are EXCLUDED at build time:
    a NULL carries no rank, and letting it into the state would poison the
    cumulative window with engine-dependent NULL ordering (Spark sorts NULLS
    FIRST ascending, DuckDB NULLS LAST) — the same reason SQL percentile
    functions ignore NULLs."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histogram_states(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Fold two histogram states: (group, value)-wise count sum. Associative,
    commutative, increment-order-free — and, unlike every approximate sketch,
    LOSSLESS: the merged state answers any later quantile (or min/max/mode/
    cdf) question exactly, including ones not anticipated at build time."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "value")
        .agg(F.sum("cnt").alias("cnt"))
    )


def quantiles_from_state(
    state: DataFrame,
    group_cols: list[str],
    quantiles: list[tuple[str, int, int]] = (
        ("p50", 1, 2),
        ("p90", 9, 10),
        ("p99", 99, 100),
    ),
) -> DataFrame:
    """Exact discrete percentiles per group from the histogram state: for each
    (name, num, den), the smallest value whose cumulative count cum satisfies
    ``cum * den >= num * N`` — i.e. the ⌈(num/den)·N⌉-th order statistic, in
    pure integer arithmetic so exact boundaries (p·N integral) resolve
    identically in every engine. The window runs over per-group DISTINCT
    VALUES (state grain), partitioned by group — never a row-grain or global
    sort."""
    w = Window.partitionBy(*group_cols).orderBy("value")
    totals = Window.partitionBy(*group_cols)
    cum = state.select(
        *group_cols,
        "value",
        F.sum("cnt").over(w).alias("__cum"),
        F.sum("cnt").over(totals).alias("__n"),
    )
    aggs = [
        F.min(
            F.when(F.col("__cum") * den >= F.lit(num) * F.col("__n"), F.col("value"))
        ).alias(name)
        for name, num, den in quantiles
    ]
    return cum.groupBy(*group_cols).agg(
        F.max("__n").cast("bigint").alias("n_values"), *aggs
    )
