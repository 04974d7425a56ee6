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


def mad_outlier_stats(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 3
) -> DataFrame:
    """Robust per-group outlier audit from the same histogram machinery:
    median, MAD (median absolute deviation — the robust scale estimate a
    few extreme rows cannot drag the way stddev can), and the count of rows
    with ``|v − median| > k·MAD``. Everything stays in the value's INTEGER
    domain — the median is an exact order statistic from the domain, so the
    deviations are integers, the MAD is an exact order statistic over them,
    and the flag rule is a pure integer comparison (the conventional
    1.4826·MAD σ-consistency factor is deliberately NOT applied: it would
    put a float in the rule; k=3 on raw MAD ≈ 2.0σ for normal data —
    document the threshold in those terms instead). Deterministic to the
    bit, hence oracle-hashable — the audit a data-quality gate can diff
    day-over-day.

    Scale shape: everything downstream of ``histogram_state`` runs at
    distinct-value grain. The deviation histogram is the value histogram
    re-keyed by |v − median| (counts re-aggregate; no row-grain rebuild),
    the MAD is an order statistic over THAT, and the outlier count is a
    cnt-weighted sum over state rows — the row-grain flag pass the naive
    formulation needs never happens. Per-group stats (one row per group)
    ride broadcast joins; the shared histogram exchange is deduped at
    runtime (measured: 2 ReusedExchange nodes in the executed plan). No
    row-grain sort, no corpus window. NULL values are excluded (as in
    ``histogram_state``). The nightly 100 TB shape is
    ``mad_outlier_stats_from_state`` over the persisted/merged state —
    zero corpus passes."""
    return mad_outlier_stats_from_state(
        histogram_state(df, group_cols, value_col), group_cols, k
    )


def mad_outlier_stats_from_state(
    state: DataFrame, group_cols: list[str], k: int = 3
) -> DataFrame:
    """`mad_outlier_stats` over an existing histogram state — the nightly
    shape: fold the increment into the persisted state, then audit at
    distinct-value grain without touching raw rows.

    The state and the derived deviation histogram are PINNED (EAGER
    localCheckpoint, the graph.py discipline): the state feeds the median
    branch AND the deviation re-key, the deviation histogram feeds the MAD
    branch AND the final fold, and each reference would otherwise duplicate
    its upstream in the plan (10 static Exchange lines before the pins, 2
    after — the budget pinned in test_shuffle_budgets; runtime
    ReusedExchange is not a contract). EAGER, not lazy — reverted in r18
    after the r17 lazy flip regressed on the driver's box (0.87→1.12 s) and
    a drift-canceling pairwise A/B on an idle probe-calibrated box confirmed
    the direction (eager med 0.90 s vs lazy 0.93 s, lazy winning 3/10
    pairs): this operator's two pins feed FOUR consumers, and a lazy pin's
    materialization lands inside the first consuming action's timed stages
    (the broadcast build for the median), serializing work an eager pin
    overlaps at construction. Both are state-grain — domain-bounded,
    distributed, never driver-side."""
    state = state.localCheckpoint()
    med = quantiles_from_state(state, group_cols, [("__median", 1, 2)]).select(
        *group_cols, "__median"
    )
    dev_state = (
        state.join(F.broadcast(med), group_cols)
        .groupBy(
            *group_cols,
            "__median",
            F.abs(F.col("value") - F.col("__median")).alias("value"),
        )
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint()
    )
    mad = quantiles_from_state(
        dev_state, group_cols, [("__mad", 1, 2)]
    ).select(*group_cols, "__mad")
    return (
        dev_state.join(F.broadcast(mad), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_values"),
            F.max("__median").cast("bigint").alias("median"),
            F.max("__mad").cast("bigint").alias("mad"),
            F.sum(
                F.when(
                    F.col("value") > F.lit(k) * F.col("__mad"), F.col("cnt")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )
