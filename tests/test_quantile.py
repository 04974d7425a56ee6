"""Mergeable exact-quantile state laws (operators/quantile.py): the histogram
state is a lossless mergeable sufficient statistic — merge ≡ rebuild
row-exact, finalize(merged) ≡ finalize(rebuild) bit-equal, and the integer
order-statistic definition matches hand-computed ground truth including exact
p·N boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
    histogram_state,
    merge_histogram_states,
    quantiles_from_state,
)

G = ["grp"]


def _rows(spark, vals_by_grp):
    data = [(g, v) for g, vs in vals_by_grp.items() for v in vs]
    return spark.createDataFrame(data, "grp string, v long")


def test_merge_of_splits_is_row_exact_vs_direct_build(spark):
    df = _rows(spark, {"a": [1, 2, 2, 3, 9], "b": [5, 5, 5, 7]})
    df = df.withColumn("rid", F.monotonically_increasing_id())
    a, b = df.filter(F.col("rid") % 2 == 0), df.filter(F.col("rid") % 2 == 1)
    merged = merge_histogram_states(
        histogram_state(a, G, "v"), histogram_state(b, G, "v"), G
    )
    direct = histogram_state(df, G, "v")
    assert sorted((r.grp, r.value, r.cnt) for r in merged.collect()) == sorted(
        (r.grp, r.value, r.cnt) for r in direct.collect()
    )


def test_finalize_of_merged_equals_finalize_of_rebuild(spark):
    df = _rows(spark, {"a": list(range(100)) * 2, "b": [3, 1, 4, 1, 5, 9, 2, 6]})
    df = df.withColumn("rid", F.monotonically_increasing_id())
    halves = [df.filter(F.col("rid") % 2 == i) for i in range(2)]
    merged = merge_histogram_states(
        histogram_state(halves[0], G, "v"), histogram_state(halves[1], G, "v"), G
    )
    got = sorted(tuple(r) for r in quantiles_from_state(merged, G).collect())
    want = sorted(
        tuple(r) for r in quantiles_from_state(histogram_state(df, G, "v"), G).collect()
    )
    assert got == want


def test_percentiles_match_hand_computed_order_statistics(spark):
    # grp a: 1..10 once each (N=10): p50 = 5th order stat = 5 (cum*2 >= 10 at
    # v=5 exactly — the integral-boundary case), p90 = 9, p99 = 10
    # grp b: [1, 1, 1, 100] (N=4): p50 = 2nd = 1, p90 = ceil(3.6)=4th = 100
    df = _rows(spark, {"a": list(range(1, 11)), "b": [1, 1, 1, 100]})
    out = {
        r.grp: r
        for r in quantiles_from_state(histogram_state(df, G, "v"), G).collect()
    }
    assert (out["a"].n_values, out["a"].p50, out["a"].p90, out["a"].p99) == (
        10, 5, 9, 10,
    )
    assert (out["b"].n_values, out["b"].p50, out["b"].p90, out["b"].p99) == (
        4, 1, 100, 100,
    )


def test_single_value_and_single_row_groups(spark):
    df = _rows(spark, {"one": [42], "flat": [7] * 50})
    out = {
        r.grp: r
        for r in quantiles_from_state(histogram_state(df, G, "v"), G).collect()
    }
    assert (out["one"].p50, out["one"].p99) == (42, 42)
    assert (out["flat"].n_values, out["flat"].p50, out["flat"].p99) == (50, 7, 7)


def test_rollup_to_coarser_grain_preserves_exactness(spark):
    """Re-grouping the state to a coarser grain (day×type → type) is the same
    count-sum algebra — merge_histogram_states with fewer group cols — and the
    rolled-up quantiles equal a direct coarse build's: the property exact
    percentile ROWS lack entirely (a p50-per-day table cannot produce
    p50-per-month; the histogram state can)."""
    df = _rows(spark, {"a": [1, 2, 3], "b": [4, 5, 6, 7]}).withColumn(
        "day", (F.col("v") % 2).cast("int")
    )
    fine = histogram_state(df, ["grp", "day"], "v")
    rolled = fine.groupBy("grp", "value").agg(F.sum("cnt").alias("cnt"))
    direct = histogram_state(df, ["grp"], "v")
    assert sorted(tuple(r) for r in rolled.collect()) == sorted(
        tuple(r) for r in direct.collect()
    )
    got = sorted(tuple(r) for r in quantiles_from_state(rolled, ["grp"]).collect())
    want = sorted(tuple(r) for r in quantiles_from_state(direct, ["grp"]).collect())
    assert got == want


def test_merge_is_commutative_and_order_free(spark):
    df = _rows(spark, {"a": [1, 2, 3, 4, 5, 6]})
    df = df.withColumn("rid", F.monotonically_increasing_id())
    parts = [df.filter(F.col("rid") % 3 == i) for i in range(3)]
    s = [histogram_state(p, G, "v") for p in parts]
    fold_ab_c = merge_histogram_states(merge_histogram_states(s[0], s[1], G), s[2], G)
    fold_c_ba = merge_histogram_states(s[2], merge_histogram_states(s[1], s[0], G), G)
    assert sorted(tuple(r) for r in fold_ab_c.collect()) == sorted(
        tuple(r) for r in fold_c_ba.collect()
    )


def test_null_values_carry_no_rank(spark):
    """NULLs are excluded at state build (engine NULL-ordering would otherwise
    poison the cumulative window; SQL percentile functions ignore NULLs too):
    quantiles over [1..4, NULL] equal quantiles over [1..4]."""
    with_null = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("a", 4), ("a", None)], "grp string, v long"
    )
    out = quantiles_from_state(histogram_state(with_null, G, "v"), G).collect()[0]
    assert (out.n_values, out.p50, out.p99) == (4, 2, 4)


def test_mad_outlier_hand_computed(spark):
    """[1..9] with one glitch row 1000: median 5, deviations of the clean
    rows ≤ 4, MAD 2 (deviations {4,3,2,1,0,1,2,3,4,995} → sorted middle is
    2), outliers = rows with |v-5| > 6 → just the glitch."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
        mad_outlier_stats,
    )

    df = spark.createDataFrame(
        [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]], "grp string, v long"
    )
    r = mad_outlier_stats(df, ["grp"], "v", k=3).collect()[0]
    assert (r.n_values, r.median, r.mad, r.n_outliers) == (10, 5, 2, 1)


def test_mad_is_robust_where_stddev_is_not(spark):
    """Replacing one row with an arbitrarily extreme value changes neither
    median nor MAD nor the outlier count — the property that makes the audit
    day-over-day comparable."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
        mad_outlier_stats,
    )

    base = [("a", v) for v in [10, 11, 12, 13, 14, 15, 16, 17, 18]]
    mild = spark.createDataFrame(base + [("a", 500)], "grp string, v long")
    wild = spark.createDataFrame(base + [("a", 50_000_000)], "grp string, v long")
    rm = mad_outlier_stats(mild, ["grp"], "v").collect()[0]
    rw = mad_outlier_stats(wild, ["grp"], "v").collect()[0]
    assert (rm.median, rm.mad, rm.n_outliers) == (rw.median, rw.mad, rw.n_outliers)


def test_mad_zero_flags_any_deviation(spark):
    """Degenerate group (> half the rows identical → MAD 0): every row that
    deviates at all is an outlier under |v-med| > k·0."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
        mad_outlier_stats,
    )

    df = spark.createDataFrame(
        [("a", v) for v in [7, 7, 7, 7, 7, 9, 3]], "grp string, v long"
    )
    r = mad_outlier_stats(df, ["grp"], "v").collect()[0]
    assert (r.median, r.mad, r.n_outliers) == (7, 0, 2)


def test_mad_excludes_nulls_and_groups_independent(spark):
    from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
        mad_outlier_stats,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("a", None), ("b", 100), ("b", 104), ("b", 108)],
        "grp string, v long",
    )
    out = {r.grp: r for r in mad_outlier_stats(df, ["grp"], "v").collect()}
    assert out["a"].n_values == 3 and out["a"].median == 2
    assert out["b"].median == 104 and out["b"].mad == 4 and out["b"].n_outliers == 0


def test_mad_from_merged_state_equals_full_rebuild(spark):
    """The nightly shape: folding increment histograms and auditing from the
    merged state gives bit-identical results to a full-corpus audit."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
        mad_outlier_stats,
        mad_outlier_stats_from_state,
    )

    df = spark.createDataFrame(
        [("a", v) for v in [1, 5, 5, 6, 9, 200]]
        + [("b", v) for v in [10, 20, 30, 40, 50]],
        "grp string, v long",
    )
    halves = [df.filter(F.col("v") % 2 == i) for i in range(2)]
    merged = merge_histogram_states(
        histogram_state(halves[0], G, "v"), histogram_state(halves[1], G, "v"), G
    )
    from_state = sorted(
        tuple(r) for r in mad_outlier_stats_from_state(merged, G).collect()
    )
    direct = sorted(tuple(r) for r in mad_outlier_stats(df, G, "v").collect())
    assert from_state == direct
