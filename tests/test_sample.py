"""Mergeable bottom-k priority-sample state laws (operators/sample.py):
bottom-k by a deterministic md5 priority is CLOSED under union, so
merge(build(A), build(B)) ≡ build(A ∪ B) row-exact for disjoint increments;
the state is invariant under input partitioning/order; NULL ids are excluded
at build; groups smaller than k keep everything; readout ranks are 1..k
dense and deterministic."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.operators.sample import (
    kmv_distinct_estimate,
    kmv_set_estimates,
    merge_sample_states,
    merge_weighted_sample_states,
    sample_from_state,
    sample_state,
    weighted_sample_from_state,
    weighted_sample_state,
)

G = ["grp"]


def _rows(spark, ids_by_grp):
    data = [(g, i) for g, ids in ids_by_grp.items() for i in ids]
    return spark.createDataFrame(data, "grp string, id long")


def _key(rows):
    return sorted((r.grp, r.id) for r in rows)


def test_merge_of_disjoint_splits_is_row_exact_vs_direct_build(spark):
    rng = random.Random(9)
    ids = rng.sample(range(10_000), 200)
    df = _rows(spark, {"a": ids[:120], "b": ids[120:]})
    a, b = df.filter(F.col("id") % 3 == 0), df.filter(F.col("id") % 3 != 0)
    merged = merge_sample_states(
        sample_state(a, G, "id", 7), sample_state(b, G, "id", 7), G, "id", 7
    )
    direct = sample_state(df, G, "id", 7)
    assert _key(merged.collect()) == _key(direct.collect())


def test_merge_is_associative_and_order_free(spark):
    rng = random.Random(17)
    df = _rows(spark, {"g": rng.sample(range(100_000), 300)})
    parts = [df.filter(F.col("id") % 3 == i) for i in range(3)]
    states = [sample_state(p, G, "id", 5) for p in parts]
    left = merge_sample_states(
        merge_sample_states(states[0], states[1], G, "id", 5), states[2], G, "id", 5
    )
    right = merge_sample_states(
        states[2], merge_sample_states(states[1], states[0], G, "id", 5), G, "id", 5
    )
    direct = sample_state(df, G, "id", 5)
    assert _key(left.collect()) == _key(right.collect()) == _key(direct.collect())


def test_state_is_partitioning_invariant(spark):
    df = _rows(spark, {"a": list(range(50)), "b": list(range(100, 130))})
    one = sample_state(df.coalesce(1), G, "id", 4)
    many = sample_state(df.repartition(13), G, "id", 4)
    assert _key(one.collect()) == _key(many.collect())


def test_groups_smaller_than_k_keep_all_rows_ranked_densely(spark):
    df = _rows(spark, {"tiny": [3, 1, 2], "big": list(range(100))})
    out = sample_from_state(sample_state(df, G, "id", 10), G, "id").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r)
    assert sorted(r.id for r in by_grp["tiny"]) == [1, 2, 3]
    assert sorted(r.rank for r in by_grp["tiny"]) == [1, 2, 3]
    assert len(by_grp["big"]) == 10
    assert sorted(r.rank for r in by_grp["big"]) == list(range(1, 11))


def test_null_ids_are_excluded_at_build(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2), ("a", None)], "grp string, id long"
    )
    out = sample_state(df, G, "id", 10).collect()
    assert sorted(r.id for r in out) == [1, 2]


def test_rollup_to_coarser_grain_equals_direct_coarse_build(spark):
    """Re-merging fine-grain states at a coarser grain (source×type → type)
    is the same union+re-rank algebra with fewer group cols, and equals a
    direct coarse build — the sample analogue of the quantile rollup law."""
    rng = random.Random(23)
    ids = rng.sample(range(50_000), 240)
    data = [("t%d" % (i % 2), "s%d" % (i % 3), i) for i in ids]
    df = spark.createDataFrame(data, "typ string, src string, id long")
    fine = sample_state(df, ["typ", "src"], "id", 6)
    rolled = merge_sample_states(
        fine.limit(0), fine, ["typ"], "id", 6
    ).drop("src")
    direct = sample_state(df.drop("src"), ["typ"], "id", 6)
    assert sorted((r.typ, r.id) for r in rolled.collect()) == sorted(
        (r.typ, r.id) for r in direct.collect()
    )


def test_kmv_estimate_envelope_and_small_group_exact_path(spark):
    """The same bottom-k state doubles as a KMV cardinality sketch: large
    groups estimate within the ~1/sqrt(k-2) envelope (deterministic here —
    the md5 draws are fixed), small groups (< k state rows) return their
    exact count flagged exact=true."""
    n, k = 5000, 256
    df = _rows(spark, {"big": list(range(n)), "small": list(range(9))})
    state = sample_state(df, G, "id", k)
    out = {r.grp: r for r in kmv_distinct_estimate(state, G, k).collect()}
    assert out["small"].exact and out["small"].distinct_est == 9
    assert not out["big"].exact
    assert abs(out["big"].distinct_est - n) / n < 3.0 / (k - 2) ** 0.5


def test_kmv_set_estimates_exact_path_below_k(spark):
    """When the merged union holds fewer than k elements both sides were
    complete, so union/intersection come back EXACT and flagged."""
    a = _rows(spark, {"g": [1, 2, 3, 4, 5]})
    b = _rows(spark, {"g": [4, 5, 6, 7]})
    sa = sample_state(a.withColumnRenamed("grp", "g2"), ["g2"], "id", 32)
    sb = sample_state(b.withColumnRenamed("grp", "g2"), ["g2"], "id", 32)
    out = kmv_set_estimates(sa, sb, ["g2"], "id", 32).collect()
    assert len(out) == 1
    r = out[0]
    assert r.exact and r.union_est == 7 and r.inter_est == 2


def test_kmv_set_estimates_envelope_on_large_overlap(spark):
    """Estimator path: two 4000-id sets sharing 2000 ids; union/intersection
    estimates land within the ~1/sqrt(k-2) envelope (deterministic — md5
    draws are fixed)."""
    k = 256
    a = _rows(spark, {"g": list(range(4000))})
    b = _rows(spark, {"g": list(range(2000, 6000))})
    sa, sb = sample_state(a, G, "id", k), sample_state(b, G, "id", k)
    r = kmv_set_estimates(sa, sb, G, "id", k).collect()[0]
    assert not r.exact
    assert abs(r.union_est - 6000) / 6000 < 3.0 / (k - 2) ** 0.5
    assert abs(r.inter_est - 2000) / 2000 < 6.0 / (k - 2) ** 0.5


def test_kmv_pairwise_matches_two_state_form_and_is_partition_invariant(spark):
    """The pairwise readout over a side-tagged state must agree with the
    explicit two-state form for every pair, regardless of input
    partitioning."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.sample import (
        kmv_pairwise_set_estimates,
    )

    rng = random.Random(7)
    pools = {s: rng.sample(range(3000), 400) for s in ("x", "y", "z")}
    k = 64
    tagged = spark.createDataFrame(
        [(s, i) for s, ids in pools.items() for i in ids], "side string, id long"
    )
    state = sample_state(tagged.repartition(11), ["side"], "id", k)
    pair_out = {
        (r.side_a, r.side_b): (r.union_est, r.inter_est, r.exact)
        for r in kmv_pairwise_set_estimates(state, [], "side", "id", k).collect()
    }
    assert set(pair_out) == {("x", "y"), ("x", "z"), ("y", "z")}
    for sa_name, sb_name in pair_out:
        sa = sample_state(
            tagged.filter(F.col("side") == sa_name).drop("side"), [], "id", k
        )
        sb = sample_state(
            tagged.filter(F.col("side") == sb_name).drop("side"), [], "id", k
        )
        two = kmv_set_estimates(sa, sb, [], "id", k).collect()[0]
        assert pair_out[(sa_name, sb_name)] == (
            two.union_est,
            two.inter_est,
            two.exact,
        )


def test_kmv_set_estimates_disjoint_sets_intersect_near_zero(spark):
    """Disjoint id sets must estimate an intersection of (near) zero — K∩
    counts actual shared hashes, so disjoint inputs give exactly 0."""
    k = 128
    a = _rows(spark, {"g": list(range(0, 3000))})
    b = _rows(spark, {"g": list(range(10_000, 13_000))})
    sa, sb = sample_state(a, G, "id", k), sample_state(b, G, "id", k)
    r = kmv_set_estimates(sa, sb, G, "id", k).collect()[0]
    assert r.inter_est == 0 and not r.exact


def _wrows(spark, rows):
    return spark.createDataFrame(rows, "grp string, id long, w long")


def test_weighted_merge_of_disjoint_splits_is_row_exact(spark):
    rng = random.Random(31)
    rows = [("a", i, rng.randint(1, 500)) for i in rng.sample(range(40_000), 150)]
    df = _wrows(spark, rows)
    a, b = df.filter(F.col("id") % 2 == 0), df.filter(F.col("id") % 2 == 1)
    merged = merge_weighted_sample_states(
        weighted_sample_state(a, G, "id", "w", 6),
        weighted_sample_state(b, G, "id", "w", 6),
        G, "id", 6,
    )
    direct = weighted_sample_state(df, G, "id", "w", 6)
    assert _key(merged.collect()) == _key(direct.collect())


def test_weighted_state_is_partitioning_invariant(spark):
    rows = [("a", i, (i * 7) % 100 + 1) for i in range(200)]
    df = _wrows(spark, rows)
    one = weighted_sample_state(df.coalesce(1), G, "id", "w", 5)
    many = weighted_sample_state(df.repartition(11), G, "id", "w", 5)
    assert _key(one.collect()) == _key(many.collect())


def test_overwhelming_weight_is_always_sampled_first(spark):
    """A row whose weight exceeds 65536× every other weight has priority
    ⌊w·65536/u⌋ ≥ w > 65536·w_other ≥ any other priority — it must be
    rank 1 regardless of its draw."""
    rows = [("a", i, 10) for i in range(50)] + [("a", 999, 10 * 65536 + 1)]
    out = weighted_sample_from_state(
        weighted_sample_state(_wrows(spark, rows), G, "id", "w", 3), G, "id"
    ).collect()
    assert {r.id: r.rank for r in out}[999] == 1


def test_weighted_excludes_null_ids_and_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", None, 10), ("a", 2, 0), ("a", 3, -5), ("a", 4, None)],
        "grp string, id long, w long",
    )
    out = weighted_sample_state(df, G, "id", "w", 10).collect()
    assert sorted(r.id for r in out) == [1]


def test_readout_rank_matches_md5_order(spark):
    """Rank 1 is the smallest (md5(id), id) — replayable in any engine; pin
    it against a driver-side recomputation of the same draw."""
    import hashlib

    ids = list(range(20))
    df = _rows(spark, {"g": ids})
    out = sorted(
        sample_from_state(sample_state(df, G, "id", 20), G, "id").collect(),
        key=lambda r: r.rank,
    )
    want = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert [r.id for r in out] == want


def test_kmv_set_estimates_reports_one_sided_and_empty_groups(spark):
    """A group present in only one state is a defined answer — union = that
    side's count/estimate, intersection = 0 — not a dropped row; and with no
    group columns, two empty states give the single (0, 0, exact) row."""
    a = spark.createDataFrame(
        [("only_a", i) for i in range(5)] + [("both", i) for i in range(3)],
        "g2 string, id long",
    )
    b = spark.createDataFrame(
        [("only_b", i) for i in range(100, 104)] + [("both", i) for i in range(2, 6)],
        "g2 string, id long",
    )
    sa = sample_state(a, ["g2"], "id", 32)
    sb = sample_state(b, ["g2"], "id", 32)
    out = {r.g2: r for r in kmv_set_estimates(sa, sb, ["g2"], "id", 32).collect()}
    assert set(out) == {"only_a", "only_b", "both"}
    assert (out["only_a"].union_est, out["only_a"].inter_est, out["only_a"].exact) == (5, 0, True)
    assert (out["only_b"].union_est, out["only_b"].inter_est, out["only_b"].exact) == (4, 0, True)
    assert (out["both"].union_est, out["both"].inter_est, out["both"].exact) == (6, 1, True)

    nothing = spark.createDataFrame([], "id long")
    sn = sample_state(nothing, [], "id", 8)
    r = kmv_set_estimates(sn, sn, [], "id", 8).collect()
    assert len(r) == 1 and (r[0].union_est, r[0].inter_est, r[0].exact) == (0, 0, True)


def test_merge_is_idempotent_under_replayed_and_overlapping_increments(spark):
    """ADVICE r9: a replayed/overlapping increment must not let one id occupy
    two of the k slots. merge(S, S) ≡ S, and merging overlapping builds ≡
    building the union — for both the uniform and the weighted state."""
    rng = random.Random(23)
    ids = rng.sample(range(50_000), 120)
    df = _rows(spark, {"a": ids[:70], "b": ids[70:]})
    s = sample_state(df, G, "id", 5)
    replay = merge_sample_states(s, s, G, "id", 5)
    assert _key(replay.collect()) == _key(s.collect())
    # overlapping increments: halves share ids 30..89
    a = df.filter(F.col("id").isin(ids[:90]))
    b = df.filter(F.col("id").isin(ids[30:]))
    merged = merge_sample_states(
        sample_state(a, G, "id", 5), sample_state(b, G, "id", 5), G, "id", 5
    )
    assert _key(merged.collect()) == _key(s.collect())


def test_weighted_merge_is_idempotent_under_replay(spark):
    rng = random.Random(29)
    data = [("g", i, rng.randint(1, 500)) for i in rng.sample(range(50_000), 100)]
    df = spark.createDataFrame(data, "grp string, id long, w long")
    s = weighted_sample_state(df, G, "id", "w", 6)
    replay = merge_weighted_sample_states(s, s, G, "id", 6)
    key = lambda rows: sorted((r.grp, r.id, r.w) for r in rows)  # noqa: E731
    assert key(replay.collect()) == key(s.collect())
