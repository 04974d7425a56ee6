"""Mergeable Bloom-state laws (operators/bloom.py): no false negatives (the
prune-superset guarantee the exact verify relies on), the bit-or merge law
(merged increments ≡ single full build, row-exact), geometry-drift loudness,
and expr-vs-DataFrame probe agreement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain_expr,
    bloom_semi_probe,
    merge_bloom_states,
)


def _members(spark, n=200, salt=0):
    return spark.range(n).select(
        F.concat(F.lit(f"member{salt}_"), F.col("id").cast("string")).alias("v")
    )


def test_no_false_negatives_every_member_passes(spark):
    m = _members(spark)
    state = bloom_build(m, "v").collect()
    assert m.filter(bloom_might_contain_expr(state, "v")).count() == m.count()


def test_prune_is_superset_and_exact_verify_restores_equality(spark):
    members = _members(spark, 300)
    state = bloom_build(members, "v").collect()
    probes = _members(spark, 300).union(
        spark.range(3000).select(
            F.concat(F.lit("absent_"), F.col("id").cast("string")).alias("v")
        )
    )
    cand = probes.filter(bloom_might_contain_expr(state, "v"))
    n_cand, n_true = cand.count(), 300
    assert n_cand >= n_true  # superset: every member survives
    # exact verify kills the FPs → exactly the true membership
    verified = cand.join(members, "v")
    assert verified.count() == n_true
    # sizing sanity (2^17 bits, k=5, 300 keys): FP count over 3000 absents is
    # essentially zero; allow a loose bound so the test never flakes
    assert n_cand - n_true < 30


def test_merge_of_increment_states_is_row_exact_vs_full_build(spark):
    a, b = _members(spark, 150, salt=1), _members(spark, 150, salt=2)
    merged = merge_bloom_states(bloom_build(a, "v"), bloom_build(b, "v"))
    direct = bloom_build(a.union(b), "v")
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want


def test_merge_is_idempotent_and_commutative(spark):
    a, b = _members(spark, 100, salt=1), _members(spark, 100, salt=2)
    sa, sb = bloom_build(a, "v"), bloom_build(b, "v")
    ab = sorted(tuple(r) for r in merge_bloom_states(sa, sb).collect())
    ba = sorted(tuple(r) for r in merge_bloom_states(sb, sa).collect())
    aa = sorted(tuple(r) for r in merge_bloom_states(sa, sa).collect())
    assert ab == ba
    assert aa == sorted(tuple(r) for r in sa.collect())  # replay is a no-op


def test_geometry_mismatch_raises_even_with_disjoint_words(spark):
    a = bloom_build(_members(spark, 50, salt=1), "v", m_bits=1 << 12)
    b = bloom_build(_members(spark, 50, salt=2), "v", m_bits=1 << 13)
    with pytest.raises(Exception, match="geometry mismatch"):
        merge_bloom_states(a, b).collect()
    with pytest.raises(ValueError, match="inconsistent geometry"):
        bloom_might_contain_expr(a.unionByName(b).collect(), "v")


def test_empty_state_contains_nothing(spark):
    empty = bloom_build(_members(spark, 10).limit(0), "v")
    assert bloom_semi_probe(_members(spark, 10), empty, "v").count() == 0
    expr = bloom_might_contain_expr(empty.collect(), "v")
    assert _members(spark, 10).filter(expr).count() == 0


def test_semi_probe_agrees_with_literal_expr_path(spark):
    members = _members(spark, 120)
    state_df = bloom_build(members, "v")
    state = state_df.collect()
    probes = _members(spark, 400)  # 120 members + 280 absents
    via_expr = sorted(
        r["v"] for r in probes.filter(bloom_might_contain_expr(state, "v")).collect()
    )
    via_join = sorted(r["v"] for r in bloom_semi_probe(probes, state_df, "v").collect())
    assert via_expr == via_join


def test_build_rejects_bad_geometry(spark):
    m = _members(spark, 10)
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(m, "v", m_bits=100)
    with pytest.raises(ValueError, match="k must be positive"):
        bloom_build(m, "v", k=0)


def test_partitioned_build_equals_per_key_builds(spark):
    """bloom_build_partitioned law: each key's slice of the one-scan grouped
    build IS the state bloom_build produces from that key's subset."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.bloom import (
        bloom_build_partitioned,
    )

    m = _members(spark, 200).withColumn(
        "day", (F.length("v") + F.crc32("v") % 3).cast("int")
    )
    parts = bloom_build_partitioned(m, "v", "day", m_bits=1 << 12, k=4)
    for day in [r.day for r in m.select("day").distinct().collect()]:
        got = sorted(
            tuple(r)
            for r in parts.filter(F.col("part") == day).drop("part").collect()
        )
        want = sorted(
            tuple(r)
            for r in bloom_build(
                m.filter(F.col("day") == day), "v", m_bits=1 << 12, k=4
            ).collect()
        )
        assert got == want, f"day {day}"


def test_semi_probe_preserves_duplicate_rows(spark):
    """bloom_semi_probe is a FILTER, not a set operation: duplicate member
    rows in the probe input must survive as duplicates (the original
    explode + groupBy-over-all-columns shape silently collapsed them)."""
    members = _members(spark, 20)
    state_df = bloom_build(members, "v")
    doubled = members.union(members)
    out = bloom_semi_probe(doubled, state_df, "v")
    assert out.count() == 2 * members.count()
    assert sorted(r.v for r in out.collect()) == sorted(
        r.v for r in doubled.collect()
    )
