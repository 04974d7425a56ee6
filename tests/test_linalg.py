"""Embedding-matrix diagnostics: the dimension-correlation audit must flag a
planted duplicated dimension, the power iteration must recover a planted
dominant axis, and both must be deterministic under repartitioning (the
matrix entries are rounded before anything consumes them)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.operators.linalg import (
    dim_cosine_pairs,
    dominant_direction,
    dominant_direction_outliers,
    second_moment,
)

DIM = 8


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)], "vec_id long, embedding array<double>"
    )


def _random_rows(n, seed=7, dup=None, spike=None):
    """Isotropic noise; dup=(a, b) copies dim a into dim b; spike=(axis, ids)
    adds a large component on one axis for the given row ids."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        v = [rng.gauss(0.0, 0.1) for _ in range(DIM)]
        if dup is not None:
            v[dup[1]] = v[dup[0]]
        if spike is not None and i in spike[1]:
            v[spike[0]] += 5.0
        rows.append(v)
    return rows


def test_dim_correlation_flags_planted_duplicate_dimension(spark):
    emb = _emb(spark, _random_rows(60, dup=(2, 5)))
    top = dim_cosine_pairs(emb, DIM, k_top=5).collect()
    assert top[0].j == 2 and top[0].k == 5 and top[0].rank == 1
    assert abs(top[0].cos - 1.0) < 1e-3  # identical columns → cosine 1
    assert all(abs(r.cos) < 0.9 for r in top[1:])  # noise pairs stay low


def test_second_moment_matches_numpy_reference(spark):
    import numpy as np

    rows = _random_rows(40, seed=3)
    emb = _emb(spark, rows)
    got = {(r.j, r.k): r.s for r in second_moment(emb, DIM).collect()}
    want = np.array(rows).T @ np.array(rows)
    assert len(got) == DIM * DIM
    for (j, k), s in got.items():
        assert math.isclose(s, round(want[j][k], 4), abs_tol=2e-4)


def test_dominant_direction_recovers_planted_axis(spark):
    emb = _emb(spark, _random_rows(80, spike=(3, set(range(0, 80, 4)))))
    s_rows = [(r.j, r.k, r.s) for r in second_moment(emb, DIM).collect()]
    v = dominant_direction(s_rows, DIM)
    # normalized by max-|component|: the planted axis carries the ±1
    assert abs(abs(v[3]) - 1.0) < 1e-9
    assert all(abs(v[j]) < 0.2 for j in range(DIM) if j != 3)
    # the spiked rows load heaviest
    top = dominant_direction_outliers(emb, DIM, k_top=10).collect()
    assert all(r.vec_id % 4 == 0 for r in top)
    assert [r.rank for r in top] == list(range(1, 11))


def test_linalg_outputs_partitioning_invariant(spark):
    rows = _random_rows(50, seed=11, dup=(1, 6))
    emb = _emb(spark, rows)
    a = dim_cosine_pairs(emb, DIM, k_top=5).collect()
    b = dim_cosine_pairs(emb.repartition(7), DIM, k_top=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    c = dominant_direction_outliers(emb, DIM, k_top=5).collect()
    d = dominant_direction_outliers(emb.repartition(5), DIM, k_top=5).collect()
    assert [tuple(r) for r in c] == [tuple(r) for r in d]


def test_linalg_empty_corpus_yields_empty_reports(spark):
    emb = _emb(spark, []).filter("vec_id is not null")
    assert dim_cosine_pairs(emb, DIM, k_top=5).count() == 0
    assert dominant_direction_outliers(emb, DIM, k_top=5).count() == 0
    # the direction helper degrades to the seed basis vector
    assert dominant_direction([], DIM) == [1.0] + [0.0] * (DIM - 1)


def test_dead_dimension_cosines_pin_to_zero_not_null(spark):
    """A zeroed-out dimension's pair cosines are undefined — pinned to 0.0
    (Spark would otherwise yield NaN/Inf where DuckDB yields NULL, and the
    two sort differently); real correlated pairs still outrank them."""
    rows = _random_rows(50, seed=5, dup=(1, 6))
    rows = [[0.0 if j == 3 else x for j, x in enumerate(v)] for v in rows]
    top = dim_cosine_pairs(spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)], "vec_id long, embedding array<double>"
    ), DIM, k_top=DIM * (DIM - 1) // 2).collect()
    assert top[0].j == 1 and top[0].k == 6  # the planted duplicate still leads
    dead = [r for r in top if r.j == 3 or r.k == 3]
    assert len(dead) == DIM - 1
    assert all(r.cos == 0.0 for r in dead)  # pinned, never NULL/NaN


def test_degenerate_matrix_resets_to_seed_per_step(spark):
    """All-tiny corpus: every matrix entry rounds to 0 → each matvec is zero
    → the iteration resets to the seed basis vector each step (the per-step
    rule the SQL twin replays), and the scorer ranks by |x_0|."""
    rows = [[1e-4 * ((i + j) % 3 - 1) for j in range(DIM)] for i in range(20)]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)], "vec_id long, embedding array<double>"
    )
    s_rows = [(r.j, r.k, r.s) for r in second_moment(emb, DIM).collect()]
    assert all(s == 0.0 for _, _, s in s_rows)
    assert dominant_direction(s_rows, DIM) == [1.0] + [0.0] * (DIM - 1)
    top = dominant_direction_outliers(emb, DIM, k_top=5).collect()
    assert [r.rank for r in top] == [1, 2, 3, 4, 5]
    assert all(abs(r.proj - round(rows[r.vec_id][0], 4)) < 1e-12 for r in top)


def test_partial_gram_equals_agg_second_moment(spark):
    """The mapInPandas large-d path must reproduce the d-group agg matrix
    exactly at the rounding grid — partial-sum order differs (numpy pairwise
    vs codegen sequential), which is what the 4dp rounding absorbs — and be
    partitioning-invariant."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.linalg import (
        second_moment_partial_gram,
    )

    rows = _random_rows(70, seed=21, dup=(0, 4))
    emb = _emb(spark, rows)
    agg = {(r.j, r.k): r.s for r in second_moment(emb, DIM).collect()}
    pg = {(r.j, r.k): r.s for r in second_moment_partial_gram(emb, DIM).collect()}
    assert agg == pg
    pg7 = {
        (r.j, r.k): r.s
        for r in second_moment_partial_gram(emb.repartition(7), DIM).collect()
    }
    assert pg7 == agg
    # empty corpus: typed empty matrix, no crash in the Arrow path
    empty = _emb(spark, []).filter("vec_id is not null")
    assert second_moment_partial_gram(empty, DIM).count() == 0


def test_consumers_are_gram_mode_invariant(spark):
    """The registered diagnostics must return IDENTICAL rows through either
    matrix path — the auto-route past GRAM_AUTO_DIM_THRESHOLD must be
    invisible in the results (both paths land on the same 4dp grid)."""
    rows = _random_rows(60, seed=33, dup=(1, 5), spike=(2, {4, 9}))
    emb = _emb(spark, rows)
    for fn, kw in (
        (dim_cosine_pairs, dict(k_top=10)),
        (dominant_direction_outliers, dict(k_top=8)),
    ):
        ex = sorted(map(tuple, fn(emb, DIM, gram_mode="explode", **kw).collect()))
        pg = sorted(map(tuple, fn(emb, DIM, gram_mode="partial_gram", **kw).collect()))
        assert ex == pg, fn.__name__


def test_gram_mode_auto_routes_by_dim_and_validates(monkeypatch):
    import pytest

    from airflow_courier_payout_ledger_pipeline_spark.operators import linalg

    assert linalg._resolve_gram_mode("auto", linalg.GRAM_AUTO_DIM_THRESHOLD) == "explode"
    assert (
        linalg._resolve_gram_mode("auto", linalg.GRAM_AUTO_DIM_THRESHOLD + 1)
        == "partial_gram"
    )
    assert linalg._resolve_gram_mode("explode", 10_000) == "explode"
    with pytest.raises(ValueError, match="gram_mode"):
        linalg._resolve_gram_mode("agg", 8)


def test_second_moment_raises_past_explode_budget(spark, monkeypatch):
    """The explode path must fail LOUDLY at plan-construction time past its
    d budget (the similarity.py raise-don't-stall rule), while the auto
    consumer routes to the partial gram and still answers."""
    import pytest

    from airflow_courier_payout_ledger_pipeline_spark.operators import linalg

    rows = _random_rows(30, seed=5)
    emb = _emb(spark, rows)
    monkeypatch.setattr(linalg, "GRAM_EXPLODE_DIM_BUDGET", DIM - 1)
    with pytest.raises(ValueError, match="explode-path budget"):
        linalg.second_moment(emb, DIM)
    # the auto consumer routes around the ceiling (threshold below the dim)
    monkeypatch.setattr(linalg, "GRAM_AUTO_DIM_THRESHOLD", DIM - 1)
    got = linalg.dim_cosine_pairs(emb, DIM, k_top=3).collect()
    assert len(got) == 3


def test_projection_array_fold_is_bit_identical_to_unrolled(spark, monkeypatch):
    """Past PROJECTION_UNROLL_BUDGET the projection becomes one
    aggregate(zip_with(...)) node — same left-assoc add order, so the scores
    must be BIT-identical, not merely close."""
    from airflow_courier_payout_ledger_pipeline_spark.operators import linalg

    rows = _random_rows(50, seed=11, spike=(3, {1, 7}))
    emb = _emb(spark, rows)
    unrolled = sorted(map(tuple, linalg.dominant_direction_outliers(emb, DIM, k_top=10).collect()))
    monkeypatch.setattr(linalg, "PROJECTION_UNROLL_BUDGET", DIM - 1)
    folded = sorted(map(tuple, linalg.dominant_direction_outliers(emb, DIM, k_top=10).collect()))
    assert unrolled == folded
