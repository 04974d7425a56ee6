"""Distributed PCA laws (operators/reduce.py) against numpy ground truth on the
real embeddings testdata: moment-pass exactness, spectral properties
(orthonormality, descending variance), deterministic sign, map-side projection
equivalence, and reconstruction-error = tail eigenvalue mass."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.operators.reduce import (
    embedding_moments,
    pca_components,
    project_embeddings,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def x(emb):
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_distributed_moments_match_numpy(emb, x):
    n, mean, cov = embedding_moments(emb)
    assert n == len(x)
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(
        cov, np.cov(x, rowvar=False, bias=True), rtol=1e-7, atol=1e-10
    )


def test_components_orthonormal_descending_deterministic(emb):
    comps, vals, _ = pca_components(emb, k=8)
    assert comps.shape[0] == 8
    np.testing.assert_allclose(comps @ comps.T, np.eye(8), atol=1e-9)
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(len(vals) - 1))
    # deterministic sign convention: the largest-|coordinate| entry is positive
    for row in comps:
        assert row[int(np.argmax(np.abs(row)))] > 0
    # recompute from scratch — bit-stable end to end
    comps2, vals2, _ = pca_components(emb, k=8)
    np.testing.assert_array_equal(comps, comps2)
    np.testing.assert_array_equal(vals, vals2)


def test_projection_matches_numpy_and_carries_columns(emb, x):
    comps, _, mean = pca_components(emb, k=8)
    out = project_embeddings(emb, comps, mean)
    assert set(out.columns) == {"vec_id", "label", "reduced"}
    rows = out.select("vec_id", "reduced").collect()
    rows.sort(key=lambda r: r["vec_id"])
    got = np.array([r["reduced"] for r in rows], dtype=np.float64)
    expected = (x - x.mean(axis=0)) @ comps.T
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)  # f32 storage
    assert out.count() == len(x)


def test_reconstruction_error_equals_tail_eigenvalue_mass(emb, x):
    """Mean squared reconstruction error of rank-k PCA = sum of the dropped
    eigenvalues — the spectral law that makes explained-variance a budget."""
    n, mean, cov = embedding_moments(emb)
    all_vals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    k = 8
    comps, vals, _ = pca_components(emb, k=k)
    centered = x - mean
    recon = (centered @ comps.T) @ comps
    mse = float(((centered - recon) ** 2).sum(axis=1).mean())
    np.testing.assert_allclose(mse, float(all_vals[k:].sum()), rtol=1e-6)


def test_projection_is_zero_shuffle(emb):
    comps, _, mean = pca_components(emb, k=4)
    plan = (
        project_embeddings(emb, comps, mean)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_pca_reduced_ann_recall_against_full_dim(spark, emb):
    """Composition with the similarity family: exact top-10 in the rank-32
    PCA space must recover a solid fraction of the full-64-dim top-10 —
    the compress-then-search shape that halves every downstream ANN cost.
    Deterministic end to end (fixed data, deterministic decomposition), so
    the measured recall is a constant (0.490 on this testdata); the bound has
    headroom below it. The synthetic embeddings are near-isotropic (flat
    eigenspectrum — rank 32 of 64 keeps only ~60% variance), which is the
    WORST case for PCA recall; real text embeddings concentrate variance in
    far fewer directions and recover much more."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        brute_force_topk,
    )

    comps, _, mean = pca_components(emb, k=32)
    reduced = project_embeddings(emb, comps, mean).withColumnRenamed(
        "reduced", "embedding"
    )
    queries_full = emb.filter(F.col("vec_id") < 20)
    queries_red = reduced.filter(F.col("vec_id") < 20)
    truth = brute_force_topk(emb, queries_full, k=10)
    approx = brute_force_topk(reduced, queries_red, k=10)
    t = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(t & a) / len(t)
    assert recall >= 0.4, f"recall@10 in PCA space collapsed: {recall:.3f}"


def test_moments_deterministic_across_repartitionings(spark, emb, x):
    """The ordered-fold reduce makes the moments bit-stable for a FIXED
    partitioning, and within float tolerance across different partition
    counts (float addition order differs, values must still agree)."""
    n1, m1, c1 = embedding_moments(emb.repartition(7, "vec_id"))
    n1b, m1b, c1b = embedding_moments(emb.repartition(7, "vec_id"))
    np.testing.assert_array_equal(m1, m1b)
    np.testing.assert_array_equal(c1, c1b)  # bit-stable: same partitioning
    n2, m2, c2 = embedding_moments(emb.repartition(3, "vec_id"))
    assert n1 == n2 == len(x)
    np.testing.assert_allclose(c1, c2, rtol=1e-9, atol=1e-12)


def test_empty_and_null_inputs_fail_loudly(spark, emb):
    with pytest.raises(ValueError, match="empty"):
        embedding_moments(emb.filter(F.col("vec_id") < 0))
    nulled = emb.withColumn(
        "embedding", F.when(F.lit(True), F.lit(None).cast("array<float>"))
    )
    with pytest.raises(ValueError, match="NULL"):
        embedding_moments(nulled)
    # mid-corpus defects: first row valid, a LATER row NULL / wrong dimension —
    # must still be the module's loud ValueError, not an opaque numpy error
    # inside a task (advisor finding on the first-row-only guard)
    mid_null = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 3, F.lit(None).cast("array<float>")).otherwise(
            F.col("embedding")
        ),
    ).repartition(1)
    with pytest.raises(Exception, match="NULL"):
        embedding_moments(mid_null)
    ragged = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 3, F.slice("embedding", 1, 2)).otherwise(
            F.col("embedding")
        ),
    ).repartition(1)
    with pytest.raises(Exception, match="ragged"):
        embedding_moments(ragged)


def test_projection_with_no_passthrough_columns(spark, emb):
    comps, _, mean = pca_components(emb, k=4)
    out = project_embeddings(emb.select("embedding"), comps, mean)
    assert out.columns == ["reduced"]
    assert out.count() == emb.count()
