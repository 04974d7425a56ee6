"""Distributed PCA for embedding columns: dimensionality reduction at corpus
scale (the standard pre-ANN compression step — halving dims halves every
downstream index, shuffle, and distance computation).

Scale shape — the classic two-phase moment sweep:

1. **Distributed moment pass**: each Arrow batch contributes a d×d Gram-matrix
   partial (``X.T @ X``), a column-sum vector, and a count — numpy matmul over
   the whole batch, no per-row Python. The partials reduce to ONE d²+d+1-wide
   row; only that scalar-sized state ever reaches the driver (d=1024 → 8 MB —
   independent of corpus size).
2. **Driver-side spectral step**: covariance = Gram/n − mean·meanᵀ, then
   ``numpy.linalg.eigh`` on the d×d symmetric matrix — O(d³) on one machine,
   nothing distributed to schedule. Sign convention: each component's
   largest-|coordinate| entry is made positive, so the decomposition is
   DETERMINISTIC (eigh returns an arbitrary sign per vector).
3. **Map-side projection**: components broadcast into a ``mapInPandas``
   projection (one matmul per Arrow batch); zero shuffles, fused into the scan.

The spectral laws (orthonormality, descending explained variance, projection
= centered·Wᵀ, reconstruction error = tail eigenvalue mass) are pinned in
``tests/test_reduce.py`` — eigendecompositions have no cross-engine oracle
(eigenvector sign/order and LAPACK rounding differ), the same evidence class
as ``operators/sketch.py``.

No reference twin: the reference pipeline has no vector surface; this is part
of the 100 TB training-data extension (SURVEY.md north-star), feeding the
ANN/near-dup family (``operators/similarity.py``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import numpy as np
    import pandas as pd


def embedding_moments(emb: DataFrame, vec_col: str = "embedding"):
    """One distributed pass → (n, mean vector, covariance matrix) as numpy.

    ONE partial per PARTITION (not per Arrow batch): the generator accumulates
    Gram (d×d), column sums, and count across the partition's batches in numpy
    and yields a single d²+d+1-wide row — so the downstream explode/aggregate
    handles exactly (#partitions × (d²+d+1)) values however many batches a
    partition holds. The reduce folds each position's partials in SORTED
    partition-id order (array_sort + ordered fold), because float addition is
    not associative: an order-free SUM would differ by ULPs between runs as
    shuffle fetch order varies, and with a near-flat eigenspectrum ULP noise
    can reorder near-equal eigenvalues — the determinism contract is
    bit-stable moments GIVEN deterministic input partitioning (a file scan).
    Driver transfer: d²+d+1 doubles (d=1024 → ~8 MB), corpus-size-independent.
    (A flat row of d² sum-expressions would not even codegen at d≈1024.)"""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    first = emb.select(F.size(vec_col)).first()
    if first is None:
        raise ValueError("embedding_moments: input DataFrame is empty")
    d = first[0]
    if d is None or d < 1:
        raise ValueError(
            f"embedding_moments: first row's {vec_col!r} is NULL/empty (size={d})"
        )

    def partials(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        gram = np.zeros((d, d), dtype=np.float64)
        sums = np.zeros(d, dtype=np.float64)
        n = 0
        pid = None
        for b in batches:
            if not len(b):
                continue
            if pid is None:
                pid = int(b["pid"].iloc[0])
            # Loud-failure contract (test_empty_and_null_inputs_fail_loudly):
            # the first-row guard above only covers row 0 — a NULL or ragged
            # vector deeper in the corpus would otherwise surface as an opaque
            # numpy stack/astype error inside this task.
            if b[vec_col].isna().any():
                raise ValueError(
                    f"embedding_moments: NULL {vec_col!r} encountered mid-corpus "
                    "(drop or impute NULL embeddings upstream)"
                )
            lens = b[vec_col].map(len)
            if (lens != d).any():
                raise ValueError(
                    f"embedding_moments: ragged {vec_col!r} (expected dim {d}, "
                    f"saw {sorted(set(lens[lens != d]))[:5]})"
                )
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            gram += x.T @ x
            sums += x.sum(axis=0)
            n += len(x)
        if n:
            yield pd.DataFrame(
                {
                    "pid": [pid],
                    "vals": [[float(n), *sums.tolist(), *gram.ravel().tolist()]],
                }
            )

    part = emb.select(vec_col, F.spark_partition_id().alias("pid")).mapInPandas(
        partials, "pid int, vals array<double>"
    )
    flat = part.select("pid", F.posexplode("vals").alias("pos", "val"))
    rows = (
        flat.groupBy("pos")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("pid", "val"))),
                F.lit(0.0),
                lambda acc, s: acc + s["val"],
            ).alias("v")
        )
        .collect()
    )
    acc = np.zeros(1 + d + d * d, dtype=np.float64)
    for r in rows:
        acc[r["pos"]] = r["v"]
    n = int(acc[0])
    if n == 0:
        raise ValueError("embedding_moments: no non-empty partitions")
    mean = acc[1 : 1 + d] / n
    gram = acc[1 + d :].reshape(d, d)
    cov = gram / n - np.outer(mean, mean)
    return n, mean, cov


def pca_components(emb: DataFrame, k: int, vec_col: str = "embedding"):
    """Top-k principal components (k×d, orthonormal rows, deterministic sign)
    + their explained variances (descending) + the mean vector."""
    import numpy as np  # noqa: PLC0415

    _, mean, cov = embedding_moments(emb, vec_col)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k×d
    # deterministic sign: largest-|coordinate| entry of each component positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, vals[order], mean


def project_embeddings(
    emb: DataFrame,
    components: "np.ndarray",
    mean: "np.ndarray",
    vec_col: str = "embedding",
    out_col: str = "reduced",
) -> DataFrame:
    """Map-side projection: reduced = (x − mean) · Wᵀ, one numpy matmul per
    Arrow batch, zero shuffles. Carries every non-vector column through."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    comps = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)
    passthrough = [c for c in emb.columns if c != vec_col]

    def proj(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            if not len(b):
                continue
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            red = (x - mu) @ comps.T
            out = b[passthrough].copy()
            out[out_col] = list(red.astype(np.float32))
            yield out

    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    out_schema = StructType(
        [f for f in emb.schema.fields if f.name != vec_col]
        + [StructField(out_col, ArrayType(FloatType()))]
    )
    return emb.mapInPandas(proj, out_schema)
