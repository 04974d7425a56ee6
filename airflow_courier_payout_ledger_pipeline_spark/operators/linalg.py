"""Embedding-matrix diagnostics: the uncentered second-moment (gram) matrix,
the dimension-correlation audit, and the dominant direction via power
iteration — the linear-algebra post-processing primitives a training-data
pipeline runs over its embedding columns (detect collapsed/duplicated encoder
dimensions after a model update; score documents by their projection on the
dominant direction, the "All-but-the-Top" / Arora-style common-component
diagnostic).

Scale shape (all three): ONE corpus pass builds the d×d second-moment matrix —
posexplode to dimension grain (d× inflation of a d-float payload, the same
spread class as shingling) and a d-group conditional aggregation whose
map-side partials compact the exchange to d rows × d columns per map task; at
d=64 the matrix is 4096 doubles, a bounded driver artifact in the same class
as a trained codebook (k·dim literal budget). Everything downstream of the
matrix — correlation pairs, the power iteration, the projection scoring — is
driver-bounded or a map-side broadcast expression; the corpus is never
shuffled. Read count: the correlation audit reads the corpus ONCE (the
matrix pass); the outlier scorer reads it TWICE — once for the matrix, once
for the map-side projection scan.

Cross-engine float discipline (the repo's oracle rules): matrix entries are
double sums over the corpus, where summation ORDER differs between engines —
both sides round S to 4 decimals (entries are O(n·x²) ≈ O(10²) here, double
noise ~1e-12, so rounding is engine-stable), and every later step consumes
only ROUNDED values. The power iteration normalizes by the max-|component|
(ties to the smallest index) and re-rounds to 6 decimals each step, so both
engines iterate on bit-identical vectors; Python rounds HALF_UP via Decimal
to match Spark's F.round / DuckDB's round (half away from zero), never the
built-in banker's round().
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: past this d the explode-path gram loses: posexplode carries the FULL
#: vector per dimension row (a d²-per-input-row payload inflation) and the
#: agg is d+1 columns wide — the Arrow partial-gram reads the corpus at row
#: grain instead. ``gram_mode="auto"`` consumers route past this threshold
#: (the exact analogue of ``similarity._resolve_assign_mode`` routing past
#: UNROLLED_LITERAL_BUDGET). Measured r17 (sf0.1, d=64): the partial-gram
#: pass runs the dimension-correlation audit 1.26 s → 0.59 s and the
#: dominant-direction scorer 1.56 s → 0.92 s with IDENTICAL output (the 4dp
#: grid both paths land on, pinned in tests/test_linalg.py) — one numpy
#: ``X.T @ X`` per batch beats a d+1-column-wide codegen agg well below the
#: old 128 threshold, so auto now routes d>32 to the partial gram. The
#: explode path remains the zero-Python-boundary form for small d.
GRAM_AUTO_DIM_THRESHOLD = 32

#: hard ceiling for the explode path itself (mirrors
#: similarity.UNROLLED_LITERAL_BUDGET's raise-don't-stall rule): past this,
#: ``second_moment`` RAISES at plan-construction time — a d-hundreds explode
#: would quietly build a plan-sized expression tree and a d²-inflated
#: exchange where ``second_moment_partial_gram`` runs the same contract in
#: one row-grain pass.
GRAM_EXPLODE_DIM_BUDGET = 256

#: past this d the unrolled projection fold (d expression nodes in the plan)
#: moves to a single array-literal ``aggregate(zip_with(...))`` fold — the
#: IDENTICAL left-assoc IEEE add order (acc starts at 0.0, terms in index
#: order), O(1) plan nodes, one-parse literal (functions/literals.array_lit).
PROJECTION_UNROLL_BUDGET = 128


def _resolve_gram_mode(gram_mode: str, dim: int) -> str:
    """'auto' → 'explode' at-or-under GRAM_AUTO_DIM_THRESHOLD, 'partial_gram'
    past it — the ``_resolve_assign_mode`` pattern: a silent 10× dimension
    scale-up must land on a working path, never a d²-inflated exchange."""
    if gram_mode not in ("auto", "explode", "partial_gram"):
        raise ValueError(
            f"gram_mode must be auto|explode|partial_gram, got {gram_mode!r}"
        )
    if gram_mode != "auto":
        return gram_mode
    return "explode" if dim <= GRAM_AUTO_DIM_THRESHOLD else "partial_gram"


def _gram(
    emb: DataFrame, dim: int, vec_col: str, round_dp: int, gram_mode: str
) -> DataFrame:
    """The (j, k, s) matrix through the resolved path — both paths share the
    output contract and the 4dp rounding grid (equality pinned in
    tests/test_linalg.py), so consumers are mode-agnostic."""
    if _resolve_gram_mode(gram_mode, dim) == "explode":
        return second_moment(emb, dim, vec_col=vec_col, round_dp=round_dp)
    return second_moment_partial_gram(emb, dim, vec_col=vec_col, round_dp=round_dp)


def second_moment(
    emb: DataFrame, dim: int, vec_col: str = "embedding", round_dp: int = 4
) -> DataFrame:
    """(j, k, s): the uncentered second-moment matrix S_jk = Σ_rows x_j·x_k
    over all dim² (j, k) pairs, 0-based, rounded to ``round_dp`` decimals
    (both engines round the order-sensitive double sum — see module
    docstring). One corpus pass: posexplode to (j, x_j, full vector) and a
    d-group aggregation of d conditional sums; the exchange carries d rows of
    d+1 columns per map task, never the corpus.

    Products run at DOUBLE precision regardless of the stored element type —
    the oracle casts ``embedding::DOUBLE[]`` before multiplying, and a
    float32 per-term truncation would drift past the 4dp grid as the corpus
    grows even though it slips under it at test sizes. NULL vectors are
    dropped (posexplode of NULL yields nothing) — the stated row contract;
    vectors must be fixed-width with non-NULL elements.

    Validity bound: RAISES past GRAM_EXPLODE_DIM_BUDGET (the
    ``_check_literal_budget`` rule) — a d-hundreds explode quietly builds a
    d+1-column-wide agg over a d²-inflated exchange;
    ``second_moment_partial_gram`` is the same contract in one row-grain
    pass, and the ``gram_mode="auto"`` consumers route there well before
    this ceiling."""
    if dim > GRAM_EXPLODE_DIM_BUDGET:
        raise ValueError(
            f"second_moment: dim = {dim} exceeds the explode-path budget "
            f"({GRAM_EXPLODE_DIM_BUDGET}) — the posexplode carries the full "
            "vector per dimension row (d² payload inflation) and the agg is "
            "d+1 columns wide at this size. Use second_moment_partial_gram "
            "(same (j, k, s) contract, one row-grain Arrow pass), or call "
            "the consumers with gram_mode='auto'/'partial_gram'."
        )
    vec = F.col(vec_col).cast("array<double>")
    x = emb.where(F.col(vec_col).isNotNull()).select(
        F.posexplode(vec).alias("j", "xj"),
        vec.alias("__v"),
    )
    g = x.groupBy("j").agg(
        *[
            F.round(
                F.sum(F.col("xj") * F.element_at(F.col("__v"), k + 1)), round_dp
            ).alias(f"s_{k}")
            for k in range(dim)
        ]
    )
    return g.select(
        "j",
        F.posexplode(F.array(*[F.col(f"s_{k}") for k in range(dim)])).alias("k", "s"),
    )


def dim_cosine_pairs(
    emb: DataFrame,
    dim: int,
    k_top: int = 25,
    vec_col: str = "embedding",
    gram_mode: str = "auto",
) -> DataFrame:
    """Top-``k_top`` most-correlated dimension pairs (j < k) by |cosine between
    the dimension columns| = |S_jk| / sqrt(S_jj·S_kk) — the
    collapsed/duplicated-dimension audit (a healthy isotropic encoder keeps
    off-diagonal cosines near 0; a rank-collapsed update shows pairs near ±1).
    Returns (j, k, s, cos, rank); cosine rounded to 4 decimals from the
    ROUNDED matrix (sqrt and division are single correctly-rounded IEEE ops —
    engine-stable on identical inputs); ties break on (j, k). A fully DEAD
    dimension (zero diagonal) has undefined pair cosines, pinned to 0.0 —
    audit deadness on the diagonal of ``second_moment`` (s = 0 rows), not
    through this pair report.

    The d²-row matrix is PINNED (lazy localCheckpoint) before fan-out: the
    off-diagonal side and both broadcast diagonal sides would otherwise each
    re-execute the corpus aggregation (Spark's exchange reuse does not fire
    across the differently-aliased subtrees) — one corpus pass, three
    consumers of 4096 rows. Lazy, not eager: the gram lineage is
    deterministic, so first-action materialization is race-safe and skips
    the synchronous construction-time job (the quantile.py A/B).

    ``gram_mode``: 'auto' (default) runs the explode-path matrix at-or-under
    GRAM_AUTO_DIM_THRESHOLD and the Arrow partial-gram past it — both paths
    land on the same 4dp grid, so the report is mode-invariant (pinned in
    tests/test_linalg.py)."""
    s = _gram(emb, dim, vec_col, 4, gram_mode).localCheckpoint(eager=False)
    diag = s.filter(F.col("j") == F.col("k")).select(
        F.col("j").alias("__d"), F.col("s").alias("__sd")
    )
    off = (
        s.filter(F.col("j") < F.col("k"))
        .join(F.broadcast(diag).withColumnRenamed("__d", "j").withColumnRenamed("__sd", "__sjj"), "j")
        .join(F.broadcast(diag).withColumnRenamed("__d", "k").withColumnRenamed("__sd", "__skk"), "k")
        .select(
            "j",
            "k",
            "s",
            # DEAD dimension (zero diagonal): the pair cosine is undefined —
            # pinned to 0.0 in BOTH engines (Spark would yield NaN/Inf,
            # DuckDB NULL, and the two sort differently). Deadness itself is
            # audited on the DIAGONAL (s = 0 rows of second_moment), not via
            # this pair report.
            F.when(F.col("__sjj") * F.col("__skk") == 0, F.lit(0.0))
            .otherwise(
                F.round(F.col("s") / F.sqrt(F.col("__sjj") * F.col("__skk")), 4)
            )
            .alias("cos"),
        )
    )
    top = off.orderBy(F.abs(F.col("cos")).desc(), F.asc("j"), F.asc("k")).limit(k_top)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.abs(F.col("cos")).desc(), F.asc("j"), F.asc("k"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "j", "k", "s", "cos", "rank"
    )


def _round_half_up(x: float, dp: int) -> float:
    """Spark F.round / DuckDB round semantics (half away from zero) — NOT the
    built-in banker's round()."""
    q = Decimal(1).scaleb(-dp)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def dominant_direction(s_rows: list[tuple[int, int, float]], dim: int, iters: int = 3) -> list[float]:
    """Power iteration on the ROUNDED second-moment matrix, fully
    deterministic so a SQL twin replays it bit-for-bit: start from e_0; each
    step computes w = S·v with a FIXED left-fold over k ascending, rounds w to
    6 decimals (HALF_UP), divides by the max-|component| of the rounded w
    (ties to the smallest index), and re-rounds to 6 decimals. Both engines
    therefore iterate on identical vectors — the only cross-engine float
    hazard (order-sensitive 64-term sums) is capped at ~1e-13 and killed by
    the per-step rounding. Returns the direction after ``iters`` steps (NOT
    unit-norm; normalized by max-|component|, so entries are in [-1, 1] with
    at least one ±1)."""
    seed = [1.0 if j == 0 else 0.0 for j in range(dim)]
    if not s_rows:  # empty corpus: no matrix — stay at the seed basis vector
        return seed
    s = {}
    for j, k, v in s_rows:
        s[(j, k)] = v if v is not None else 0.0
    v = seed
    for _ in range(iters):
        w = []
        for j in range(dim):
            acc = 0.0
            for k in range(dim):  # fixed fold order: k ascending
                acc = acc + s.get((j, k), 0.0) * v[k]
            w.append(_round_half_up(acc, 6))
        m_idx = max(range(dim), key=lambda j: (abs(w[j]), -j))
        m = abs(w[m_idx])
        if m == 0.0:
            # degenerate step (S·v rounded to all-zero): RESET to the seed
            # and keep iterating — a per-step rule, not an early return, so
            # the SQL twin's per-iteration CASE replays it exactly even when
            # a later step escapes the degeneracy
            v = list(seed)
            continue
        v = [_round_half_up(w[j] / m, 6) for j in range(dim)]
    return v


def dominant_direction_outliers(
    emb: DataFrame,
    dim: int,
    k_top: int = 20,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    gram_mode: str = "auto",
) -> DataFrame:
    """Top-``k_top`` documents by |projection on the dominant direction| —
    the "All-but-the-Top" common-component diagnostic: embeddings loading
    heaviest on the corpus's dominant direction are the ones a top-PC-removal
    post-process changes most (and the usual suspects for boilerplate /
    template domination). Returns (id, proj, rank), proj = ⟨x, v⟩ rounded to
    4 decimals, rank by |proj| desc with id tiebreak.

    Scale: one pass builds S (``gram_mode='auto'`` picks the explode matrix
    or the Arrow partial-gram by d, exactly like ``dim_cosine_pairs``), the
    iteration runs on the d²-double driver artifact, and the scoring is a
    map-side fixed-order fold over the corpus — a k-bounded global top-k via
    TakeOrderedAndProject, the brute_force_topk shape. The fold itself is
    d-budgeted: at-or-under PROJECTION_UNROLL_BUDGET it unrolls (d plan
    nodes); past it the SAME left-assoc add order runs as ONE
    ``aggregate(zip_with(x, v_literal))`` node over a one-parse array
    literal — bit-identical projections (acc starts at 0.0, terms fold in
    index order in both forms; pinned in tests/test_linalg.py)."""
    s_rows = [
        (r["j"], r["k"], r["s"])
        for r in _gram(emb, dim, vec_col, 4, gram_mode).collect()
    ]
    v = dominant_direction(s_rows, dim, iters=iters)
    # fixed-order fold: x[0]*v0 + x[1]*v1 + ... (left-assoc, matches the SQL twin)
    if dim <= PROJECTION_UNROLL_BUDGET:
        proj = F.lit(0.0)
        for j in range(dim):
            proj = proj + F.element_at(F.col(vec_col), j + 1) * F.lit(v[j])
    else:
        from airflow_courier_payout_ledger_pipeline_spark.functions.literals import (
            array_lit,
        )

        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                array_lit([float(x) for x in v]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
    scored = emb.select(F.col(id_col), F.round(proj, 4).alias("proj"))
    top = scored.orderBy(F.abs(F.col("proj")).desc(), F.asc(id_col)).limit(k_top)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.abs(F.col("proj")).desc(), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def second_moment_partial_gram(
    emb: DataFrame, dim: int, vec_col: str = "embedding", round_dp: int = 4
) -> DataFrame:
    """The LARGE-d form of :func:`second_moment` — per-partition partial grams
    via Arrow-batched ``mapInPandas`` (numpy ``X.T @ X`` per batch, one
    d²-float row out per batch) folded by one d²-group sum. No dimension-grain
    explode: the corpus is read once at its native row grain, so the scan cost
    does not multiply by d — the shape that wins when the ``second_moment``
    d-group agg's d+1-column width binds (d in the hundreds-plus). The
    exchange carries ≤ batches × d² partial rows (map-side combined), never
    the corpus.

    Same output contract as ``second_moment``: (j, k, s) rounded to
    ``round_dp``, float64 products, NULL vectors dropped BEFORE the Arrow
    exchange (numpy would raise on a ragged batch where the agg path just
    drops the row) — partial-sum ORDER differs from the agg version (numpy
    pairwise vs codegen sequential), which is exactly what the rounding grid
    absorbs; equality to 4dp is pinned in tests/test_linalg.py."""
    import pandas as pd

    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    out_schema = StructType(
        [
            StructField("j", IntegerType(), False),
            StructField("k", IntegerType(), False),
            StructField("ps", DoubleType(), False),
        ]
    )
    def _partial(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            g = x.T @ x
            yield pd.DataFrame(
                {
                    "j": np.repeat(np.arange(dim, dtype=np.int32), dim),
                    "k": np.tile(np.arange(dim, dtype=np.int32), dim),
                    "ps": g.ravel(),
                }
            )

    partials = (
        emb.where(F.col(vec_col).isNotNull())
        .select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(_partial, out_schema)
    )
    return partials.groupBy("j", "k").agg(F.round(F.sum("ps"), round_dp).alias("s"))
