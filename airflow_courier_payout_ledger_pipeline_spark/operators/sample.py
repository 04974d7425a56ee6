"""Mergeable bottom-k priority-sample state: a uniform per-group sample you
can MAINTAIN, not re-draw.

The fifth member of the repo's mergeable-state family (CMS = frequency,
Bloom = membership, quantile histogram = ranks, HLL = distinct): a k-row
uniform-without-replacement sample per group, as a persisted state that folds
increments. The trick is the classic bottom-k / KMV construction: give every
row a deterministic pseudo-random PRIORITY — ``md5(id)`` hex, the repo's
standard reshuffleable draw (cf. ``operators/sampling`` thresholds,
``per_source_cap``) — and define the sample as the k smallest (priority, id)
per group. Bottom-k is CLOSED under union:

    bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B))

so yesterday's k-row state plus tonight's increment's k-row state merge into
exactly the state a full rebuild would produce — row-exact, because the
priority is a pure function of the row id (no rand(), no seed plumbing; the
same draw replays bit-for-bit in any engine with md5). A nightly 100 TB
corpus therefore keeps a live inspection/debug sample per group for
O(k·groups) state and O(increment) maintenance — ``TABLESAMPLE`` or
``df.sample`` would re-scan (and re-draw!) the corpus every night.

Scale shape: the build is one group-keyed ``row_number`` window with a
``rn <= k`` filter — Spark's WindowGroupLimit pushdown prunes each map task
to k rows per group BEFORE the exchange, so the shuffle carries O(k·groups·
partitions) rows, never the corpus (same family as ``topk_per_group`` /
``per_source_cap``, plan-pinned there). Merging unions two k-row states and
re-windows: trivially small. No global sort anywhere.

Contracts (pinned in ``tests/test_sample.py``):
- merge law: merge(build(A), build(B)) ≡ build(A ∪ B) row-exact for DISJOINT
  increments (the ledger-state contract: increments partition the fact
  stream; replay protection is the fold rail's exactly-once sidecar);
- determinism: the state is invariant under input partitioning and order;
- NULL ids are EXCLUDED at build time: ``md5(NULL)`` is NULL and NULL
  ordering is engine-dependent (Spark NULLS FIRST asc, DuckDB NULLS LAST) —
  the same exclusion rule as the quantile histogram's NULL values. Sample
  ids must be non-null unique keys (they are the draw).

No reference twin: the reference pipeline has no sampling surface; this is
part of the 100 TB extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _priority(id_col: str):
    """The deterministic draw: md5 hex of the id's decimal string. Total
    order via (priority, id) — md5 collisions (or equal prefixes) break on
    the id itself, so ranks are unique and engine-portable."""
    return F.md5(F.col(id_col).cast("string"))


def _uk_frac(priority_col):
    """The KMV u_k mapping shared by every cardinality readout: first 12 md5
    hex chars (48 bits) → (0,1) double via one exact int→double conversion
    and one IEEE division. This IS the bit-determinism contract with the
    DuckDB oracles (``('0x'||substr(p,1,12))::BIGINT / 281474976710656.0``)
    — keep it in one place so the readouts can never desynchronize."""
    return F.conv(F.substring(priority_col, 1, 12), 16, 10).cast("double") / float(
        1 << 48
    )


def sample_state(
    df: DataFrame, group_cols: list[str], id_col: str, k: int
) -> DataFrame:
    """Per-group bottom-k sample state: the k rows with the smallest
    (md5(id), id) per group, all input columns preserved plus the
    ``__priority`` hex the merge re-ranks on. One group-keyed window; the
    ``rn <= k`` filter makes it a WindowGroupLimit, pruning before the
    exchange."""
    w = Window.partitionBy(*group_cols).orderBy("__priority", id_col)
    return (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("__priority", _priority(id_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def merge_sample_states(
    a: DataFrame, b: DataFrame, group_cols: list[str], id_col: str, k: int
) -> DataFrame:
    """Fold two bottom-k states: union, re-rank, keep the k smallest per
    group. Associative, commutative, increment-order-free — bottom-k is
    closed under union, so the merged state is row-identical to a full
    rebuild over the combined input (disjoint-increment contract). Also
    IDEMPOTENT: duplicate (group, id) rows — a replayed or overlapping
    increment — are dropped before the re-rank, so a twice-folded state
    cannot let one id occupy two of the k slots and displace a legitimate
    row (rows for the same id are identical by construction: the priority
    and every payload column are pure functions of the source row). The
    fold rail's exactly-once sidecar stays the first line of defense; this
    makes the merge itself replay-safe, matching the bloom fold's bit-or
    idempotence. The dedupe rides the SAME window spec as the re-rank (the
    priority is a function of the id, so copies of an id are adjacent in
    (priority, id) order and ``lag(id) == id`` marks the 2nd+), NOT
    ``dropDuplicates`` — that would exchange on (group, id), a second
    shuffle; this way both windows share the group partitioning and the
    merge keeps its pinned one-exchange shape
    (tests/test_shuffle_budgets.py)."""
    w = Window.partitionBy(*group_cols).orderBy("__priority", id_col)
    return (
        a.unionByName(b)
        .withColumn("__dup", F.lag(id_col).over(w) == F.col(id_col))
        .filter(~F.coalesce(F.col("__dup"), F.lit(False)))
        .drop("__dup")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_distinct_estimate(
    state: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """Second readout from the SAME state: the bottom-k priorities are a KMV
    (k-minimum-values) sketch, so each full group estimates its distinct-id
    count as (k-1)/u_k where u_k is the k-th smallest draw mapped to (0,1) —
    here from the first 12 md5 hex chars (48 bits; collision odds at corpus
    scale are immaterial for an estimator). Groups with fewer than k state
    rows hold ALL their ids, so their exact count is returned (``exact`` =
    true flags them). Error envelope ~1/sqrt(k-2) relative — pinned in
    ``tests/test_sample.py``. UNLIKE an HLL estimate, this one is
    oracle-hashable: the md5 draw replays in any engine, the 48-bit-int →
    double mapping and the single IEEE division are bit-deterministic, and
    the readout FLOORS (half-rounding a double is a cross-engine tie
    hazard; floor is exact). Requires one state row per distinct id — feed
    DISTINCT (group, id) rows into ``sample_state`` when ids repeat, or
    duplicate draws shrink u_k and inflate the estimate. One k-row-grain
    aggregation; no pass over raw data — the sample you keep for inspection
    is also your cardinality monitor."""
    per = state.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__rows"),
        F.max(_uk_frac(F.col("__priority"))).alias("__uk"),
    )
    est = F.when(F.col("__rows") < k, F.col("__rows").cast("double")).otherwise(
        (F.lit(k - 1)) / F.col("__uk")
    )
    return per.select(
        *group_cols,
        F.floor(est).cast("bigint").alias("distinct_est"),
        (F.col("__rows") < k).alias("exact"),
    )


def kmv_pairwise_set_estimates(
    state: DataFrame,
    group_cols: list[str],
    side_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Third readout from the SAME state: SET-OPERATION estimates between
    every pair of sides sharing a group — distinct-count of the UNION and of
    the INTERSECTION of two id sets, from their bottom-k states alone, no
    pass over raw data and no distinct-heavy join. This is the cross-slice
    overlap question ("how many users do sources A and B share?") that at
    100 TB would otherwise be a corpus-grain self-join.

    Construction (the classic KMV set algebra): bottom-k closure gives
    ``bottomk(A ∪ B) = bottomk(state_A ∪ state_B)``, so the merged bottom-k
    is a valid KMV sketch of the union → est(∪) = (k-1)/u_k. For the
    intersection, count K∩ = |{merged bottom-k elements present in BOTH
    states}|; K∩/k is an unbiased estimate of the Jaccard similarity over
    the union's uniform hash sample, so est(∩) = ⌊K∩·(k-1) / (u_k·k)⌋.
    When the merged union holds fewer than k elements, BOTH sides were
    complete (each side's state keeps min(k, n) rows), so union and
    intersection are returned EXACTLY (``exact`` = true).

    Every step is bit-deterministic cross-engine (md5 membership is string
    equality; the integer products are exact; one double multiply + one
    division + floor, parenthesized identically in the oracle), so unlike a
    theta-sketch intersection the ESTIMATES are hash-checkable.

    Scale shape: each side's ≤ k state rows pack into ONE sorted
    (priority, id) struct array (a side's sketch VALUE — one grouped
    collect, the only exchange), the side table self-joins once into pairs,
    and the whole set algebra runs as map-side array expressions:
    merged bottom-k = ``slice(array_sort(array_union(A, B)), 1, k)``
    (shared ids have bit-identical structs on both sides, so array_union's
    dedup IS the union-element collapse), u_k = the last struct's priority,
    K∩ = ``size(array_intersect(array_intersect(U, A), B))``. One exchange
    + one tiny self-join total — the first formulation fanned the state
    through 6 tiny exchanges/broadcasts and re-executed the state's corpus
    upstream per branch (measured 2.9 s of pure stage overhead at sf0.1;
    this one is ~0.5 s). The packed table is pinned (LAZY
    localCheckpoint, the graph.py discipline — lazy is race-safe here
    because the array_sort makes the packed lineage deterministic, and it
    skips eager's synchronous construction-time job) so the self-join's two
    arms don't rebuild the state twice; it is sides·groups rows — O(KB).
    Output grain: (*group_cols, {side}_a, {side}_b) with
    ``union_est``/``inter_est`` BIGINT and ``exact`` flags."""
    a_col, b_col = f"{side_col}_a", f"{side_col}_b"
    packed = (
        state.groupBy(*group_cols, side_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__priority").alias("p"), F.col(id_col).alias("i")
                    )
                )
            ).alias("__arr")
        )
        .localCheckpoint(eager=False)
    )
    x, y = packed.alias("__x"), packed.alias("__y")
    cond = F.col(f"__x.{side_col}") < F.col(f"__y.{side_col}")
    for g in group_cols:
        cond = cond & (F.col(f"__x.{g}") == F.col(f"__y.{g}"))
    pairs = x.join(F.broadcast(y), cond).select(
        *[F.col(f"__x.{g}").alias(g) for g in group_cols],
        F.col(f"__x.{side_col}").alias(a_col),
        F.col(f"__y.{side_col}").alias(b_col),
        F.col(f"__x.__arr").alias("__a"),
        F.col(f"__y.__arr").alias("__b"),
    )
    uni = F.slice(F.array_sort(F.array_union("__a", "__b")), 1, k)
    keys = [*group_cols, a_col, b_col]
    sized = pairs.select(
        *keys,
        "__a",
        "__b",
        uni.alias("__u"),
        F.size(uni).cast("bigint").alias("__rows"),
        F.size(
            F.array_intersect(F.array_intersect(uni, F.col("__a")), F.col("__b"))
        )
        .cast("bigint")
        .alias("__kboth"),
    ).withColumn(
        "__uk",
        _uk_frac(F.element_at("__u", F.size("__u")).getField("p")),
    )
    union_est = F.when(
        F.col("__rows") < k, F.col("__rows").cast("double")
    ).otherwise(F.lit(k - 1) / F.col("__uk"))
    inter_est = F.when(
        F.col("__rows") < k, F.col("__kboth").cast("double")
    ).otherwise(
        (F.col("__kboth") * F.lit(k - 1)).cast("double")
        / (F.col("__uk") * F.lit(k))
    )
    return sized.select(
        *keys,
        F.floor(union_est).cast("bigint").alias("union_est"),
        F.floor(inter_est).cast("bigint").alias("inter_est"),
        (F.col("__rows") < k).alias("exact"),
    )


def kmv_set_estimates(
    a: DataFrame, b: DataFrame, group_cols: list[str], id_col: str, k: int
) -> DataFrame:
    """Two-state form: per-group union/intersection estimates between exactly
    two bottom-k states (built on the same id hash space). Unlike the
    pairwise readout (whose grain is pairs of CO-PRESENT sides), this
    reports EVERY group present in either state — a group with rows in only
    one side is a defined answer (union = that side's estimate,
    intersection = 0, exact iff the present side is below k), not a missing
    row; dropping it would be indistinguishable from "group does not
    exist" to a caller diffing two slices. Same packed-array algebra
    (full-outer join of the per-group packed arrays, missing side = empty
    array); returns (*group_cols, union_est, inter_est, exact)."""

    def pack(state: DataFrame, name: str) -> DataFrame:
        return state.groupBy(*group_cols).agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__priority").alias("p"), F.col(id_col).alias("i")
                    )
                )
            ).alias(name)
        )

    pa, pb = pack(a, "__a"), pack(b, "__b")
    empty = F.expr(f"CAST(array() AS {pa.schema['__a'].dataType.simpleString()})")
    if group_cols:
        joined = pa.join(pb, list(group_cols), "full")
    else:
        # groupBy() is a global agg: exactly one row per side, even on empty
        # input — the cross of two singletons is the single global result row
        joined = pa.crossJoin(pb)
    base = joined.select(
        *group_cols,
        F.coalesce("__a", empty).alias("__a"),
        F.coalesce("__b", empty).alias("__b"),
    )
    uni = F.slice(F.array_sort(F.array_union("__a", "__b")), 1, k)
    sized = base.select(
        *group_cols,
        "__a",
        "__b",
        uni.alias("__u"),
        F.size(uni).cast("bigint").alias("__rows"),
        F.size(
            F.array_intersect(F.array_intersect(uni, F.col("__a")), F.col("__b"))
        )
        .cast("bigint")
        .alias("__kboth"),
    ).withColumn(
        "__uk",
        # guarded: only the full-sketch branch reads u_k, and k >= 1 makes
        # the array non-empty there (element_at(arr, 0) would raise under
        # ANSI on an empty-union row)
        F.when(
            F.col("__rows") >= k,
            _uk_frac(F.element_at("__u", F.size("__u")).getField("p")),
        ),
    )
    union_est = F.when(
        F.col("__rows") < k, F.col("__rows").cast("double")
    ).otherwise(F.lit(k - 1) / F.col("__uk"))
    inter_est = F.when(
        F.col("__rows") < k, F.col("__kboth").cast("double")
    ).otherwise(
        (F.col("__kboth") * F.lit(k - 1)).cast("double")
        / (F.col("__uk") * F.lit(k))
    )
    return sized.select(
        *group_cols,
        F.floor(union_est).cast("bigint").alias("union_est"),
        F.floor(inter_est).cast("bigint").alias("inter_est"),
        (F.col("__rows") < k).alias("exact"),
    )


def sample_from_state(
    state: DataFrame, group_cols: list[str], id_col: str
) -> DataFrame:
    """Readout: the sample with its deterministic per-group rank (1 = lowest
    priority draw), the ``__priority`` scaffold dropped. Rank makes the
    output a stable, diffable artifact — the same corpus always yields the
    same ranked sample."""
    w = Window.partitionBy(*group_cols).orderBy("__priority", id_col)
    return (
        state.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .drop("__priority")
    )


# --- Weighted variant: quantized priority sampling (Duffield–Lund–Thorup) -------------

#: draw resolution: 16-bit md5 prefix → u ∈ [1, 65536] (the repo's standard
#: hash-space width; +1 keeps u strictly positive)
_DRAW_SPACE = 65536


def weighted_sample_state(
    df: DataFrame, group_cols: list[str], id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Per-group weighted TOP-k sample state: the k rows with the LARGEST
    quantized priority p = ⌊w · 65536 / u⌋ per group, with u ∈ [1, 65536]
    the 16-bit md5(id) draw — the integer-exact stand-in for priority
    sampling's q = w/u (Duffield–Lund–Thorup): larger weights get
    proportionally larger priorities, so top-k by (p DESC, id) is a
    weight-favoring fixed-size sample whose inclusion probabilities track
    DLT up to the draw quantization. All-BIGINT arithmetic (w·65536 needs
    w < 2^46 — any count/length/cents weight), `div` = floor for positive
    operands and replays as DuckDB's `//` — oracle-hashable where a float
    w/u ratio would be a cross-engine tie/rounding hazard. Rows with NULL
    ids or non-positive/NULL weights are excluded at build (NULL ordering
    is an engine hazard; weight 0 could never be drawn under true priority
    sampling either). Same WindowGroupLimit k-prune-before-exchange shape
    as the uniform build; same closure under union, so the same
    merge/maintenance story."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("long")
        + 1
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("__wpriority"), F.asc(id_col)
    )
    return (
        df.filter(F.col(id_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__u", u)
        .withColumn(
            "__wpriority",
            F.expr(
                f"(CAST({weight_col} AS BIGINT) * {_DRAW_SPACE}) div __u"
            ),
        )
        .drop("__u")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def merge_weighted_sample_states(
    a: DataFrame, b: DataFrame, group_cols: list[str], id_col: str, k: int
) -> DataFrame:
    """Fold two weighted states: union, re-rank by (priority DESC, id), keep
    k per group — top-k is closed under union exactly as bottom-k is, so
    merge ≡ rebuild row-exact for disjoint increments; duplicate (group, id)
    rows are dropped first (lag over the same window spec — priority is a
    function of the id, so copies are adjacent; shuffle-neutral, see
    :func:`merge_sample_states`) so the fold is idempotent under replayed
    or overlapping increments."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("__wpriority"), F.asc(id_col)
    )
    return (
        a.unionByName(b)
        .withColumn("__dup", F.lag(id_col).over(w) == F.col(id_col))
        .filter(~F.coalesce(F.col("__dup"), F.lit(False)))
        .drop("__dup")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_sample_from_state(
    state: DataFrame, group_cols: list[str], id_col: str
) -> DataFrame:
    """Readout: the weighted sample ranked 1 = highest priority, scaffold
    dropped."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("__wpriority"), F.asc(id_col)
    )
    return (
        state.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .drop("__wpriority")
    )
