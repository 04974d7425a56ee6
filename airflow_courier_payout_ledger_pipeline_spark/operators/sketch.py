"""Mergeable HyperLogLog sketch state: incremental distinct counting at 100 TB.

The exact distinct-user queries (``rolling_distinct_users_7d``, ``retention_cohorts``)
carry a (day, user) dedup grain — correct, but an *incremental* nightly pipeline
recomputing them re-reads every user id ever seen. The mergeable alternative is the
standard lakehouse pattern: persist one HLL sketch per (grain) row (~KBs each,
Apache DataSketches binary format via Spark's ``hll_sketch_agg``), and fold each
increment in with a register-wise-max union — the same algebraic shape as
``plans/ledger.merge_ledger_states`` (count/sum states), extended to DISTINCT,
which has no exact bounded-size mergeable state.

Laws the tests pin (``tests/test_sketch.py``):
- **merge law (registers)**: HLL union is register-wise max, so a merged state
  carries the same information as sketching the concatenated inputs — the
  merged ESTIMATE therefore obeys the identical published error envelope as a
  full recompute, for any increment split or fold order. The estimates are not
  bit-identical across build topologies: DataSketches estimates a
  directly-built sketch with the stream-order HIP estimator but a unioned
  sketch with the composite estimator (and keeps exact hash lists below a
  promotion threshold), so two fold shapes of the same data may differ by a
  fraction of σ while both staying inside the envelope. Consumers must treat
  the estimate as a value with published error, never as a reproducible hash
  input.
- **idempotence / commutativity**: re-folding the same increment or reordering
  increments leaves every estimate unchanged — replay-safe under
  at-least-once delivery;
- **accuracy**: estimate within the published relative-error envelope of
  lgK (±3σ · 1.04/√2^lgK) against the exact count — for direct, merged, and
  rolled-up states alike.

Approximate estimates cannot hash-match a DuckDB oracle (different sketch
implementations), so this operator is library-level: the laws above are the
correctness contract, exactly as SCALE.md documents for approx_percentile.

No reference twin: the reference pipeline has no distinct-count surface
(sql/courier_ledger_update.sql aggregates sums/avgs only); this is part of the
100 TB extension surface.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Default DataSketches log2(K): 4096 registers ≈ 1.6 % relative standard error,
#: ~2 KB per sketch — one day×segment row costs ~2 KB regardless of cardinality.
DEFAULT_LGK = 12


def sketch_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Per-group HLL sketch of ``value_col``: the persistable distinct-count
    state. One grouped aggregation (map-side partial sketches merge before the
    shuffle, so the exchange carries one ~2 KB sketch per group per map task,
    never raw values)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("distinct_sketch")
    )


def merge_sketch_states(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold two sketch-state tables: full-outer on the grain, register-wise-max
    union where both sides have the group. The merged state carries the same
    register information as sketching the concatenated inputs (the merge law),
    so nightly increments compose associatively, may be folded in any order,
    and the estimate keeps the full-recompute error envelope.

    ``allowDifferentLgConfigK`` stays False: silently unioning sketches of
    different precision would downgrade every later estimate — a config drift
    bug this surfaces loudly instead.

    The grain join is NULL-SAFE (``eqNullSafe``): a NULL grain value (events
    with no day, an unattributed segment) is one group — the same grouping
    contract ``sketch_distinct``'s groupBy and ``rollup_sketches`` apply — so
    both sides' NULL-grain sketches union instead of surviving as two
    conflicting partial rows."""
    an = a.select(
        *[F.col(c).alias(f"__a_{c}") for c in group_cols],
        F.col("distinct_sketch").alias("__sa"),
    )
    bn = b.select(
        *[F.col(c).alias(f"__b_{c}") for c in group_cols],
        F.col("distinct_sketch").alias("__sb"),
    )
    cond = None
    for c in group_cols:
        eq = F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
        cond = eq if cond is None else cond & eq
    joined = an.join(bn, cond, "full_outer")
    merged = (
        F.when(F.col("__sa").isNull(), F.col("__sb"))
        .when(F.col("__sb").isNull(), F.col("__sa"))
        .otherwise(F.hll_union(F.col("__sa"), F.col("__sb")))
    )
    # left side's sketch is null exactly when the left grain columns are all
    # absent — take the key from whichever side has the row
    keys = [
        F.when(F.col("__sa").isNull(), F.col(f"__b_{c}"))
        .otherwise(F.col(f"__a_{c}"))
        .alias(c)
        for c in group_cols
    ]
    return joined.select(*keys, merged.alias("distinct_sketch"))


def estimate_distinct(state: DataFrame, group_cols: list[str]) -> DataFrame:
    """Finalize: per-group distinct estimate (bigint) from the sketch state."""
    return state.select(
        *group_cols,
        F.hll_sketch_estimate("distinct_sketch").cast("bigint").alias("n_distinct_est"),
    )


#: Count-min defaults: 4 rows × 1024 buckets ≈ overestimate ≤ e·N/1024 with
#: probability 1 - e^-4 per probe — 4096 bigint rows of state regardless of
#: vocabulary size.
CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_state(df: DataFrame, value_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Count-min sketch as a mergeable DataFrame state: (seed, bucket, cnt,
    width), ≤ depth×width rows total. Each value lands in one bucket per seed
    row (xxhash64 over (value, seed) — JVM-side, no Python); one grouped agg
    with map-side partials builds the state, so the exchange carries
    ≤ depth×width rows per map task, never raw values. Unlike HLL this state
    supports FREQUENCY queries: estimate(v) = min over seeds of its bucket
    count, an OVERESTIMATE with probability-1 one-sided error — the property
    the heavy-hitters prune relies on (no false negatives).

    The BUILD width rides along as a constant column: width drift between
    build and probe mis-hashes every bucket and silently UNDER-estimates
    (breaking one-sidedness), and the data alone can only reveal widening
    drift (a bucket ≥ probe width) — a state built NARROWER than the probe
    width would pass a data-only check. Carrying the width makes both
    directions fail loudly in ``cms_estimate`` / ``cms_probe_expr`` /
    ``merge_cms_states``."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed")
    return (
        df.select(F.col(value_col).alias("__v"), seeds)
        .select("seed", F.pmod(F.xxhash64("__v", "seed"), F.lit(width)).alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("cnt"), F.lit(width).alias("width"))
    )


def cms_state_grouped(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Per-GROUP count-min sketch states in one pass: (group..., seed, bucket,
    cnt, width), <= depth*width rows per group. The group-keyed form of
    :func:`cms_state` — one state per day/source/partition, built by a single
    grouped agg with map-side partials, so a day-grain sketch fleet costs one
    exchange of state-grain rows. States merge per group (or per rollup key
    after a fan-out) by bucket-wise count sum, exactly like
    :func:`merge_cms_states` — the building block of sketch-rollup readouts
    (`heavy_users_rolling_7d`: day states -> any trailing window)."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed")
    return (
        df.select(*group_cols, F.col(value_col).alias("__v"), seeds)
        .select(
            *group_cols,
            "seed",
            F.pmod(F.xxhash64("__v", "seed"), F.lit(width)).alias("bucket"),
        )
        .groupBy(*group_cols, "seed", "bucket")
        .agg(F.count("*").alias("cnt"), F.lit(width).alias("width"))
    )


def stamp_legacy_width(state: DataFrame, declared_width: int = CMS_WIDTH) -> DataFrame:
    """Upgrade a pre-width-column persisted CMS state (schema seed/bucket/cnt)
    to the current schema by stamping the DECLARED build width onto it. The
    true build width of a legacy state is unrecorded, so the caller must
    declare it (default: the library's own build default, the only width a
    legacy ``cms_state`` call without an explicit width could have produced);
    the declaration is validated against the data lazily — a bucket id
    ≥ declared width proves the declaration wrong and raises at execution,
    which catches WIDENING drift. Narrowing drift (declared narrower than the
    true build) is inherently invisible in the data; stamping makes it
    detectable from here on out, because every downstream merge/probe now
    compares widths loudly instead of skipping the check.

    PROVENANCE: the stamp upgrades "unknown width" to an authoritative-looking
    column, so it emits a ``UserWarning`` naming the declared width — the
    surviving signal that this width was CALLER-DECLARED, not build-recorded
    (a sparse legacy state truly built wider, whose occupied buckets all fall
    below the declaration, is indistinguishable in the data; the warning is
    the only trace). Silence it by migrating the artifact once and persisting
    the width-bearing state. Width-bearing states pass through unchanged and
    warn nothing."""
    if "width" in state.columns:
        return state
    warnings.warn(
        f"stamping caller-DECLARED width {declared_width} onto a legacy CMS "
        "state (schema seed/bucket/cnt): the build width was never recorded, "
        "so this declaration cannot be fully validated — a narrower-than-"
        "build declaration is invisible in the data. Persist the returned "
        "width-bearing state to retire this ambiguity.",
        UserWarning,
        stacklevel=2,
    )
    w = (
        F.when(
            F.col("bucket") >= declared_width,
            F.raise_error(
                F.concat(
                    F.lit("legacy CMS state has bucket "),
                    F.col("bucket").cast("string"),
                    F.lit(f" >= declared width {declared_width}"),
                )
            ).cast("int"),
        )
        .otherwise(F.lit(declared_width))
        .alias("width")
    )
    return state.select("seed", "bucket", "cnt", w)


def merge_cms_states(
    a: DataFrame, b: DataFrame, legacy_width: int = CMS_WIDTH
) -> DataFrame:
    """Fold two CMS states built with the same (depth, width): bucket-wise sum.
    Exactly the count/sum merge algebra of plans/ledger.merge_ledger_states —
    associative, commutative, increment-order-free. Merging states built at
    DIFFERENT widths is meaningless (the same bucket id indexes different hash
    ranges), so the merged width column raises lazily on mismatch instead of
    producing a silently wrong state. The check is GLOBAL — a 1-row width
    bounds agg broadcast-crossed back in (the state is ≤ depth×width rows, so
    this costs nothing) — because a per-(seed, bucket)-group check would pass
    silently whenever the two states' occupied buckets don't overlap (sparse
    states realistically have disjoint buckets).

    Pre-width-column persisted states (schema seed/bucket/cnt) are stamped
    with ``legacy_width`` via ``stamp_legacy_width`` BEFORE merging, so the
    output always carries the width column and the global mismatch check
    applies to old artifacts too: merging a legacy state into a state built
    at a different width now raises instead of silently folding mis-indexed
    buckets (the round-7 soft spot — drift detection for legacy states was
    data-only, blind to narrower builds)."""
    a = stamp_legacy_width(a, legacy_width)
    b = stamp_legacy_width(b, legacy_width)
    u = a.unionByName(b)
    # per-group min/max ride the SAME aggregation as the count sum, and the
    # global bounds derive from the merged (≤ depth×width-row) result — NOT
    # from a second agg over the raw union, which would force the input
    # subtrees (a full token-stream scan when the states are built inline) to
    # execute twice. Detection is equivalent: global min over per-group mins
    # == global min over all union rows, so disjoint-bucket width drift still
    # fails loudly.
    merged = u.groupBy("seed", "bucket").agg(
        F.sum("cnt").alias("cnt"),
        F.min("width").alias("__wmin"),
        F.max("width").alias("__wmax"),
    )
    # global check via an unpartitioned window over the merged (≤ depth×width
    # row) result — one plan, one execution; the crossJoin(broadcast(agg))
    # shape planned the bounds as a separate subtree that re-executed the
    # input builds (verified: zero ReusedExchange). Single-partition window
    # is safe: the state is geometry-bounded, never data-sized.
    w = Window.partitionBy()
    return merged.select(
        "seed",
        "bucket",
        "cnt",
        F.when(
            F.min("__wmin").over(w) != F.max("__wmax").over(w),
            F.raise_error(F.lit("CMS width mismatch between merged states")),
        )
        .otherwise(F.col("__wmax"))
        .alias("width"),
    )


def _state_width(state_rows: list, width: int | None) -> int:
    """Resolve the probe width from collected state rows, validating a caller-
    passed width against the state's build width (both drift directions raise).
    Rows from a pre-width-column state (no ``width`` field) fall back to the
    passed/default width unchecked — shrink drift is then still caught by the
    bucket-range check at the call sites."""
    widths = {r["width"] for r in state_rows if "width" in r.__fields__}
    if len(widths) > 1:
        raise ValueError(f"CMS state has inconsistent widths {sorted(widths)}")
    if widths:
        (w,) = widths
        if width is not None and width != w:
            raise ValueError(
                f"CMS width mismatch: probe width={width}, state build width={w}"
            )
        return w
    return width if width is not None else CMS_WIDTH


def cms_estimate(
    items: DataFrame,
    state: DataFrame,
    value_col: str,
    depth: int | None = None,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimated frequency per item: min over seeds of the item's bucket count.
    The state is ≤ depth×width rows → broadcast; an absent bucket means a true
    zero (left join + coalesce 0, not an inner join that would silently drop
    the item and overreport the min).

    The probe's depth is DERIVED from the state (max seed + 1 — every seed row
    appears in a non-empty state, since each value lands in one bucket per
    seed): probing with more seeds than the state was built with would
    left-join absent rows, coalesce to 0, and silently UNDER-estimate,
    breaking the one-sided-error guarantee the heavy-hitters prune relies on.
    Passing ``depth`` explicitly asserts it matches the state (raises on
    mismatch). Width drift raises in BOTH directions: the state's build-width
    column is compared against the probe width (catching a narrower build,
    which a data-only bucket-range check cannot see), and a state bucket
    ≥ ``width`` raises as a belt-and-suspenders for width-column-less states.
    The bounds read is one O(depth×width) action on the (localCheckpoint-ed)
    state."""
    has_width = "width" in state.columns  # pre-width-column persisted states
    aggs = [F.max("seed").alias("s"), F.max("bucket").alias("b")]
    if has_width:
        aggs += [F.min("width").alias("w_min"), F.max("width").alias("w_max")]
    mx = state.agg(*aggs).first()
    state_depth = (mx["s"] + 1) if mx["s"] is not None else (depth or CMS_DEPTH)
    if depth is not None and mx["s"] is not None and depth != state_depth:
        raise ValueError(
            f"CMS depth mismatch: probe depth={depth}, state depth={state_depth}"
        )
    if has_width and mx["w_min"] is not None:
        if mx["w_min"] != mx["w_max"]:
            raise ValueError(
                f"CMS state has inconsistent widths {mx['w_min']} != {mx['w_max']}"
            )
        if mx["w_max"] != width:
            raise ValueError(
                f"CMS width mismatch: probe width={width}, state build width={mx['w_max']}"
            )
    if mx["b"] is not None and mx["b"] >= width:
        raise ValueError(
            f"CMS width mismatch: state has bucket {mx['b']} >= probe width {width}"
        )
    seeds = F.explode(F.array(*[F.lit(i) for i in range(state_depth)])).alias("seed")
    probes = items.select(F.col(value_col), seeds).select(
        value_col,
        "seed",
        F.pmod(F.xxhash64(value_col, "seed"), F.lit(width)).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(state), ["seed", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("freq_est"))
    )


def cms_probe_expr(state_rows: list, value_col, width: int | None = None):
    """Map-side CMS estimate as a pure column expression over a COLLECTED state
    (≤ depth×width rows — the same O(1) driver-state bound as the watermark
    cursor and k×dim centroids): per seed, the bucket counts become a literal
    array and the estimate is ``least`` over seeds of ``counts[seed][bucket]``.

    This is the zero-shuffle probe: ``cms_estimate`` needs the probed items as
    rows (explode ×depth + broadcast join + a groupBy back to item grain — a
    full-vocabulary exchange when the items are a corpus's distinct terms),
    while this expression evaluates inline in the scan, so a prune built on it
    pays NO pre-prune exchange at all. The one-sided-error contract is
    identical (same xxhash64(value, seed) buckets, min over the state's own
    seeds).

    Each per-seed bucket array is ONE parsed ``array(...)`` literal
    (``functions/literals.array_lit`` — a single expr call / plan node), not
    ``F.array`` over ``width`` scalar literals (one py4j round-trip per
    bucket, ~3.3 s at the 4×1024 default — the round-6 heavy_hitters
    regression) and not ``F.lit(list)`` either, whose construction converts
    per element on classic PySpark (~0.4 s per 1024-element array — the same
    pathology one layer down, found in round 9). Width drift vs the state's
    build width raises (see ``cms_state``)."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.literals import (
        array_lit,
    )

    width = _state_width(state_rows, width)
    by_seed: dict[int, dict[int, int]] = {}
    for r in state_rows:
        if r["bucket"] >= width:
            raise ValueError(
                f"CMS width mismatch: state has bucket {r['bucket']} >= probe width {width}"
            )
        by_seed.setdefault(r["seed"], {})[r["bucket"]] = r["cnt"]
    if not by_seed:
        return F.lit(0).cast("bigint")
    value_col = F.col(value_col) if isinstance(value_col, str) else value_col
    per_seed = []
    for seed in sorted(by_seed):
        counts = by_seed[seed]
        arr = array_lit([int(counts.get(b, 0)) for b in range(width)])
        bucket = F.pmod(F.xxhash64(value_col, F.lit(seed)), F.lit(width))
        per_seed.append(F.element_at(arr, (bucket + 1).cast("int")))
    est = F.least(*per_seed) if len(per_seed) > 1 else per_seed[0]
    return est.cast("bigint")


def cms_candidate_expr(
    state_rows: list, value_col, min_count: int, width: int | None = None
):
    """Heavy-hitter candidate predicate as a pure map expression: TRUE iff the
    CMS estimate (min over seeds) is ≥ ``min_count`` — i.e. for EVERY seed the
    value's bucket count passes. Encoded as a conjunction of per-seed
    ``bucket IN (<passing buckets>)`` lists built driver-side from the
    collected state.

    The IN-lists are tiny by mass conservation: per seed the bucket counts sum
    to N (every value lands in exactly one bucket per seed), so at most
    ⌊N/min_count⌋ buckets can hold ≥ min_count — for a 1%-of-mass threshold
    that is ≤ 100 buckets per seed regardless of vocabulary or corpus size,
    vs. a ``width``-element literal array per seed for the general estimate
    expression (``cms_probe_expr``). Same one-sided contract: the candidate
    set is a guaranteed SUPERSET of the true heavy hitters (CMS never
    underestimates), so an exact count + filter downstream restores equality.
    A seed with no passing bucket short-circuits to FALSE (nothing can pass)."""
    width = _state_width(state_rows, width)
    by_seed: dict[int, list[int]] = {}
    for r in state_rows:
        if r["bucket"] >= width:
            raise ValueError(
                f"CMS width mismatch: state has bucket {r['bucket']} >= probe width {width}"
            )
        if r["cnt"] >= min_count:
            by_seed.setdefault(r["seed"], []).append(r["bucket"])
    seeds = sorted({r["seed"] for r in state_rows})
    if not seeds or len(by_seed) < len(seeds):
        # some seed row has zero passing buckets → no value can pass all seeds
        return F.lit(False)
    value_col = F.col(value_col) if isinstance(value_col, str) else value_col
    conj = None
    for seed in seeds:
        bucket = F.pmod(F.xxhash64(value_col, F.lit(seed)), F.lit(width))
        term = bucket.isin(sorted(by_seed[seed]))
        conj = term if conj is None else (conj & term)
    return conj


def rollup_sketches(state: DataFrame, keep_cols: list[str]) -> DataFrame:
    """Re-aggregate a fine-grained sketch state to a coarser grain (day → month,
    day×segment → day) WITHOUT touching raw data: union the sketches under the
    surviving key. This is the property exact distinct counts lack entirely —
    distinct-per-day rows cannot produce distinct-per-month — and the reason the
    sketch state is the right persisted artifact at 100 TB."""
    return state.groupBy(*keep_cols).agg(
        F.hll_union_agg("distinct_sketch").alias("distinct_sketch")
    )
