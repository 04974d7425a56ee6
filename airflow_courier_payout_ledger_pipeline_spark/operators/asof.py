"""As-of (time-travel) join: for every left row, the most recent right row at or
before its timestamp, per key — the canonical enrichment for event streams against
slowly-changing state (price books, model versions, dim history). The reference
has no temporal joins (SURVEY.md §2.4 is equi-join only); a training-data pipeline
at 100 TB needs this constantly (label events with the feature value as-of event
time, never the future one).

Scale shape — union + ordered window, NOT a range join:

    left(key, ts)  ∪  right(key, ts)   →  one shuffle on key
    last(right_value, ignorenulls) over (partition by key order by ts, side)

A naive ``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + max-per-row explodes to
|left|×|right-per-key| rows before pruning; the union trick is linear: each row
is touched once, the per-key ordered scan carries the latest right payload
forward. Ties (left.ts == right.ts) resolve to "right visible" (backward
inclusive), matching DuckDB/pandas ``ASOF JOIN`` / ``merge_asof`` semantics.

Known 100 TB hazard: one pathologically hot key serializes into one task's sort.
Mitigation is the standard two-phase split — window by (key, time_bucket) with a
per-bucket carry-in — documented here, not implemented (the single-window form is
the right default; the carry-in variant only pays off past ~10^8 rows per key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, enriched with ``right_values`` from
    the nearest ``right`` row for the same key (NULLs when no such row) —
    ``direction="backward"`` (default) matches the latest ``right.ts <=
    left.ts`` (enrich with state as-of event time); ``direction="forward"``
    matches the earliest ``right.ts >= left.ts`` (label an event with the
    outcome that FOLLOWED it — the attribution/conversion-labeling shape a
    training pipeline uses to build supervised targets without future leaks
    beyond the chosen horizon); ``direction="nearest"`` matches whichever of
    the two is closer in time (pandas ``merge_asof(direction='nearest')``),
    with equal-gap ties resolved to the BACKWARD match — state over future,
    so a tie never leaks. ``tolerance_seconds`` bounds the match gap
    (pandas ``merge_asof(tolerance=...)`` semantics): a nearest row farther
    than the horizon nulls out, it does not fall through to the next-nearest.
    Also emits the matched timestamp as ``{right_ts}{suffix}``.

    Both directions keep the union + ordered-window shape (one shuffle on
    key, linear scan): forward simply orders the per-key scan by time
    DESCENDING, so "carry the last right payload seen" means "nearest at or
    after". Ties (left.ts == right.ts) are inclusive in both directions.

    ``right`` should be unique per (key, right_ts) — pre-aggregate if not, or
    the carried payload at a tied timestamp is tie-broken by nothing.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    lcols = left.columns
    ltypes = dict(left.dtypes)
    rpay = [F.col(c).alias(f"__r_{c}") for c in (right_ts, *right_values)]
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *rpay,
        *[
            F.lit(None).cast(ltypes[c]).alias(f"__l_{c}")
            for c in lcols
            if c != key
        ],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in (right_ts, *right_values)],
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c != key],
    )
    u = l.unionByName(r)
    # right rows sort before left rows at the same instant → inclusive ties in
    # both directions (forward scans time-descending, so "last seen right" is
    # the earliest at-or-after)
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts"), "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").desc(), "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rts_type = dict(right.dtypes)[right_ts]
    if direction in ("backward", "forward"):
        w = wb if direction == "backward" else wf
        carried = u.select(
            key,
            "__ts",
            "__side",
            *[F.col(f"__l_{c}") for c in lcols if c != key],
            *[
                F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__m_{c}")
                for c in (right_ts, *right_values)
            ],
        )
        out = carried.filter(F.col("__side") == 1)
    else:  # nearest: BOTH carries ride the one ascending sort — backward as
        # the usual trailing frame, forward as first(ignorenulls) over the
        # FOLLOWING frame — so the whole direction costs one exchange + one
        # sort (plan-asserted in tests), then a per-row closer-gap pick.
        # A right row at the exact left instant sorts before the left row
        # (side order) and is thus excluded from the following frame, but
        # it is carried by the backward frame at gap 0, and equal-gap ties
        # prefer the backward match anyway (state over future, no leak on
        # ties) — so the exclusion cannot change the result.
        wfwd = (
            Window.partitionBy(key)
            .orderBy(F.col("__ts"), "__side")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carried = u.select(
            key,
            "__ts",
            "__side",
            *[F.col(f"__l_{c}") for c in lcols if c != key],
            *[
                F.last(F.col(f"__r_{c}"), ignorenulls=True).over(wb).alias(f"__mb_{c}")
                for c in (right_ts, *right_values)
            ],
            *[
                F.first(F.col(f"__r_{c}"), ignorenulls=True)
                .over(wfwd)
                .alias(f"__mf_{c}")
                for c in (right_ts, *right_values)
            ],
        ).filter(F.col("__side") == 1)
        gap_b = _time_gap(F.col(f"__mb_{right_ts}"), F.col("__ts"), rts_type)
        gap_f = _time_gap(F.col(f"__mf_{right_ts}"), F.col("__ts"), rts_type)
        use_b = F.col(f"__mb_{right_ts}").isNotNull() & (
            F.col(f"__mf_{right_ts}").isNull() | (gap_b <= gap_f)
        )
        out = carried.select(
            key,
            "__ts",
            *[F.col(f"__l_{c}") for c in lcols if c != key],
            *[
                F.when(use_b, F.col(f"__mb_{c}"))
                .otherwise(F.col(f"__mf_{c}"))
                .alias(f"__m_{c}")
                for c in (right_ts, *right_values)
            ],
        )
    if tolerance_seconds is not None:
        mts, lts = F.col(f"__m_{right_ts}"), F.col("__ts")
        gap = _time_gap(mts, lts, rts_type)
        if rts_type.startswith("timestamp"):
            limit = F.lit(int(tolerance_seconds) * 1_000_000)
        else:  # numeric time axes (epoch seconds, sequence numbers)
            limit = F.lit(float(tolerance_seconds))
        ok = mts.isNotNull() & (gap <= limit)
        out = out.select(
            *[c for c in out.columns if not c.startswith("__m_")],
            *[
                F.when(ok, F.col(f"__m_{c}")).alias(f"__m_{c}")
                for c in (right_ts, *right_values)
            ],
        )
    return out.select(
        key,
        *[F.col(f"__l_{c}").alias(c) for c in lcols if c != key],
        F.col(f"__m_{right_ts}").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m_{c}").alias(c) for c in right_values],
    )


def _time_gap(mts, lts, rts_type: str):
    """|match ts - left ts| on the right-ts axis: microseconds for timestamp
    axes (cast through TIMESTAMP — unix_micros rejects TIMESTAMP_NTZ, and the
    NTZ->TZ cast shifts both sides identically so the DIFFERENCE is
    timezone-invariant), raw double units for numeric axes."""
    if rts_type.startswith("timestamp"):
        return F.abs(
            F.unix_micros(mts.cast("timestamp")) - F.unix_micros(lts.cast("timestamp"))
        )
    return F.abs(mts.cast("double") - lts.cast("double"))
