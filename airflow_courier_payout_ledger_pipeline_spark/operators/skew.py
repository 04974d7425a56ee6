"""Skew mitigation: salted broadcast-replicate join for pathologically hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at runtime by
splitting oversized shuffle partitions. This operator is the explicit fallback for
the worst case AQE can't fix: a *single* join key holding a double-digit share of
the fact table (one courier = 10% of 100 TB of deliveries), where even a split
partition re-skews on the key itself.

Mechanics: the big side derives a deterministic salt in [0, n) from a row-unique
column (NOT rand() — task retries must produce identical salts or shuffle files
disagree); the small side is exploded n× with every salt value; the join key
becomes (key, salt). Fan-out cost: n copies of the small side — bounded and
explicit. For inner/left joins the result is row-identical to the unsalted join
(verified by test); right/full outer are rejected — an unmatched small-side row
would surface once per exploded salt copy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_source: str | Column,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big ⋈ small`` on ``key`` with the big side salted ``num_salts`` ways.

    ``salt_source``: any row-level column of ``big`` that distributes rows within a
    hot key (a business key, an id — anything with per-row variety). Deterministic:
    re-running a task yields the same salt for the same row.

    ``how`` is restricted to inner/left (semi/anti included): under right/full
    outer, small-side rows with no big-side match appear once per salt copy —
    silent duplication, so those modes are refused.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: an "
            "unmatched small-side row would be emitted num_salts times under "
            "right/full outer"
        )
    salt_col = F.pmod(F.xxhash64(salt_source), F.lit(num_salts)).cast("int")
    big_s = big.withColumn("__salt", salt_col)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return big_s.join(small_s, [key, "__salt"], how).drop("__salt")


def key_skew_profile(
    df: DataFrame, key: str, hot_ratio: float = 2.0
) -> DataFrame:
    """Per-key skew diagnosis — the measurement step before reaching for
    ``salted_join`` or trusting AQE's skew split: one row per join key with its
    count and its ratio to the mean key load; ``is_hot`` marks keys whose
    partitions will run ``hot_ratio``× longer than average.

    Shape: one grouped count (single shuffle on the key — the same shuffle the
    join being diagnosed would do) + a broadcast of the 1-row global mean; no
    windows, no global sort, so the profile costs one pass at any cardinality.
    The counts subtree feeds both the output and the mean, and AQE's exchange
    reuse materializes its shuffle ONCE at runtime (verified: the mean branch
    shows ``ReusedExchange`` in the post-AQE plan — the scan+agg is not
    recomputed). The mean is computed as exact integer sum / count so the
    ratio is engine-reproducible."""
    counts = df.groupBy(F.col(key)).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("__mean")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            key,
            "n",
            F.round(F.col("n").cast("double") / F.col("__mean"), 4).alias("skew_ratio"),
        )
        .withColumn("is_hot", F.col("skew_ratio") > F.lit(hot_ratio))
    )
