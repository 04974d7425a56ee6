"""The payout business core: rating-tiered courier compensation.

Faithful re-expression of the reference's mart CTE chain
(``sql/courier_ledger_update.sql:27-72``) as Catalyst column expressions:

- C1 tier-percentage CASE (``:30-39``): 4 branches, **no ELSE** — a courier-month
  with NULL ``rate_avg`` (zero rated deliveries, the FILTERed avg at ``:10``)
  propagates NULL, exactly like Postgres.
- C2 per-order minimum-floor CASE (``:54-64``): same tiers; if the percentage payout
  is below ``floor × orders_count`` pay the floor; ELSE keep the percentage payout.
- C3 final reward (``:71``): payout + 95% of tips (company keeps 5%).
- A5 filtered average (``:10``): ``avg(rating) FILTER (WHERE rating BETWEEN 1 AND 5)``
  — rating 0 means "not rated" (``DWH Design (ENG).md:148``) and is excluded.

All money arithmetic is Decimal (order-independent re-aggregation at cluster scale);
tier thresholds compare against the *unrounded* average, as the reference does.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (lower_inclusive, upper_exclusive, percentage, per-order floor) —
#: sql/courier_ledger_update.sql:30-39 and :54-64.
TIERS: list[tuple[Decimal | None, Decimal | None, Decimal, Decimal]] = [
    (None, Decimal("4.0"), Decimal("0.05"), Decimal("100")),
    (Decimal("4.0"), Decimal("4.5"), Decimal("0.07"), Decimal("150")),
    (Decimal("4.5"), Decimal("4.9"), Decimal("0.08"), Decimal("175")),
    (Decimal("4.9"), None, Decimal("0.10"), Decimal("200")),
]


def rated_avg(rating: Column) -> Column:
    """``avg(rating) FILTER (WHERE rating BETWEEN 1 AND 5)``
    (sql/courier_ledger_update.sql:10). ``avg`` ignores NULLs, so a ``when`` without
    ``otherwise`` reproduces FILTER exactly; all-unrated groups yield NULL."""
    return F.avg(F.when(rating.between(1, 5), rating))


def _tier_predicate(rate_avg: Column, lo: Decimal | None, hi: Decimal | None) -> Column:
    if lo is None:
        return rate_avg < F.lit(hi)
    if hi is None:
        return rate_avg >= F.lit(lo)
    return (rate_avg < F.lit(hi)) & (rate_avg >= F.lit(lo))


def tier_percentage_payout(rate_avg: Column, orders_total_sum: Column) -> Column:
    """C1 (sql/courier_ledger_update.sql:30-39): tiered percentage of the monthly
    order total. No ``otherwise`` — NULL rate_avg → NULL payout, as in Postgres."""
    expr: Column | None = None
    for lo, hi, pct, _floor in TIERS:
        branch = _tier_predicate(rate_avg, lo, hi)
        payout = orders_total_sum * F.lit(pct)
        expr = F.when(branch, payout) if expr is None else expr.when(branch, payout)
    assert expr is not None
    return expr


def tier_floor_payout(rate_avg: Column, courier_order_sum: Column, orders_count: Column) -> Column:
    """C2 (sql/courier_ledger_update.sql:54-64): enforce the per-order minimum floor
    within each tier; ELSE keeps the percentage payout (and propagates NULL)."""
    expr: Column | None = None
    for lo, hi, _pct, floor in TIERS:
        branch = _tier_predicate(rate_avg, lo, hi) & (
            courier_order_sum < F.lit(floor) * orders_count
        )
        floored = F.lit(floor) * orders_count
        expr = F.when(branch, floored) if expr is None else expr.when(branch, floored)
    assert expr is not None
    return expr.otherwise(courier_order_sum)


def final_reward(courier_order_sum: Column, courier_tips_sum: Column) -> Column:
    """C3 (sql/courier_ledger_update.sql:71): payout + 95% of tips."""
    return courier_order_sum + courier_tips_sum * F.lit(Decimal("0.95"))


def order_processing_fee(orders_total_sum: Column) -> Column:
    """A6 (sql/courier_ledger_update.sql:11): platform keeps a 25% processing fee."""
    return orders_total_sum * F.lit(Decimal("0.25"))
