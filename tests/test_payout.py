"""Hand-computed edge cases for the payout core (SURVEY.md §5.2, FIXTURES.md §4):
tier boundaries at 4.0/4.5/4.9, floor-vs-percentage on both sides of each floor,
the all-unrated NULL hazard, and order-month (not delivery-month) attribution."""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.plans.ledger import courier_ledger

D = Decimal


def _domain(spark, deliveries):
    """Build the four snowflake frames from (courier, order_key, order_ts, order_sum,
    rating, tips) tuples; one delivery per order."""
    fct = spark.createDataFrame(
        [
            (
                i,
                f"d-{i}",
                hash(r[1]) % (2**31),
                0,
                D(r[3]).quantize(D("0.01")),
                r[0],
                r[4],
                D(r[5]).quantize(D("0.01")),
            )
            for i, r in enumerate(deliveries)
        ],
        "id long, delivery_key string, order_id long, timestamp_id long, "
        "order_sum decimal(14,2), courier_id long, rating smallint, tips decimal(14,2)",
    )
    couriers = spark.createDataFrame(
        [(c, f"key-{c}", f"Courier {c}") for c in {r[0] for r in deliveries}],
        "id long, courier_key string, courier_name string",
    )
    orders = spark.createDataFrame(
        [(hash(r[1]) % (2**31), r[1], hash(r[2]) % (2**31)) for r in deliveries],
        "id long, order_key string, timestamp_id long",
    ).dropDuplicates(["id"])
    ts = spark.createDataFrame(
        [
            (
                hash(r[2]) % (2**31),
                r[2],
                r[2].year,
                r[2].month,
                r[2].day,
                r[2].strftime("%H:%M:%S"),
                r[2].date(),
            )
            for r in deliveries
        ],
        "id long, ts timestamp, year smallint, month smallint, day smallint, "
        "time string, date date",
    ).dropDuplicates(["id"])
    return fct, couriers, orders, ts


def _ledger_map(spark, deliveries):
    out = courier_ledger(*_domain(spark, deliveries)).collect()
    return {(r.courier_id, r.settlement_year, r.settlement_month): r for r in out}


TS = datetime(2023, 5, 10, 12, 0, 0)


def test_tier_boundaries_and_percentages(spark):
    # courier 1: avg 3.99.. (<4) → 5%; courier 2: avg exactly 4.0 → 7%;
    # courier 3: avg 4.5 → 8%; courier 4: avg 4.9 → 10%.
    # Large sums so the floor never kicks in.
    rows = []
    rows += [(1, "o1a", TS, "10000", 3, "0"), (1, "o1b", TS, "10000", 5, "0"),
             (1, "o1c", TS, "10000", 3, "0"), (1, "o1d", TS, "10000", 4, "0")]  # avg 3.75
    rows += [(2, "o2a", TS, "10000", 4, "0"), (2, "o2b", TS, "10000", 4, "0")]  # avg 4.0
    rows += [(3, "o3a", TS, "10000", 4, "0"), (3, "o3b", TS, "10000", 5, "0")]  # avg 4.5
    rows += [(4, "o4a", TS, "10000", 5, "0"), (4, "o4b", TS, "10000", 5, "0"),
             (4, "o4c", TS, "10000", 5, "0"), (4, "o4d", TS, "10000", 5, "0"),
             (4, "o4e", TS, "10000", 5, "0"), (4, "o4f", TS, "10000", 5, "0"),
             (4, "o4g", TS, "10000", 5, "0"), (4, "o4h", TS, "10000", 5, "0"),
             (4, "o4i", TS, "10000", 5, "0"), (4, "o4j", TS, "10000", 4, "0")]  # avg 4.9
    led = _ledger_map(spark, rows)
    assert led[("1", 2023, 5)].courier_order_sum == D("2000.00")  # 40000*0.05
    assert led[("2", 2023, 5)].courier_order_sum == D("1400.00")  # 20000*0.07
    assert led[("3", 2023, 5)].courier_order_sum == D("1600.00")  # 20000*0.08
    assert led[("4", 2023, 5)].courier_order_sum == D("10000.00")  # 100000*0.10
    assert led[("1", 2023, 5)].rate_avg == D("3.75")
    assert led[("4", 2023, 5)].order_processing_fee == D("25000.00")


def test_floor_kicks_in_per_tier(spark):
    # Small order sums: pct payout below floor×count in every tier.
    rows = [
        (1, "p1", TS, "100", 3, "0"),   # 5% → 5 < 100 → floor 100
        (2, "p2", TS, "100", 4, "0"),   # 7% → 7 < 150 → floor 150
        (3, "p3", TS, "100", 5, "0"), (3, "p4", TS, "100", 4, "0"),  # avg 4.5, 8% → 16 < 350
        (4, "p5", TS, "100", 5, "0"),   # 10% → 10 < 200 → floor 200
    ]
    led = _ledger_map(spark, rows)
    assert led[("1", 2023, 5)].courier_order_sum == D("100.00")
    assert led[("2", 2023, 5)].courier_order_sum == D("150.00")
    assert led[("3", 2023, 5)].courier_order_sum == D("350.00")  # 175 × 2 orders
    assert led[("4", 2023, 5)].courier_order_sum == D("200.00")


def test_reward_is_payout_plus_95pct_tips(spark):
    rows = [(1, "r1", TS, "10000", 5, "100.00")]
    led = _ledger_map(spark, rows)
    r = led[("1", 2023, 5)]
    # 10% of 10000 = 1000 ≥ 200-floor; reward = 1000 + 0.95×100
    assert r.courier_order_sum == D("1000.00")
    assert r.courier_tips_sum == D("100.00")
    assert r.courier_reward_sum == D("1095.00")


def test_all_unrated_month_propagates_null(spark):
    """The §2.3 hazard: rating 0 only → rate_avg NULL → payout/reward NULL
    (the reference would violate its NOT NULL mart constraints; we reproduce the
    arithmetic and surface NULLs for the validation layer)."""
    rows = [(1, "u1", TS, "5000", 0, "10")]
    led = _ledger_map(spark, rows)
    r = led[("1", 2023, 5)]
    assert r.rate_avg is None
    assert r.courier_order_sum is None
    assert r.courier_reward_sum is None
    assert r.orders_total_sum == D("5000.00")  # aggregates still present
    assert r.courier_tips_sum == D("10.00")


def test_rating_zero_excluded_from_avg_but_counted(spark):
    rows = [(1, "m1", TS, "1000", 0, "0"), (1, "m2", TS, "1000", 5, "0")]
    led = _ledger_map(spark, rows)
    r = led[("1", 2023, 5)]
    assert r.rate_avg == D("5.00")  # 0 excluded by FILTER
    assert r.orders_count == 2      # but the delivery still counts


def test_month_attribution_uses_order_timestamp(spark):
    """Delivery in June, order placed in May → settles in May
    (sql/courier_ledger_update.sql:16-19 joins dmo.timestamp_id)."""
    may = datetime(2023, 5, 31, 23, 0, 0)
    rows = [(1, "x1", may, "10000", 5, "0")]
    # the fact's own timestamp_id points elsewhere by construction in _domain
    led = _ledger_map(spark, rows)
    assert ("1", 2023, 5) in led and ("1", 2023, 6) not in led


def test_missing_dim_drops_delivery(spark):
    """J2 semantics: inner join silently drops facts with unknown dims."""
    fct, couriers, orders, ts = _domain(spark, [(1, "k1", TS, "1000", 5, "0")])
    orders_empty = orders.filter(F.lit(False))
    out = courier_ledger(fct, couriers, orders_empty, ts).collect()
    assert out == []
