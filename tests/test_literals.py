"""array_lit round-trip laws (functions/literals.py): one parsed array()
literal must reproduce every element bit-exactly — including scientific-
notation floats (repr of tiny DSIR ratios), extreme doubles, and int64
min/max — and reject inputs whose element type a state literal can't carry."""

from __future__ import annotations

import pytest

from airflow_courier_payout_ledger_pipeline_spark.functions.literals import array_lit


def test_float_roundtrip_bit_exact(spark):
    vals = [9.5367431640625e-07, 1.0, -2.5e300, 0.1, 123456.789, 1 / 1048576]
    got = spark.range(1).select(array_lit(vals).alias("a")).collect()[0]["a"]
    assert got == vals  # exact equality: repr round-trips, parser rounds correctly


def test_int_roundtrip_including_int64_extremes(spark):
    vals = [-(2**63), 2**63 - 1, 0, 42]
    got = spark.range(1).select(array_lit(vals).alias("a")).collect()[0]["a"]
    assert got == vals


def test_bigint_element_type_preserved_for_small_values(spark):
    # the getbit width guarantee: small values must still parse as BIGINT
    df = spark.range(1).select(array_lit([1, 2, 3]).alias("a"))
    assert df.schema["a"].dataType.simpleString() == "array<bigint>"


def test_rejects_empty_mixed_and_bool():
    with pytest.raises(ValueError, match="non-empty"):
        array_lit([])
    with pytest.raises(TypeError, match="all-int or all-float"):
        array_lit([1, 2.0])
    with pytest.raises(TypeError, match="not bool"):
        array_lit([True, False])
