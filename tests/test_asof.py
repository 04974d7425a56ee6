"""As-of join semantics: backward-inclusive matching, NULL before first right row,
per-key isolation (the oracle harness checks engine parity; this checks known
answers)."""

from __future__ import annotations

from airflow_courier_payout_ledger_pipeline_spark.operators.asof import asof_join


def test_asof_backward_inclusive_and_null_before_first(spark):
    left = spark.createDataFrame(
        [
            (1, 5, "e1"),   # before any right row -> NULL
            (1, 10, "e2"),  # exactly at right ts 10 -> inclusive match
            (1, 17, "e3"),  # between 10 and 20 -> matches 10
            (1, 25, "e4"),  # after 20 -> matches 20
            (2, 100, "e5"),  # other key: right rows of key 1 invisible
        ],
        "k int, ts int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 20, "r20"), (2, 999, "rX")],
        "k int, rts int, payload string",
    )
    out = {
        r.tag: (r.rts_asof, r.payload)
        for r in asof_join(left, right, "k", "ts", "rts", ["payload"]).collect()
    }
    assert out == {
        "e1": (None, None),
        "e2": (10, "r10"),
        "e3": (10, "r10"),
        "e4": (20, "r20"),
        "e5": (None, None),
    }
    assert len(out) == 5  # exactly one output row per left row
