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


def test_forward_direction_and_tolerance_match_pandas_merge_asof(spark):
    """Forward + tolerance semantics against pandas' reference merge_asof on a
    numeric time axis: nearest at-or-after within the horizon, NULL beyond it
    (never falling through to a farther row), ties inclusive."""
    import pandas as pd

    from airflow_courier_payout_ledger_pipeline_spark.operators.asof import asof_join

    left_rows = [("k", t) for t in [0, 5, 10, 14, 20, 100]]
    right_rows = [("k", t, t * 10) for t in [5, 12, 30]]
    left = spark.createDataFrame(left_rows, "key string, ts long")
    right = spark.createDataFrame(right_rows, "key string, rts long, v long")
    out = {
        r.ts: (r.rts_asof, r.v)
        for r in asof_join(
            left, right, "key", "ts", "rts", ["v"],
            direction="forward", tolerance_seconds=6,
        ).collect()
    }
    lp = pd.DataFrame(left_rows, columns=["key", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["key", "rts", "v"]).sort_values("rts")
    ref = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="key",
        direction="forward", tolerance=6,
    )
    for _, row in ref.iterrows():
        want = (None, None) if pd.isna(row["rts"]) else (int(row["rts"]), int(row["v"]))
        assert out[int(row["ts"])] == want, (row["ts"], out[int(row["ts"])], want)


def test_backward_default_unchanged_by_new_parameters(spark):
    from airflow_courier_payout_ledger_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10), ("k", 3)], "key string, ts long")
    right = spark.createDataFrame([("k", 4, 1), ("k", 9, 2)], "key string, rts long, v long")
    out = {r.ts: r.v for r in asof_join(left, right, "key", "ts", "rts", ["v"]).collect()}
    assert out == {10: 2, 3: None}


def test_nearest_direction_matches_pandas_and_single_sort(spark):
    """Nearest = closer of backward/forward with ties to backward (pandas
    merge_asof parity is property-tested in test_properties.py; this pins a
    readable fixed case incl. an exact tie) — and the plan carries BOTH
    directions on ONE ascending sort: exactly one Window exec, no second
    exchange/sort for the forward frame."""
    import pandas as pd

    from airflow_courier_payout_ledger_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 0), (1, 19, 1), (1, 25, 2), (2, 7, 3)],
        "key int, ts long, lid long",
    )
    right = spark.createDataFrame(
        [(1, 5, 100), (1, 15, 200), (1, 30, 300), (2, 2, 400), (2, 12, 500)],
        "key int, rts long, v long",
    )
    out = asof_join(left, right, "key", "ts", "rts", ["v"], direction="nearest")
    got = {r.lid: (r.rts_asof, r.v) for r in out.collect()}
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("rts")
    ref = pd.merge_asof(lp, rp, left_on="ts", right_on="rts", by="key",
                        direction="nearest")
    for _, row in ref.iterrows():
        assert got[row["lid"]] == (row["rts"], row["v"])
    # lid=3: ts=7 is equidistant from rts 2 and 12 -> backward (2) wins
    assert got[3] == (2, 400)
    # AQE prints final + initial plans; count in the final section only
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Window [") == 1  # both carries in ONE window exec
    assert final.count("+- Exchange") + final.count("- Exchange") <= 2  # one (dedup'd) exchange line
    assert len([l for l in final.splitlines() if "Sort [" in l]) == 1  # one sort
