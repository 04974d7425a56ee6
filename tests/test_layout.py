"""operators/layout.py: Morton z-value correctness, z-ordered write giving
bounded per-row-group ranges on BOTH dimensions, and the top-k-per-group
WindowGroupLimit plan rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.operators.layout import (
    morton_sql,
    morton_zvalue,
    zorder_layout,
)


def _py_morton(vals: list[int], bits: int) -> int:
    n = len(vals)
    z = 0
    for c, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * n + c)
    return z


def test_morton_matches_python_reference(spark):
    rows = [(i, (i * 7) % 64, (i * 13) % 64) for i in range(100)]
    df = spark.createDataFrame(rows, "k bigint, x bigint, y bigint")
    out = {
        r.k: r.z
        for r in df.select(
            "k", morton_zvalue([F.col("x"), F.col("y")], bits=6).alias("z")
        ).collect()
    }
    for k, x, y in rows:
        assert out[k] == _py_morton([x, y], 6)


def test_morton_sql_twin_agrees(spark):
    import duckdb

    rows = [((i * 11) % 32, (i * 3) % 32) for i in range(50)]
    got = duckdb.sql(
        "SELECT x, y, " + morton_sql(["x", "y"], 5) + " AS z FROM "
        "(SELECT unnest(range(50)) * 11 % 32 AS x, unnest(range(50)) * 3 % 32 AS y)"
    ).fetchall()
    for x, y, z in got:
        assert z == _py_morton([x, y], 5)


def test_zorder_write_bounds_both_dims(spark, tmp_path):
    """Linear sort on x leaves y unbounded per file; z-order bounds both."""
    import pyarrow.parquet as pq

    n = 64
    grid = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(grid, "x bigint, y bigint")

    zpath = str(tmp_path / "zorder")
    zorder_layout(df, ["x", "y"], bits=6, num_files=16).write.parquet(zpath)
    lpath = str(tmp_path / "linear")
    df.repartitionByRange(16, "x").sortWithinPartitions("x", "y").write.parquet(lpath)

    def per_file_ranges(path):
        import glob

        ranges = []
        for f in glob.glob(f"{path}/*.parquet"):
            t = pq.read_table(f)
            if t.num_rows == 0:
                continue
            xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
            ranges.append((max(xs) - min(xs), max(ys) - min(ys)))
        return ranges

    z_ranges = per_file_ranges(zpath)
    l_ranges = per_file_ranges(lpath)
    # every z-ordered file is a bounded box in BOTH dims (≤ half the domain);
    # the linear layout leaves y spanning the full domain in every file
    assert all(dx <= n // 2 and dy <= n // 2 for dx, dy in z_ranges), z_ranges
    assert all(dy == n - 1 for _, dy in l_ranges), l_ranges


def test_topk_per_group_uses_window_group_limit(spark):
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(i % 5, i, i * 3 % 100) for i in range(100)], "g int, id bigint, v bigint"
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id"))
    out = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert out.count() == 15
