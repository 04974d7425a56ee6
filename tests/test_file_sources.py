"""CSV/JSONL ingest sources: declared schemas, corrupt-record capture, clean
split for quarantine promotion."""

from __future__ import annotations

from pyspark.sql.types import StructType

from airflow_courier_payout_ledger_pipeline_spark.sources.files import (
    read_csv,
    read_jsonl,
    split_corrupt,
)

def _schema():
    # fromDDL needs an active session — build lazily inside tests
    return StructType.fromDDL("delivery_key string, sum double")


def test_jsonl_captures_corrupt_lines(spark, tmp_path):
    SCHEMA = _schema()
    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"delivery_key": "d1", "sum": 10.5}\n'
        "this is not json at all\n"
        '{"delivery_key": "d2", "sum": 7.25}\n'
    )
    df = read_jsonl(spark, str(p), SCHEMA)
    clean, bad = split_corrupt(df)
    assert {(r.delivery_key, r.sum) for r in clean.collect()} == {("d1", 10.5), ("d2", 7.25)}
    assert clean.columns == ["delivery_key", "sum"]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not json" in bad_rows[0]._corrupt_record


def test_csv_declared_schema_and_corrupt_capture(spark, tmp_path):
    SCHEMA = _schema()
    p = tmp_path / "feed.csv"
    p.write_text("delivery_key,sum\nd1,10.5\nd2,not_a_number\nd3,7.25\n")
    clean, bad = split_corrupt(read_csv(spark, str(p), SCHEMA))
    assert {(r.delivery_key, r.sum) for r in clean.collect()} == {("d1", 10.5), ("d3", 7.25)}
    # collect, not count: corrupt-column-only queries are unsupported by Spark
    assert len(bad.collect()) == 1  # the unparseable 'sum' lands in quarantine


def test_orc_roundtrip_with_pruning(spark, tmp_path):
    """ORC interchange: roundtrip preserves values, and a projection prunes
    columns at the scan (ReadSchema excludes the unused column)."""
    from pyspark.sql.types import StructType

    from airflow_courier_payout_ledger_pipeline_spark.sources.files import (
        read_orc,
        write_orc,
    )

    schema = StructType.fromDDL("k string, v int, extra string")
    df = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y")], schema
    )
    path = str(tmp_path / "t.orc")
    write_orc(df, path)
    back = read_orc(spark, path, schema)
    assert {(r.k, r.v, r.extra) for r in back.collect()} == {("a", 1, "x"), ("b", 2, "y")}
    phys = back.select("k")._jdf.queryExecution().executedPlan().toString()
    assert "extra" not in phys.split("ReadSchema")[-1]
