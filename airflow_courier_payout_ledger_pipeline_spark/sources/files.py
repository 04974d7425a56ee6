"""File-format sources beyond parquet: schema-declared CSV and JSON-lines
readers with explicit bad-record capture — the landing formats a real ingest
edge actually receives (API dumps, partner feeds) before bronze promotion.

Rules that matter at 100 TB:

- **Never infer schemas.** ``inferSchema``/sampling costs an extra full scan and
  makes the table contract data-dependent; every reader here requires the
  declared StructType (schemas.py is the contract).
- **Capture, don't crash, on malformed rows.** PERMISSIVE mode + an explicit
  ``_corrupt_record`` column lands bad lines for quarantine (the same
  annotate/quarantine policy as operators/validate.py) instead of failing a
  multi-hour job at row 10^11 (FAILFAST) or silently dropping data (DROPMALFORMED).
- **JSON/CSV are ingest formats, not storage formats.** No column pruning, no
  predicate pushdown, row-at-a-time parsing — promote to parquet in bronze and
  never scan the text twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType([*schema.fields, StructField(CORRUPT_COL, StringType(), True)])


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines with declared schema; malformed lines surface whole in
    ``_corrupt_record`` (NULL elsewhere), well-formed lines have it NULL."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True, sep: str = ","
) -> DataFrame:
    """CSV with declared schema + corrupt capture; header (if any) is validated
    against the schema order by Spark, never used for inference."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, corrupt_rows) — feed the right side to
    the quarantine table, promote the left to bronze parquet.

    Spark restriction: a query that references ONLY ``_corrupt_record`` (e.g.
    ``bad.count()``, which prunes every other column) raises — Spark can't
    prune a text parse down to just its error side-channel. Write/collect the
    corrupt rows (they carry all columns) instead of count()ing them."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """ORC with declared schema — the other columnar interchange format a
    lakehouse edge receives (Hive/Trino estates). Columnar like parquet:
    column pruning and predicate pushdown apply, so unlike CSV/JSONL an ORC
    table is queryable in place; promotion to parquet is a convention choice,
    not a performance rescue."""
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC writer (interchange with Hive/Trino consumers)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
