"""Layered lakehouse IO: stg (bronze) / dds (silver) / cdm (gold) parquet tables.

Replaces the reference's Postgres schemas (``DWH Design (ENG).md:50-144``) with
partitioned parquet directories. Upserted tables are rewritten via a staging-dir
swap (write tmp → swap) because parquet has no in-place MERGE; the swap keeps
readers from ever seeing a half-written table, and SCD0/SCD1 idempotency makes
re-runs after a crash safe (SURVEY.md §2.6/§3.3). On Delta-enabled deployments the
same operators map to ``MERGE INTO`` — the plan layer is storage-agnostic.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class Lakehouse:
    def __init__(self, root: str) -> None:
        self.root = Path(root)

    def path(self, layer: str, table: str) -> str:
        return str(self.root / layer / table)

    def exists(self, layer: str, table: str) -> bool:
        return (self.root / layer / table).exists()

    def read(
        self, spark: SparkSession, layer: str, table: str, schema: StructType
    ) -> DataFrame:
        """Read a table; a never-written table reads as empty with its declared
        schema (first-run bootstrap)."""
        if not self.exists(layer, table):
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(self.path(layer, table))

    def append(
        self, df: DataFrame, layer: str, table: str, partition_by: list[str] | None = None
    ) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(layer, table))

    def overwrite(
        self, df: DataFrame, layer: str, table: str, partition_by: list[str] | None = None
    ) -> None:
        """Full-state rewrite via staging dir + swap — safe even when ``df`` reads
        from the table being replaced (parquet can't self-overwrite)."""
        final = Path(self.path(layer, table))
        tmp = final.with_name(f"{final.name}.__tmp_{uuid.uuid4().hex[:8]}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(str(tmp))
        old = final.with_name(f"{final.name}.__old_{uuid.uuid4().hex[:8]}")
        if final.exists():
            final.rename(old)
        tmp.rename(final)
        if old.exists():
            shutil.rmtree(old)
