"""Local replica of the driver's DuckDB-oracle compare (row count + schema +
order-insensitive values), used by tests to gate every registered query before the
driver ever sees it."""

from __future__ import annotations

import datetime
import decimal
import math
from pathlib import Path

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # Emulate the driver: it canonicalizes through pandas, where DuckDB
        # DECIMALs arrive as float64. Spark-side Decimals never reach here —
        # compare() rejects them up front (driver-unsafe).
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _rows_canonical(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "query") -> None:
    """Assert Spark result == DuckDB oracle result (order-insensitive), with the
    driver's pandas-canonicalizer quirks enforced: Spark Decimal columns
    hash-mismatch ('123.40' vs float 123.4) and array/map cells crash factorize,
    so both are rejected outright here (route through registry.driver_canonical)."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType

    unsafe = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (DecimalType, ArrayType, MapType))
    ]
    assert not unsafe, (
        f"{name}: driver-unsafe output column types {unsafe} — Decimal fails the "
        "driver's pandas hash, array/map crashes it; wrap with registry.driver_canonical"
    )
    # DuckDB HUGEINT (the implicit result of SUM/arithmetic on integers) becomes
    # float64 in the driver's pandas canonicalizer, hash-mismatching Spark's
    # int64 — while fetchall()'s Python ints below would agree. DESCRIBE is a
    # bind-only check, so this guard is free. (CORRECTNESS_r04: sequence_packing.)
    described = con.execute(f"DESCRIBE {sql}").fetchall()
    huge = [c for c, t, *_ in described if "HUGEINT" in str(t).upper()]
    assert not huge, (
        f"{name}: oracle columns {huge} are HUGEINT — pandas floats them on the "
        "driver; add an explicit ::BIGINT cast in the oracle SQL"
    )
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column sets differ\n spark={sorted(s_cols)}\n duck ={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row counts differ spark={len(s_rows)} duck={len(d_rows)}"
    )

    sc = _rows_canonical(s_cols, s_rows)
    dc = _rows_canonical(d_cols, d_rows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        only_s = [r for r in sc[:2000] if r not in set(dc[:2000])][:3]
        raise AssertionError(
            f"{name}: value mismatch; first paired diffs={diffs}\n spark-only sample={only_s}\n cols(sorted)={sorted(s_cols)}"
        )
