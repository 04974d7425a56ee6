"""PySpark-native analytics engine with the query/data-processing capabilities of
``starshev/Airflow-Courier-Payout-Ledger-Pipeline`` (reference at /root/reference,
read-only), re-designed Spark-first.

The reference is an Airflow-orchestrated ELT pipeline whose compute is delegated to
PostgreSQL (see SURVEY.md). This package re-expresses its semantics — watermark-based
incremental ingestion, layered lakehouse (bronze raw JSON → silver snowflake
dims/facts → gold settlement mart), SCD0/SCD1 merge semantics, and the rating-tiered
courier payout calculation — as idiomatic PySpark DataFrame operators designed for
100 TB scale (DecimalType money, broadcast dims, partitioned Parquet, no Python UDFs
in the core path), plus large-scale training-data-pipeline extensions (dedup,
similarity search, multimodal columns, text analysis, event-time windows).
"""

__version__ = "0.1.0"
