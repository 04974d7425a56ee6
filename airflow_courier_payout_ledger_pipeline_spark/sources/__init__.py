"""Data sources: paginated REST extraction (S1/S2) and lakehouse parquet IO."""
