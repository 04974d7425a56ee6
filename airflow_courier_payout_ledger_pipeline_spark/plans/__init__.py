"""Job-level plans (one module per reference pipeline stage)."""
