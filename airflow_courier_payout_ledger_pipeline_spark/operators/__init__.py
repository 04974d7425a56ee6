"""Reusable dataframe-level operators (merge semantics, watermark state, dedup,
similarity search, multimodal plumbing)."""
