"""Structured Streaming twins of the batch window operators (events stream)."""
