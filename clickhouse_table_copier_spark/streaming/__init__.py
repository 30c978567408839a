"""Structured Streaming variants of the sync pipeline (incremental runs)."""
