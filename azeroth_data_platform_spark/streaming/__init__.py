"""Structured Streaming variants of the gold analytics."""
