"""Deduplication operators (filled in incrementally)."""
