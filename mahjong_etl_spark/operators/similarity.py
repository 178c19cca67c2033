"""Similarity-search operators (filled in incrementally)."""
