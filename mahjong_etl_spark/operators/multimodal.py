"""Multimodal-column operators (filled in incrementally)."""
