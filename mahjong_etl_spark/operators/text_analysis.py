"""Text-analysis operators (filled in incrementally)."""
