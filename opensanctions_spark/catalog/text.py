"""Text-analysis catalog queries (filled in incrementally)."""
