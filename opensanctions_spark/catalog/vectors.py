"""Vector similarity catalog queries (filled in incrementally)."""
