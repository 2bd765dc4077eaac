"""LLM-pipeline operator queries (filled in incrementally)."""
