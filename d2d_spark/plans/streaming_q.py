"""Streaming-analog queries (filled in incrementally)."""
