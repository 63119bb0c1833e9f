"""Structured Streaming operators: watermarked sessionize / windowed aggs."""
