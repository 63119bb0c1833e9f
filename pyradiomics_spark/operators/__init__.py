"""Spark operators: feature extraction, as-of join, windows, sessionize,
dedup, similarity search, resegmentation, leakage audit."""
