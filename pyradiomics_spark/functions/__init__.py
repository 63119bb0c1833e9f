"""Columnar functions: text extraction, tokenization, intensity transforms,
text-quality analytics. All vectorized (Arrow pandas UDFs or builtin
pyspark.sql.functions) — no per-row Python UDFs on any hot path."""
