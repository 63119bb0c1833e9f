"""Multimodal binary-column plumbing (decode stubs, real Spark mechanics)."""
