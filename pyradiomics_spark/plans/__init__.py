"""Config-driven pipeline plans."""
