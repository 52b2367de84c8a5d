"""Scalar-function coverage queries (SURVEY.md §2.8)."""
