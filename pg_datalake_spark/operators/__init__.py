"""Reusable DataFrame operators beyond the built-in Spark surface."""
