"""Relational-surface coverage queries (joins, windows, grouping sets, set ops).

Filled in per SURVEY.md §2.3-§2.7.
"""
