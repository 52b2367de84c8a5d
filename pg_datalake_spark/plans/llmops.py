"""LLM-data-pipeline queries (dedup, similarity, text analysis)."""
