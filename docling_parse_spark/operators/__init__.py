"""Corpus-level operators: dedup families, similarity search, reading order."""
