"""Corpus synthesis + read helpers (Ray Data sources)."""
