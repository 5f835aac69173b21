"""Shared state helpers: broadcast lookups + counters."""
