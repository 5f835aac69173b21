"""Pure-Python per-document engine. No Ray imports here.

Every module in this package is deliberately import-light so that a Ray
actor's ``__init__`` can build all shared state (tag traits, entity
tables, compiled selectors) once per worker process.
"""
