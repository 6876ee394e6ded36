"""Deterministic rule spec shared by the Spark UDFs, the plain-Python
oracle, and the unit tests.

Everything in this package is pure Python/numpy over plain data (dicts,
lists, strings) — no Spark, no I/O — so the same module executes inside
Arrow-batched pandas UDFs and in driver-side tests.
"""
