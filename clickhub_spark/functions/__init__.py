"""Scalar function helpers (vector math, text stats) — all built-in
pyspark.sql.functions compositions; no row-at-a-time Python UDFs.
"""
