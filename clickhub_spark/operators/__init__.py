"""Custom operators Spark lacks natively — dedup views, as-of joins,
similarity search — each built as a composition of DataFrame ops
(SURVEY §7 design stance: no RDDs, UDFs only where unavoidable).
"""
