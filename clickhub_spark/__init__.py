"""clickhub_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ClickHouse/clickhub reference.

Everything is DataFrame-first: query builders construct Catalyst logical
plans and let the optimizer (pushdown, pruning, AQE) pick physical
strategy.  See SURVEY.md for the operator inventory this implements.
"""

__version__ = "0.1.0"
