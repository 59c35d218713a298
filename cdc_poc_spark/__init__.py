"""cdc_poc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference CDC pipeline
(Abdulelah-Aldhafer1/CDC-POC, surveyed in SURVEY.md).

Design stance (SURVEY.md §7.1): batch-first DataFrame operators, each a pure
DataFrame -> DataFrame function that Catalyst can optimize end-to-end, with a
Structured Streaming twin applying the same functions inside foreachBatch.
No custom Catalyst rules are needed for parity (SURVEY.md §4.1) — the
reference has no optimizer; everything maps to built-in Spark operators.
"""

__version__ = "0.1.0"
