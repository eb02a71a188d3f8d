"""Text-analysis + deduplication operators for training-data
pipelines over the `documents` table.

All operators are pure Spark Column expressions (higher-order array
functions, whole-stage codegen, zero Python UDFs); each has an exact
ANSI-SQL twin so DuckDB oracles can verify them value-for-value.
"""
