"""yetisearch_spark — a PySpark-native full-text index build + BM25 query engine.

A from-scratch rebuild of the capabilities of yetidevworks/yetisearch
(reference at /root/reference, pure-PHP over SQLite FTS5) re-expressed
Spark-first: DataFrame/SQL plans, Arrow-vectorized UDF kernels,
partitioned varint-compressed posting lists, and FTS5-parity BM25
scoring (rank-identical to a SQLite FTS5 oracle on the fixture suite).
"""

__version__ = "0.1.0"
