"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference CDC pipeline
(GOUTAM-TAK/CDC-change-data-capture-pipeline-from-mysql-to-pinecone),
re-expressed Spark-first.

The reference is a poll-based MySQL -> embed -> Pinecone ETL
(see SURVEY.md). This package provides the same capabilities as
first-class, composable DataFrame operators:

- ``sources``    : parquet/CSV/JSON/JDBC table loaders + catalog helpers
- ``operators``  : CDC (watermark scan/commit, chunking, snapshot),
                   dedup (exact / minhash-LSH / simhash / jaccard /
                   embedding), vectors (cosine top-k, LSH ANN), text
                   analysis, multimodal plumbing
- ``functions``  : canonical row->JSON serialization, portable hashing,
                   vector math — all built on JVM-side
                   ``pyspark.sql.functions`` (no row-at-a-time UDFs)
- ``streaming``  : the reference's poll loop as Structured Streaming /
                   batch micro-ticks with exactly-once watermark commits
- ``plans``      : plan-inspection helpers (pushdown/broadcast asserts)

Everything here derives from the public PySpark API; reference file:line
citations in docstrings point at the behavior being re-expressed.
"""

from .session import get_spark, session_cache

__all__ = ["get_spark", "session_cache"]
