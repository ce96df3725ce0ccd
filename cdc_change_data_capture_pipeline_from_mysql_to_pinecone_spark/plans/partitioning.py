"""Partitioning helpers.

A small parquet file arrives as ONE input split, which serializes any
CPU-heavy downstream stage (tokenization, hashing, decode) onto one
core — invisible at 100 TB (thousands of splits) but a 30x penalty on
a laptop-sized fixture. ``ensure_parallelism`` widens such inputs to
the session's core count; on a real cluster with enough splits it is
a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition up to the session default parallelism when the
    input has fewer partitions — before a CPU-bound stage. Hash
    partitioning on ``key_cols`` when given (keeps a later groupBy on
    the same keys shuffle-free), round-robin otherwise."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *key_cols)
    return df.repartition(target)
