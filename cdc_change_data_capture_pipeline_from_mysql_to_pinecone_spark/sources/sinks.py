"""Keyed sinks: the Pinecone-upsert analogue on plain parquet.

The reference upserts ``{id, values, metadata}`` batches into a cosine
index (service_layer/service.py:151-166) and its watermark table via
``INSERT ... ON DUPLICATE KEY UPDATE`` (service.py:35-46). Without a
transactional table format in this environment, MERGE is expressed as
read + union + last-writer-wins window + atomic directory swap —
correct for the engine's keyed tables (watermark, vectors), and the
``foreachBatch`` body a Structured Streaming sink uses for
exactly-once effect given deterministic ids (SURVEY §4 "exactly-once").

At 100 TB the same call sites would target Delta/Iceberg MERGE — the
operator contract (keyed last-writer-wins) is format-independent.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> None:
    """MERGE ``updates`` into the keyed parquet table at ``path``:
    highest ``version_col`` per key wins; replay-idempotent."""
    if os.path.exists(path):
        current = spark.read.parquet(path)
        merged = current.unionByName(updates)
    else:
        merged = updates
    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
    deduped = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    deduped.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed managed table so later equi-joins /
    aggregations on ``bucket_col`` are co-located — no Exchange at
    read time. The bucketing analogue of the reference's implicit
    per-table processing locality, and the standard way a 100 TB fact
    table avoids re-shuffling on every join with its natural key."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)
