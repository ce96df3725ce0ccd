"""Pluggable vector-index sink connector.

The reference upserts ``{id, values, metadata}`` records into Pinecone
in batches of 10 with no retry (service_layer/service.py:151-166: the
batch loop at :152-154, one ``index.upsert`` per batch at :160-166).
This module is that connector contract made first-class and
executor-parallel:

- ``foreach_batch_vector_upsert`` is a ``foreachBatch``-shaped function
  (or callable directly on a batch DataFrame): every *partition* streams
  its rows in ``batch_size`` groups to a user-supplied ``upsert``
  callable with bounded retry + exponential backoff. The callable is
  whatever client the deployment uses (an HTTP vector index, a JDBC
  MERGE, the keyed-parquet table in this repo) — the engine only fixes
  the delivery semantics:

  * at-least-once per batch (retry on transient failure, raise after
    ``max_retries`` so Structured Streaming replays the epoch);
  * idempotent end-to-end given deterministic chunk ids (the repo's
    chunking guarantees them; the reference's uuid4 ids would duplicate
    on exactly this replay path — SURVEY §2.9 T3);
  * batching is per executor partition: N partitions push concurrently,
    unlike the reference's single serial loop.

No external index exists in this environment, so tests drive the
contract with filesystem-backed fakes (including transient-failure
injection); the parquet-table implementation is
``sinks.upsert_parquet_partitioned``.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, Row

#: ≙ service_layer/service.py:151 — docs per upsert call.
DEFAULT_BATCH_SIZE = 10


def iter_batches(rows: Iterable[Row], batch_size: int) -> Iterator[list[Row]]:
    """Group an iterator into lists of ``batch_size`` (last may be
    short) without materializing the partition (≙ the reference's
    slice loop, service.py:152-154, but streaming)."""
    buf: list[Row] = []
    for r in rows:
        buf.append(r)
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf:
        yield buf


def send_with_retry(
    upsert: Callable[[list[dict]], None],
    batch: list[dict],
    max_retries: int = 3,
    backoff_seconds: float = 0.05,
) -> int:
    """Deliver one batch, retrying transient failures with exponential
    backoff. Returns the attempt count that succeeded (1-based).
    Raises the last error after ``max_retries`` attempts — under
    Structured Streaming the epoch then replays, and deterministic ids
    make that replay a no-op on the index."""
    attempt = 0
    while True:
        attempt += 1
        try:
            upsert(batch)
            return attempt
        except Exception:
            if attempt >= max_retries:
                raise
            time.sleep(backoff_seconds * (2 ** (attempt - 1)))


def foreach_batch_vector_upsert(
    batch_df: DataFrame,
    epoch_id: int,
    upsert: Callable[[list[dict]], None],
    batch_size: int = DEFAULT_BATCH_SIZE,
    max_retries: int = 3,
    backoff_seconds: float = 0.05,
) -> None:
    """``foreachBatch`` body: push the micro-batch to the vector index
    through ``upsert``, per partition, in ``batch_size`` groups.

    Usage::

        writer = stream.writeStream.foreachBatch(
            lambda df, eid: foreach_batch_vector_upsert(df, eid, my_upsert)
        )

    ``upsert`` receives ``list[dict]`` (row.asDict(recursive=True)) —
    the reference's ``[{"id", "values", "metadata"}, ...]`` payload
    shape (service.py:160-166).
    """

    def handle_partition(rows: Iterable[Row]) -> None:
        for batch in iter_batches(rows, batch_size):
            send_with_retry(
                upsert,
                [r.asDict(recursive=True) for r in batch],
                max_retries=max_retries,
                backoff_seconds=backoff_seconds,
            )

    batch_df.foreachPartition(handle_partition)
