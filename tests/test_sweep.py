"""End-to-end CDC sweep tests: the reference's scheduler tick
(controller.py:17-35) as a Spark pipeline with persisted state."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.streaming.pipeline import (  # noqa: E402
    sweep,
)

from pyspark.sql import functions as F  # noqa: E402

TABLES = {"events": ("ts", "event_id")}


def test_sweep_processes_then_idles(spark, sf_dir, tmp_path):
    """Sweep 1 processes everything; sweep 2 (unchanged source) must
    process nothing — the watermark protocol end-to-end (S4-S6/T2)."""
    store = str(tmp_path / "store")
    first = sweep(spark, sf_dir, store, TABLES)
    assert first == {"events": 1000}

    vectors = spark.read.parquet(os.path.join(store, "vectors"))
    assert vectors.count() == 10  # 1000 rows / 100-row chunks
    wm = spark.read.parquet(os.path.join(store, "watermark")).collect()
    assert len(wm) == 1 and wm[0]["table_name"] == "events"

    second = sweep(spark, sf_dir, store, TABLES)
    assert second == {"events": 0}
    assert spark.read.parquet(os.path.join(store, "vectors")).count() == 10


def test_sweep_multi_table(spark, sf_dir, tmp_path):
    """The reference loops ALL discovered tables (controller.py:25-27);
    the sweep does the same — one watermark row and one chunk-id
    namespace per table."""
    store = str(tmp_path / "store")
    tables = {"events": ("ts", "event_id"), "orders": ("o_orderdate", "o_orderkey")}
    first = sweep(spark, sf_dir, store, tables)
    assert first["events"] == 1000 and first["orders"] == 1500

    wm = {r["table_name"] for r in spark.read.parquet(os.path.join(store, "watermark")).collect()}
    assert wm == {"events", "orders"}
    vecs = spark.read.parquet(os.path.join(store, "vectors"))
    sources = {r["source"] for r in vecs.select("source").distinct().collect()}
    assert sources == {"events", "orders"}

    second = sweep(spark, sf_dir, store, tables)
    assert second == {"events": 0, "orders": 0}


def test_sweep_crash_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Crash between vector upsert and watermark commit (the
    reference's at-least-once window, service.py:72-74): replaying the
    sweep must leave the vectors table unchanged."""
    store = str(tmp_path / "store")
    sweep(spark, sf_dir, store, TABLES)
    vec_path = os.path.join(store, "vectors")
    before = sorted(
        (r["id"], r["text"]) for r in spark.read.parquet(vec_path).collect()
    )
    # simulate the crash: roll the watermark store back, keep vectors
    import shutil

    shutil.rmtree(os.path.join(store, "watermark"))
    replay = sweep(spark, sf_dir, store, TABLES)
    assert replay == {"events": 1000}  # delta reprocessed...
    after = sorted((r["id"], r["text"]) for r in spark.read.parquet(vec_path).collect())
    assert after == before  # ...but the sink state is identical


def test_sweep_second_sweep_with_multiple_deltas(spark, sf_dir, tmp_path):
    """Regression (ADVICE r1, high): the sweep loop replaces the
    watermark directory per table, so watermarks must be collected
    eagerly up front — a lazily-read wm_df would capture a file listing
    that the first in-loop upsert deletes, crashing the second
    delta-bearing table's lookup with FAILED_READ_FILE."""
    import datetime

    import shutil

    store = str(tmp_path / "store")
    tables = {"events": ("ts", "event_id"), "orders": ("o_orderdate", "o_orderkey")}
    sweep(spark, sf_dir, store, tables)

    # roll BOTH watermarks back so both tables carry deltas next sweep
    wm_path = os.path.join(store, "watermark")
    shutil.rmtree(wm_path)
    early = datetime.datetime(1970, 1, 2)
    spark.createDataFrame(
        [("events", early, 0, 1), ("orders", early, 0, 1)],
        "table_name string, last_updated timestamp, batch_rows long, version long",
    ).write.parquet(wm_path)

    second = sweep(spark, sf_dir, store, tables)
    assert second["events"] == 1000 and second["orders"] == 1500


def test_sweep_parallel_tables_matches_serial(spark, sf_dir, tmp_path):
    """Concurrent per-table processing (thread pool over independent
    DAGs, commits serialized under a lock) must produce exactly the
    serial sweep's store state."""
    tables = {"events": ("ts", "event_id"), "orders": ("o_orderdate", "o_orderkey")}

    serial_store = str(tmp_path / "serial")
    parallel_store = str(tmp_path / "parallel")
    serial = sweep(spark, sf_dir, serial_store, tables)
    parallel = sweep(spark, sf_dir, parallel_store, tables, max_parallel_tables=2)
    assert serial == parallel

    def state(store):
        vecs = sorted(
            (r["id"], r["text"], r["source"])
            for r in spark.read.parquet(os.path.join(store, "vectors")).collect()
        )
        wm = sorted(
            (r["table_name"], r["last_updated"])
            for r in spark.read.parquet(os.path.join(store, "watermark")).collect()
        )
        return vecs, wm

    assert state(serial_store) == state(parallel_store)

    # idle second parallel sweep
    assert sweep(spark, sf_dir, parallel_store, tables, max_parallel_tables=2) == {
        "events": 0,
        "orders": 0,
    }


def test_sweep_error_isolation_continue(spark, sf_dir, tmp_path):
    """Reference parity (controller.py:28-29): with on_error='continue'
    a failing table is logged, maps to -1, leaves its watermark
    unadvanced, and every other table completes; the next sweep retries
    the failed table's delta."""
    store = str(tmp_path / "store")
    tables = {
        "events": ("ts", "event_id"),
        "no_such_table": ("ts", "id"),
        "orders": ("o_orderdate", "o_orderkey"),
    }
    result = sweep(spark, sf_dir, store, tables, on_error="continue")
    assert result["events"] == 1000 and result["orders"] == 1500
    assert result["no_such_table"] == -1

    wm = {r["table_name"] for r in spark.read.parquet(os.path.join(store, "watermark")).collect()}
    assert wm == {"events", "orders"}  # failed table's watermark absent

    # default mode still fails fast
    import pytest

    with pytest.raises(Exception):
        sweep(spark, sf_dir, str(tmp_path / "s2"), {"no_such_table": ("ts", "id")})


def test_sweep_regrow_between_ticks(spark, tmp_path):
    """The auto-regrow path driven end-to-end by the sweep (VERDICT r4
    task 5): tick 2's ingestion pushes the vectors table past the
    2x-target-rows-per-bucket threshold, so the merge finishes with a
    re-bucketing rewrite that at least doubles the bucket count — and
    every chunk id from BOTH ticks is still findable afterwards."""
    import datetime

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.sinks import (
        _read_marker,
        _read_nbuckets,
    )

    import pandas as pd

    def write_events(src, rows):
        # single-file parquet with us timestamps, like the fixtures
        os.makedirs(src, exist_ok=True)
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "value"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(src, "events.parquet"), index=False)

    day1 = datetime.datetime(2024, 1, 1)
    day2 = datetime.datetime(2024, 2, 1)
    rows1 = [(i, day1, float(i)) for i in range(80)]
    src1 = str(tmp_path / "src1")
    write_events(src1, rows1)

    store = str(tmp_path / "store")
    tables = {"events": ("ts", "event_id")}
    # chunk_size=5 -> 16 chunks; target 1 row/bucket -> created at the
    # 16-bucket creation floor, regrow threshold = 2*1*16 = 32 chunks
    sweep(spark, src1, store, tables, chunk_size=5, target_bucket_rows=1)
    vec_path = os.path.join(store, "vectors")
    n1 = _read_nbuckets(vec_path, "kbucket")
    ids1 = {r["id"] for r in spark.read.parquet(vec_path).select("id").collect()}
    assert len(ids1) == 16 and n1 == 16

    # tick 2: 600 new rows (later ts) -> 120 new chunks, total 136 > 32
    rows2 = rows1 + [(1000 + i, day2, 0.0) for i in range(600)]
    src2 = str(tmp_path / "src2")
    write_events(src2, rows2)
    processed = sweep(spark, src2, store, tables, chunk_size=5, target_bucket_rows=1)
    assert processed == {"events": 600}  # watermark skipped tick-1 rows

    n2 = _read_nbuckets(vec_path, "kbucket")
    assert n2 >= 2 * n1, (n1, n2)
    after = spark.read.parquet(vec_path)
    ids2 = {r["id"] for r in after.select("id").collect()}
    assert ids1 <= ids2 and len(ids2) == 136
    # marker row count survived the regrow rewrite
    assert _read_marker(vec_path) == (n2, 136)
    # the re-bucketed layout is consistent: every row's partition
    # matches the hash of its key under the new count
    bad = after.filter(
        F.col("kbucket") != F.pmod(F.hash("id"), F.lit(n2)).cast("int")
    ).count()
    assert bad == 0
