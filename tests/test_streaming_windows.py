"""Structured Streaming operator tests (T4-T6): event-time windows
with watermark, streaming dedup — driven to completion with
availableNow + memory sink."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table  # noqa: E402
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.tables import (  # noqa: E402
    _nanos_ts_columns,
)


def _events_stream(spark, sf_dir):
    path = os.path.join(sf_dir, "events.parquet")
    ns_cols = _nanos_ts_columns(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    for c in ns_cols:
        stream = stream.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return stream


def test_windowed_agg_with_watermark(spark, sf_dir):
    """Tumbling 1h event-time windows + 10min watermark (T4/T5): the
    streaming result must equal the batch twin."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_agg")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_type, sum(n) AS n FROM win_agg GROUP BY event_type")

    batch = load_table(spark, sf_dir, "events")
    expected = {
        r["event_type"]: r["n"]
        for r in batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # append mode with availableNow emits only closed windows: every
    # window except the one holding max(ts) per type is final. Compare
    # against batch counts minus the open tail window.
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    open_tail = {
        r["event_type"]: r["n"]
        for r in batch.filter(
            F.date_trunc("hour", F.col("ts")) == F.date_trunc("hour", F.lit(max_ts))
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got_map = {r["event_type"]: r["n"] for r in got.collect()}
    for et, n in expected.items():
        assert got_map.get(et, 0) == n - open_tail.get(et, 0), et


def test_streaming_dropduplicates_within_watermark(spark, sf_dir):
    """T6 watermark-bounded dedup: state is evicted past the watermark
    horizon instead of growing forever — the only dedup that survives
    an unbounded stream."""
    stream = _events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    deduped = stream.dropDuplicatesWithinWatermark(["event_id"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_wm_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_wm_out"
    ).collect()[0]
    assert n["n"] == n["d"] == 1000


def test_streaming_dropduplicates(spark, sf_dir):
    """Streaming dedup on the key column (T6): duplicate-free output."""
    stream = _events_stream(spark, sf_dir).select("event_id", "event_type")
    deduped = stream.dropDuplicates(["event_id"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out").collect()[0]
    assert n["n"] == n["d"] == 1000


def test_stream_stream_join_with_watermarks(spark, sf_dir):
    """Stream-stream inner join (T5 companion): signups joined to
    purchases of the same user within 7 days — both sides watermarked
    so the join state is bounded; result checked against the identical
    batch join."""
    ev = _events_stream(spark, sf_dir)
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select(F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"))
        .withWatermark("s_ts", "1 day")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 day")
    )
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 7 DAYS")),
        "inner",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("ss_join").count()

    e = load_table(spark, sf_dir, "events")
    s_b = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts")
    )
    p_b = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    want = s_b.join(
        p_b,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 7 DAYS")),
        "inner",
    ).count()
    assert got == want and want > 0


def test_sliding_window_streaming_matches_batch(spark, sf_dir):
    """Sliding windows in streaming mode (T5): width 10 min, slide
    5 min — the closed-window stream output must agree with the batch
    sliding aggregation on every emitted window."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("slide_agg")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["event_type"]): r["n"]
        for r in spark.table("slide_agg").collect()
    }
    assert got  # closed windows were emitted
    batch = {
        (r["win_start"], r["event_type"]): r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
        .collect()
    }
    # append mode emits only watermark-closed windows; each one must
    # match the batch result exactly
    for key, n in got.items():
        assert batch[key] == n, key
