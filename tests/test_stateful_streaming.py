"""Streaming offset tracking (T2) and custom stateful operators (T6),
plus the UDF registration surface (U4)."""

from __future__ import annotations

import os
import sys

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_streaming_windows import _events_stream  # noqa: E402


def test_checkpoint_offsets_prevent_reprocessing(spark, sf_dir, tmp_path):
    """T2: the checkpoint is the watermark table's built-in equivalent
    (≙ service.py:21-46) — a restarted query must process nothing new
    from an unchanged source."""
    ckpt = str(tmp_path / "ckpt")
    counts = []

    def process(batch_df, epoch_id):
        counts.append(batch_df.count())

    for _ in range(2):
        q = (
            _events_stream(spark, sf_dir)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    assert counts[0] == 1000
    assert sum(counts[1:]) == 0, counts  # second run: offsets already committed


def test_apply_in_pandas_with_state(spark, sf_dir):
    """T6: custom stateful operator — running per-user event count via
    applyInPandasWithState (the reference has no stateful surface at
    all; this is the Spark-native extension point)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("total", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("count", T.LongType())])

    def count_events(key, pdfs, state):
        running = state.get[0] if state.exists else 0
        for pdf in pdfs:
            running += len(pdf)
        state.update((running,))
        yield pd.DataFrame({"user_id": [key[0]], "total": [running]})

    stream = _events_stream(spark, sf_dir).select("user_id", "event_id")
    result = stream.groupBy("user_id").applyInPandasWithState(
        count_events, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    q = (
        result.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: r["total"]
        for r in spark.sql(
            "SELECT user_id, max(total) AS total FROM stateful_counts GROUP BY user_id"
        ).collect()
    }
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table

    expected = {
        r["user_id"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected


def test_processing_time_trigger_ticks(spark, sf_dir):
    """T1's actual long-running mode: a processingTime trigger (the
    reference's sleep(300) loop, compressed to 1 s) fires repeatedly
    until stopped."""
    import time

    batches = []

    def process(batch_df, epoch_id):
        batches.append((epoch_id, batch_df.count()))

    q = (
        _events_stream(spark, sf_dir)
        .writeStream.foreachBatch(process)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and not batches:
            time.sleep(0.5)
    finally:
        q.stop()
    assert batches and batches[0][1] == 1000  # first tick drained the source


def test_streaming_upsert_sink_integration(spark, sf_dir, tmp_path):
    """Streaming -> chunk -> keyed upsert sink with checkpoint: the
    full S8+T2+T3 composition. Restarting against an unchanged source
    must leave the sink identical (exactly-once effect)."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import cdc
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import (
        upsert_parquet,
    )
    from pyspark.sql import functions as F2

    ckpt = str(tmp_path / "ckpt")
    sink_path = str(tmp_path / "vectors")

    def process(batch_df, epoch_id):
        serialized = cdc.serialize_rows(batch_df)
        chunks = cdc.chunk_documents(serialized, "event_id", "data_string", "events")
        updates = chunks.select(
            F2.col("chunk_id").alias("id"),
            F2.md5("document").alias("doc_md5"),
            F2.lit(epoch_id).cast("long").alias("version"),
        )
        upsert_parquet(batch_df.sparkSession, sink_path, updates, ["id"], "version")

    for _ in range(2):  # run + restart
        q = (
            _events_stream(spark, sf_dir)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    sink = spark.read.parquet(sink_path)
    assert sink.count() == 10
    assert sink.select("id").distinct().count() == 10


def test_udf_registration_surface(spark):
    """U4: python UDF / pandas UDF registration into the SQL catalog."""

    @F.pandas_udf(T.DoubleType())
    def vec_scale(s: pd.Series) -> pd.Series:
        return s * 2.0

    spark.udf.register("vec_scale", vec_scale)
    spark.udf.register("py_add_one", lambda x: x + 1, T.LongType())
    spark.range(5).createOrReplaceTempView("r5")
    got = spark.sql(
        "SELECT sum(vec_scale(CAST(id AS DOUBLE))) AS a, sum(py_add_one(id)) AS b FROM r5"
    ).collect()[0]
    assert got["a"] == 20.0 and got["b"] == 15


def test_python_udtf_surface(spark):
    """U4 completion: a Python UDTF (table function) — one input row
    expands to N output rows, registered into the SQL catalog. The
    text-span extraction shape a tokenizing pipeline uses when an
    explode of a precomputed array won't do (per-row stateful logic)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int, is_stop boolean")
    class Tokenize:
        STOP = {"the", "and", "of", "to", "is"}

        def eval(self, text: str):
            for i, tok in enumerate((text or "").split()):
                yield tok.lower(), i, tok.lower() in self.STOP

    spark.udtf.register("tokenize", Tokenize)
    got = spark.sql(
        "SELECT * FROM tokenize('The quick fox and the dog') ORDER BY pos"
    ).collect()
    assert [r["token"] for r in got] == ["the", "quick", "fox", "and", "the", "dog"]
    assert [r["is_stop"] for r in got] == [True, False, False, True, True, False]
    # lateral join form: UDTF over a table's rows
    spark.createDataFrame([(1, "alpha beta"), (2, "gamma")], "id int, t string") \
        .createOrReplaceTempView("docs2")
    n = spark.sql(
        "SELECT d.id, tk.token FROM docs2 d, LATERAL tokenize(d.t) tk"
    ).count()
    assert n == 3


def test_grouped_agg_pandas_udf(spark):
    """U4: GROUPED_AGG pandas UDF — a custom vectorized aggregate
    (geometric mean) usable in groupBy and windows."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def geo_mean(v: pd.Series) -> float:  # Series -> scalar = GROUPED_AGG
        return float(np.exp(np.log(v[v > 0]).mean()))

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 100.0), ("b", 4.0), ("b", 9.0)], "k string, v double"
    )
    got = {r["k"]: r["g"] for r in df.groupBy("k").agg(geo_mean("v").alias("g")).collect()}
    assert abs(got["a"] - 10.0) < 1e-9
    assert abs(got["b"] - 6.0) < 1e-9


def test_transform_with_state_in_pandas(spark, sf_dir):
    """T6 forward-compat: Spark 4's transformWithStateInPandas is the
    successor of applyInPandasWithState. In this container its driver
    worker needs google.protobuf, which is not importable — the test
    skips there (env-bound, like the embedding model) and validates
    the modern API the moment the runtime gains it."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: transformWithState "
                    "driver worker cannot start in this container")
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("total", T.LongType())]
    )

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.count = handle.getValueState(
                "count", T.StructType([T.StructField("n", T.LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = self.count.get()[0] if self.count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self.count.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "total": [n]})

        def close(self):
            pass

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = _events_stream(spark, sf_dir).groupBy("user_id").transformWithStateInPandas(
            CountProcessor(), outputStructType=out_schema,
            outputMode="Update", timeMode="None",
        )
        q = (
            out.writeStream.format("memory").queryName("twsip_out")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT sum(total) AS s FROM twsip_out "
            "WHERE (user_id, total) IN (SELECT user_id, max(total) FROM twsip_out GROUP BY user_id)"
        ).collect()[0]
        assert rows["s"] == 1000
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stateful_funnel_matches_batch_and_carries_state(spark, sf_dir, tmp_path):
    """The streaming funnel automaton must (a) equal the batch
    sequence_funnel on the fixture when fed as one availableNow pass,
    and (b) complete chains ACROSS micro-batches — signup, click,
    purchase arriving in three separate files must still bind (the
    state carry that makes it a stateful operator at all)."""
    import datetime

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        sequence_funnel,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.streaming.pipeline import (
        stateful_funnel,
    )

    steps = ["signup", "click", "purchase"]
    gap = 7 * 86400

    # (a) fixture parity, single availableNow pass
    stream = _events_stream(spark, sf_dir).select("user_id", "ts", "event_type")
    q = (
        stateful_funnel(stream, "user_id", "ts", "event_type", steps, gap)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_state")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["t1_us"], r["t2_us"], r["t3_us"])
        for r in spark.sql("SELECT * FROM funnel_state").collect()
    }
    e = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: tuple(
            # exact micros: timestamp()*1e6 is a lossy float round-trip
            None if r[f"t{j}"] is None
            else int(r[f"t{j}"].timestamp()) * 1_000_000 + r[f"t{j}"].microsecond
            for j in (1, 2, 3)
        )
        for r in sequence_funnel(e, "user_id", "ts", "event_type", steps, gap).collect()
    }
    assert got == want

    # (b) chain completion across micro-batches (one file per step)
    src = str(tmp_path / "multi")
    os.makedirs(src)
    t0 = datetime.datetime(2024, 1, 1)

    def write_file(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(src, name), index=False)

    write_file("b1.parquet", [(1, t0, "signup")])
    write_file("b2.parquet", [(1, t0 + datetime.timedelta(hours=1), "click")])
    write_file("b3.parquet", [(1, t0 + datetime.timedelta(hours=2), "purchase")])
    schema = "user_id long, ts timestamp, event_type string"
    ms = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful_funnel(ms, "user_id", "ts", "event_type", steps, gap)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_multi")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM funnel_multi WHERE t3_us IS NOT NULL"
    ).collect()
    assert rows, "chain must complete across three micro-batches"
    t1, t2, t3 = rows[-1]["t1_us"], rows[-1]["t2_us"], rows[-1]["t3_us"]
    assert t1 < t2 < t3


def test_stateful_funnel_string_keys_and_null_ts(spark, tmp_path):
    """Review fixes: the output schema derives the key type from the
    stream (string keys work), and NULL event times are skipped
    instead of binding NaT's -2^63 micros and bricking the chain."""
    import datetime

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.streaming.pipeline import (
        stateful_funnel,
    )

    src = str(tmp_path / "sk")
    os.makedirs(src)
    t0 = datetime.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        [
            ("alice", pd.NaT, "signup"),          # must NOT bind
            ("alice", t0, "signup"),
            ("alice", t0 + datetime.timedelta(minutes=5), "click"),
        ],
        columns=["user_id", "ts", "event_type"],
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(os.path.join(src, "b.parquet"), index=False)
    ms = (
        spark.readStream.schema("user_id string, ts timestamp, event_type string")
        .parquet(src)
    )
    q = (
        stateful_funnel(ms, "user_id", "ts", "event_type", ["signup", "click"], 3600)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_str")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM funnel_str").collect()
    assert rows and rows[0]["user_id"] == "alice"
    t0_us = int(t0.timestamp()) * 1_000_000
    assert rows[0]["t1_us"] == t0_us              # real signup, not NaT
    assert rows[0]["t2_us"] == t0_us + 300_000_000
