"""Source-format tests (S10-S12): CSV/JSON ingestion round-trips the
parquet fixture semantics; JDBC options carry the scale contract."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import (  # noqa: E402
    jdbc_reader_options,
    load_table,
)


def test_csv_scan_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.csv(out, header=True, inferSchema=True)
    assert back.count() == nation.count()
    assert {r["n_name"] for r in back.collect()} == {r["n_name"] for r in nation.collect()}


def test_json_scan_roundtrip(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "region_json")
    region.write.mode("overwrite").json(out)
    back = spark.read.schema(region.schema).json(out)
    assert sorted(r["r_name"] for r in back.collect()) == sorted(
        r["r_name"] for r in region.collect()
    )


def test_orc_scan_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC — the other Spark-native columnar format (S11 family):
    values round-trip exactly, and a predicate on the ORC scan is
    PUSHED (PushedFilters in the scan node), so the format keeps the
    scan-pruning properties the 100 TB design assumes of parquet."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    out = str(tmp_path / "customer_orc")
    customer.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == customer.count()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, customer.collect()))

    filtered = back.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "c_mktsegment" in plan.split(
        "PushedFilters"
    )[1][:200], plan[:800]
    assert filtered.count() == customer.filter(
        F.col("c_mktsegment") == "BUILDING"
    ).count()


def test_json_lines_parse(spark, sf_dir):
    """events.props is JSON-lines content: from_json must parse it
    (F12 inverse of the serialize operator)."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(F.from_json("props", "k int").alias("p")).select("p.k")
    assert parsed.filter(F.col("k").isNotNull()).count() == e.count()


def test_timestamp_columns_are_instant_typed(spark, sf_dir):
    """Environment-drift guard: Spark 4.1 started reading tz-naive
    parquet timestamps as TIMESTAMP_NTZ (inferTimestampNTZ default
    flip), which broke unix_micros()/withWatermark(). load_table must
    always yield classic TimestampType so the next runtime bump fails
    here, not in the driver gate."""
    from pyspark.sql.types import TimestampType

    e = load_table(spark, sf_dir, "events")
    assert isinstance(e.schema["ts"].dataType, TimestampType), e.schema["ts"].dataType
    # unix_micros smoke: the engine's declared output convention —
    # epoch micros of the stored instant, independent of session tz.
    row = e.select(F.unix_micros("ts").alias("us"), F.col("ts")).orderBy("us").first()
    assert row["us"] == int(row["ts"].replace(tzinfo=__import__("datetime").timezone.utc).timestamp() * 1_000_000)


def test_timestamp_instant_typed_on_foreign_session(spark, sf_dir):
    """The driver harness passes its OWN SparkSession (built without
    our configs). load_table must still produce TimestampType via the
    runtime conf set — simulate by flipping the conf to the Spark 4
    default before loading a fresh (uncached) read."""
    from pyspark.sql.types import TimestampType

    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        # confirm the drifted default actually produces NTZ here,
        # otherwise this test guards nothing
        assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
        from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import tables

        tables._session_cache(spark, "load_table").clear()
        e = load_table(spark, sf_dir, "events")
        assert isinstance(e.schema["ts"].dataType, TimestampType)
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import tables

        tables._session_cache(spark, "load_table").clear()


def test_jdbc_options_contract():
    """The MySQL path must range-partition on the PK (bounded-memory
    scans; the reference fetchall's the whole delta, service.py:59)."""
    opts = jdbc_reader_options(
        "jdbc:mysql://host:3306/task1", "events", "event_id", 0, 1_000_000, num_partitions=64
    )
    assert opts["partitionColumn"] == "event_id"
    assert opts["numPartitions"] == "64"
    assert opts["pushDownPredicate"] == "true"
