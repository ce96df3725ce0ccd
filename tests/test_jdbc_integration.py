"""Executed JDBC source path (SURVEY §2.1 S2-S4).

The reference's core source is a MySQL scan over one connection
(service_layer/service.py:52-57, utils/mysql_connect.py:5-17). No
MySQL exists in this environment, but Spark ships the embedded Derby
JDBC engine — so the JDBC reader contract (range-partitioned parallel
scan from PK bounds, predicate pushdown, watermark incremental scan)
is exercised against a real JDBC database, not just an option dict.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import cdc  # noqa: E402
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import (  # noqa: E402
    jdbc_reader_options,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Create an embedded Derby database with a CDC-shaped table via
    the Spark JVM's DriverManager (same classpath the reader uses)."""
    db_dir = tmp_path_factory.mktemp("derby") / "cdcdb"
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE events_src ("
        "event_id INT PRIMARY KEY, user_id INT, event_type VARCHAR(20))"
    )
    for i in range(1, 201):
        st.execute(
            f"INSERT INTO events_src VALUES ({i}, {i % 7}, "
            f"'{'click' if i % 2 else 'view'}')"
        )
    st.close()
    conn.close()
    return url


def _read(spark, url, **extra):
    opts = {"url": url, "dbtable": "events_src", "driver": DERBY_DRIVER}
    opts.update(extra)
    return spark.read.format("jdbc").options(**opts).load()


def test_jdbc_full_scan(spark, derby_url):
    """S3: SELECT * over JDBC (the reference's initial full load)."""
    df = _read(spark, derby_url)
    assert df.count() == 200
    assert set(df.columns) == {"EVENT_ID", "USER_ID", "EVENT_TYPE"}


def test_jdbc_partitioned_scan_from_pk_bounds(spark, derby_url):
    """S2→S3: the PK-range partitioning contract executed — N bounded
    range scans instead of the reference's single fetchall
    (service.py:59)."""
    opts = jdbc_reader_options(
        derby_url, "events_src", "EVENT_ID", lower_bound=1, upper_bound=201, num_partitions=4
    )
    opts["driver"] = DERBY_DRIVER
    df = spark.read.format("jdbc").options(**opts).load()
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200
    # no rows lost or duplicated across range boundaries
    assert df.select("EVENT_ID").distinct().count() == 200


def test_jdbc_incremental_scan_pushdown(spark, derby_url):
    """S4: the watermark predicate must be pushed into the source SQL
    (≙ the reference hand-inlining it, service.py:53)."""
    df = _read(spark, derby_url)
    delta = cdc.incremental_scan(df, "EVENT_ID", 150)
    assert delta.count() == 50
    plan = delta._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EVENT_ID" in plan, plan


def test_jdbc_watermark_roundtrip(spark, derby_url):
    """End-to-end CDC semantics over a real JDBC source: scan past the
    watermark, compute the next watermark from the delta."""
    df = _read(spark, derby_url)
    delta = cdc.incremental_scan(df, "EVENT_ID", 120)
    wm = cdc.next_watermark(delta, "EVENT_ID").collect()[0]
    assert wm["last_updated"] == 200
    assert wm["batch_rows"] == 80
    # replaying from the new watermark yields an empty delta
    assert cdc.incremental_scan(df, "EVENT_ID", wm["last_updated"]).count() == 0
