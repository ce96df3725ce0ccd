"""Accuracy contracts for the sketch-based aggregates (A5): the
rows-only queries still carry testable error bounds."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table  # noqa: E402


def test_approx_count_distinct_error_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
            F.countDistinct("l_orderkey").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05, r


def test_registry_sketch_query_within_bounds(spark, sf_dir):
    """The rows-only registry query agg_approx_sketches must itself
    satisfy the sketch error contracts per group: HLL++ distinct within
    5% of exact, approximate p50 within 5%-of-spread of exact p50 —
    the bound the driver's rows-only check can't see (VERDICT r3 #9)."""
    import __spark_entry__ as entry

    got = {
        r["l_returnflag"]: r
        for r in entry.queries()["agg_approx_sketches"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            (F.max("l_extendedprice") - F.min("l_extendedprice")).alias("spread"),
        )
        .collect()
    }
    assert set(got) == set(exact) and got
    for flag, r in got.items():
        e = exact[flag]
        assert abs(r["approx_orders"] - e["n"]) / e["n"] < 0.05, (flag, r, e)
        assert abs(r["approx_p50"] - e["p50"]) / e["spread"] < 0.05, (flag, r, e)


def test_percentile_approx_brackets_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    r = li.agg(
        F.percentile_approx("l_extendedprice", 0.5).alias("approx"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    ).collect()[0]
    spread = r["hi"] - r["lo"]
    assert abs(r["approx"] - r["exact"]) / spread < 0.05
