"""Canonical row->JSON serialization semantics (P6/F1-F3): exact
reference coercions — ISO timestamps, Decimal -> double (lossy,
deliberate, service.py:180-181), unsupported types raise."""

from __future__ import annotations

import datetime
import decimal
import os
import sys

import pytest
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.functions.serialize import (  # noqa: E402
    canonical_json,
)


def test_all_type_coercions(spark):
    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("d", T.DecimalType(10, 2)),
            T.StructField("ts", T.TimestampType()),
            T.StructField("dt", T.DateType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("n", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (
                42,
                'he said "hi"\\now',
                decimal.Decimal("12.50"),
                datetime.datetime(2024, 1, 2, 3, 4, 5, 678901),
                datetime.date(2024, 1, 2),
                True,
                None,
            )
        ],
        schema,
    )
    got = df.select(canonical_json(df).alias("j")).collect()[0]["j"]
    assert got == (
        '{"i":42'
        ',"s":"he said \\"hi\\"\\\\now"'
        ',"d":12.5'  # Decimal -> double, lossy by reference design
        ',"ts":"2024-01-02T03:04:05"'  # ISO, micros truncated
        ',"dt":"2024-01-02"'
        ',"b":true'
        ',"n":null}'
    )


def test_unsupported_type_raises(spark):
    df = spark.createDataFrame(
        [([1, 2],)], T.StructType([T.StructField("arr", T.ArrayType(T.LongType()))])
    )
    with pytest.raises(TypeError, match="unsupported type"):
        canonical_json(df)


def test_column_subset_and_order(spark):
    df = spark.createDataFrame([(1, "a", 2.5)], "x long, y string, z double")
    got = df.select(canonical_json(df, ["z", "x"]).alias("j")).collect()[0]["j"]
    assert got == '{"z":2.5,"x":1}'
