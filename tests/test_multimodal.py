"""Multimodal kernel contracts: the mapInArrow feature extractor must
be value-identical to the mapInPandas reference (same FEATURE_SCHEMA,
same deterministic stub), because mm_binary_features may take either
kernel without the oracle noticing."""

from pyspark.sql import functions as F

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import (
    multimodal,
)


def _media(spark):
    df = spark.createDataFrame(
        [(1, "short"), (2, "a much longer payload body " * 40), (3, ""), (4, "Ünïcode ⚡ bytes")],
        "doc_id long, text string",
    )
    return multimodal.attach_binary(df, "text")


def test_arrow_feature_kernel_matches_pandas(spark):
    media = _media(spark)
    a = {r["id"]: tuple(r) for r in multimodal.extract_features(media).collect()}
    b = {r["id"]: tuple(r) for r in multimodal.extract_features_arrow(media).collect()}
    assert a == b
    # schema identical too (driver-stable plans)
    assert (
        multimodal.extract_features(media).schema
        == multimodal.extract_features_arrow(media).schema
    )


def test_feature_values_are_the_documented_stub(spark):
    media = _media(spark)
    rows = {r["id"]: r for r in multimodal.extract_features_arrow(media).collect()}
    # UTF-8 byte length, not char length (the unicode row differs)
    payload = "Ünïcode ⚡ bytes".encode()
    n = len(payload)
    assert rows[4]["n_bytes"] == n
    assert rows[4]["width"] == n % 640 + 1
    assert rows[4]["height"] == n % 480 + 1
    import hashlib

    assert rows[4]["sha256"] == hashlib.sha256(payload).hexdigest()
    # empty payload: stub floor dims
    assert (rows[3]["width"], rows[3]["height"]) == (1, 1)


def test_arrow_feature_kernel_plan_is_arrow_not_pandas(spark):
    media = _media(spark)
    plan = (
        multimodal.extract_features_arrow(media)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PythonMapInArrow" in plan or "MapInArrow" in plan, plan[:500]
