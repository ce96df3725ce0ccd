

def test_consecutive_pairs_equals_global_lead_with_gaps(spark):
    """consecutive_pairs must reproduce lead() OVER (ORDER BY key)
    exactly — including across bucket boundaries and key gaps (empty
    buckets) — while never running an O(n) global window."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        consecutive_pairs,
    )

    rng = random.Random(7)
    # sparse keys with big gaps -> many empty buckets at width 10
    keys = sorted(rng.sample(range(0, 5000), 300))
    df = spark.createDataFrame([(k, f"v{k}") for k in keys], "k long, v string")

    got = {
        r["k"]: r["nx"]
        for r in consecutive_pairs(df, "k", "v", bucket_width=10, out_col="nx").collect()
    }
    expect = {
        r["k"]: r["nx"]
        for r in df.select("k", F.lead("v").over(Window.orderBy("k")).alias("nx")).collect()
    }
    assert got == expect
