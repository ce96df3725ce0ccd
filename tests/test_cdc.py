"""CDC operator property tests: bucketed chunking invariants and
duplicate-key determinism (ADVICE r1 tiebreak fix)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def test_chunk_documents_bucketed_invariants(spark):
    """Bucketed chunking must preserve the chunking contract: no chunk
    exceeds chunk_size, every input row lands in exactly one chunk,
    chunks never span buckets, first/last keys bound the membership."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import cdc

    rows = [(i, f"t{i}") for i in range(1, 258)]  # 257 rows, buckets of 100 keys
    df = spark.createDataFrame(rows, "k long, text string").withColumn(
        "b", F.floor(F.col("k") / 100)
    )
    chunks = cdc.chunk_documents(df, "k", "text", "src", chunk_size=30, bucket_col="b").collect()
    assert sum(c["n_rows"] for c in chunks) == 257
    assert all(c["n_rows"] <= 30 for c in chunks)
    for c in chunks:
        assert c["first_key"] // 100 == c["last_key"] // 100  # no bucket straddling
        assert c["chunk_id"] == f"src#{c['first_key'] // 100}#{c['first_key']}"
    # key ranges of chunks within a bucket are disjoint and ordered
    by_bucket = {}
    for c in chunks:
        by_bucket.setdefault(c["first_key"] // 100, []).append((c["first_key"], c["last_key"]))
    for spans in by_bucket.values():
        spans.sort()
        for (a1, b1), (a2, _b2) in zip(spans, spans[1:]):
            assert b1 < a2


def test_chunk_documents_deterministic_under_duplicate_keys(spark):
    """ADVICE r1: duplicate order keys must not make chunk membership
    or ids nondeterministic — the text tiebreak pins a total order, so
    repartitioned input produces identical chunks."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import cdc

    rows = [(i // 3, f"text-{i % 7}-{i}") for i in range(300)]  # heavy key dups
    df = spark.createDataFrame(rows, "k long, text string")

    def run(d):
        return sorted(
            (c["chunk_id"], c["n_rows"], c["document"])
            for c in cdc.chunk_documents(d, "k", "text", "s", chunk_size=25).collect()
        )

    assert run(df) == run(df.repartition(13)) == run(df.repartition(3, "text"))


def test_store_diff_statuses_and_equal_stores(spark):
    """Anti-entropy diff: equal stores yield an EMPTY diff (level 1
    only); planted drop/extra/change each get the right status; keys
    untouched never appear."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.cdc import (
        store_diff,
    )

    src = spark.createDataFrame(
        [(i, f"u{i % 3}", i * 10) for i in range(200)], "id long, u string, v long"
    )
    assert store_diff(src, src, ["id"], num_buckets=16).count() == 0

    from pyspark.sql import functions as F

    dst = (
        src.filter(F.col("id") != 7)                      # 7 missing
        .withColumn("v", F.when(F.col("id") == 11, 999).otherwise(F.col("v")))  # 11 changed
        .unionByName(spark.createDataFrame([(1000, "ux", 1)], "id long, u string, v long"))
    )
    got = {r["id"]: r["status"] for r in store_diff(src, dst, ["id"], num_buckets=16).collect()}
    assert got == {7: "missing", 11: "changed", 1000: "extra"}
