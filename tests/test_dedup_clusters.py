"""Dedup clustering: candidate pairs -> connected components ->
canonical survivors."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (  # noqa: E402
    cluster_survivors,
    connected_components,
    exact_dedup,
)


def test_connected_components_known_graph(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_components_chain_converges(spark):
    """A long chain needs multiple propagation rounds — the fixpoint
    loop must actually iterate."""
    n = 12
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], "id_a long, id_b long")
    comp = connected_components(pairs, max_iters=30).collect()
    assert {r["component"] for r in comp} == {0}
    assert len(comp) == n + 1


def test_cluster_survivors_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, f"text{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 4), (4, 7), (2, 3)], "id_a long, id_b long")
    comp = connected_components(pairs)
    kept = cluster_survivors(docs, comp, "doc_id")
    ids = sorted(r["doc_id"] for r in kept.collect())
    # {0,4,7} -> 0; {2,3} -> 2; singletons 1, 5, 6 survive
    assert ids == [0, 1, 2, 5, 6]


def test_full_dedup_pipeline_on_fixture(spark, sf_dir):
    """LSH candidates -> components -> survivors over documents; the
    doubled corpus must collapse back to the original count."""
    from pyspark.sql import functions as F

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    sig = minhash_signatures(doubled, "text", "doc_id", num_hashes=16)
    pairs = lsh_candidate_pairs(sig, "doc_id", num_bands=4, rows_per_band=4)
    comp = connected_components(pairs)
    kept = cluster_survivors(doubled, comp, "doc_id")
    # identical copies always collide in every LSH band -> each copy
    # pairs with its original; survivors keep the low (original) ids
    assert kept.count() <= d.count()
    assert kept.filter(F.col("doc_id") >= 1_000_000).count() == 0
