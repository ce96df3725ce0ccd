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


def test_winnow_shared_run_guarantee(spark):
    """Winnowing guarantee (Schleimer et al. §3): any token run of
    length >= window + k - 1 shared by two docs yields at least one
    shared fingerprint; docs with no common k-gram share none."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        winnow_candidate_pairs,
        winnow_fingerprints,
    )

    k, w = 4, 8
    shared_run = " ".join(f"run{i}" for i in range(w + k - 1))  # 11 tokens
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + shared_run + " delta epsilon zeta"),
            (2, "one two three four five " + shared_run),
            (3, "totally different words with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, "text", "doc_id", k=k, window=w)
    rows = fps.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2], "shared 11-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])

    pairs = winnow_candidate_pairs(fps, "doc_id", min_shared=1, max_bucket_size=None)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 2)}


def test_winnow_fingerprint_density(spark, sf_dir):
    """Winnowing keeps ~1/window of the k-gram hashes (the paper's
    2/(w+1) expected density) — the storage win over full shingling."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        winnow_fingerprints,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    n_fps = winnow_fingerprints(docs, "text", "doc_id", k=4, window=8).count()
    per_doc = n_fps / n_docs
    # ~54 tokens/doc -> ~51 kgram hashes -> expected ~2/(8+1)*51 ≈ 11
    assert 4 <= per_doc <= 25, per_doc


def test_set_similarity_join_exact_on_sparse_corpus(spark):
    """On a sparse corpus (mostly-unique vocabularies — the case
    prefix filtering exists for) the join must return exactly the
    brute-force Jaccard pairs: planted near-dups found, disjoint docs
    absent, scores exact."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        set_similarity_join,
    )

    docs = [
        (1, "aa bb cc dd ee ff gg hh ii jj"),
        (2, "aa bb cc dd ee ff gg hh ii kk"),   # J(1,2) = 9/11
        (3, "zz yy xx ww vv uu tt ss rr qq"),
        (4, "zz yy xx ww vv uu tt ss rr qq"),   # J(3,4) = 1.0
        (5, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in set_similarity_join(df, "text", "doc_id", threshold=0.8).collect()
    }
    assert got == {(1, 2): round(9 / 11, 6), (3, 4): 1.0}
    # threshold above J(1,2): only the identical pair remains
    strict = {
        (r["id_a"], r["id_b"])
        for r in set_similarity_join(df, "text", "doc_id", threshold=0.9).collect()
    }
    assert strict == {(3, 4)}


def test_winnow_textless_docs_have_no_fingerprints(spark):
    """ADVICE r5: NULL/empty text must yield ZERO fingerprint rows —
    before the fix a single NULL fingerprint row per textless doc made
    every textless doc a mutual winnow "overlap" candidate."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        winnow_candidate_pairs,
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [
            (1, None),
            (2, None),
            (4, "real words here repeated real words here repeated again and again"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, "text", "doc_id", k=4, window=8)
    rows = fps.collect()
    assert all(r["fingerprint"] is not None for r in rows)
    assert {r["doc_id"] for r in rows} == {4}
    pairs = winnow_candidate_pairs(fps, "doc_id", min_shared=1, max_bucket_size=None)
    assert pairs.count() == 0
    # empty STRING is distinct from NULL by design: word_shingles keeps
    # sub-k-token docs as their full join, so "" fingerprints as itself
    empty = spark.createDataFrame([(9, "")], ["doc_id", "text"])
    assert winnow_fingerprints(empty, "text", "doc_id", k=4, window=8).count() == 1
