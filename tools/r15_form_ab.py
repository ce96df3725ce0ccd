#!/usr/bin/env python
"""Interleaved old-vs-new plan-form A/B for the r15 optimization round.

For each candidate rewrite, builds BOTH DataFrame forms in one
bench-policy session, asserts the results are identical (sorted Arrow
bytes), then times [new, old] alternations and reports each form's
min — the repo's standard same-window protocol (tools/ab.py lineage).

Usage: python tools/r15_form_ab.py <candidate> [reps]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Candidates: dedup_exact_narrow | tumbling_longkey | ann_recall_fused
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from bench import sized_session, warm_up  # noqa: E402


def _dedup_exact_pair(spark, sf_dir):
    d = em._t(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 1000000))
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import dedup

    old = dedup.exact_dedup(doubled, "text", "doc_id").select(
        "doc_id", F.md5("text").alias("fp")
    )
    # narrow form: fp IS the group key; only min(doc_id) crosses the wire
    new = (
        doubled.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "fp")
    )
    return old, new


def _tumbling_pair(spark, sf_dir):
    e = em._t(spark, sf_dir, "events")
    old = (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type", "n", "sum_value",
        )
    )
    us = F.unix_micros(F.col("ts"))
    new = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(
            (us - us % F.lit(600000000)).alias("win_start_us"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("sum_value"))
    )
    return old, new


def _ann_recall_pair(spark, sf_dir):
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import (
        vectors as vec_ops,
    )

    e = em._t(spark, sf_dir, "embeddings")
    qvec = em._query_vector(sf_dir)
    planes = vec_ops.planes_for_corpus(em._table_rows(sf_dir, "embeddings"))
    exact = vec_ops.cosine_topk(e, "vec_id", "embedding", qvec, k=10).select("vec_id")
    lsh = vec_ops.ann_topk(
        e, "vec_id", "embedding", qvec, dim=64, k=10, n_planes=planes
    ).select("vec_id")
    ivf = vec_ops.ivf_topk(
        e, "vec_id", "embedding", qvec, em._ivf_centroids(spark, sf_dir), k=10, n_probe=2
    ).select("vec_id")

    def _recall(approx, method):
        hits = exact.join(approx, "vec_id", "left_semi").agg(F.count(F.lit(1)).alias("_h"))
        return hits.select(
            F.lit(method).alias("method"), F.lit(10).cast("bigint").alias("k"),
            F.col("_h").cast("bigint").alias("hits"),
            (F.col("_h") / F.lit(10.0)).alias("recall"),
        )

    old = _recall(lsh, "lsh").unionByName(_recall(ivf, "ivf"))

    # fused form: tag + union the approx branches FIRST, one semi join
    # against ONE exact subtree, re-attach zero-hit methods from a
    # 2-row local frame so the output is two rows at any recall
    tagged = lsh.select("vec_id", F.lit("lsh").alias("method")).unionByName(
        ivf.select("vec_id", F.lit("ivf").alias("method"))
    )
    counts = (
        tagged.join(F.broadcast(exact), "vec_id", "left_semi")
        .groupBy("method")
        .agg(F.count(F.lit(1)).alias("_h"))
    )
    methods = spark.createDataFrame([("lsh",), ("ivf",)], ["method"])
    new = (
        F.broadcast(methods)
        .join(counts, "method", "left")
        .select(
            "method", F.lit(10).cast("bigint").alias("k"),
            F.coalesce(F.col("_h"), F.lit(0)).cast("bigint").alias("hits"),
            (F.coalesce(F.col("_h"), F.lit(0)) / F.lit(10.0)).alias("recall"),
        )
    )
    return old, new


def _dup_apply_pair(spark, sf_dir):
    # OLD = the landed string-gram passage_coverage; NEW = the hashed
    # xxhash64(token-slice) gram variant. MEASURED AND REJECTED at
    # sf10: honest per-rep-rebuilt timing read 1.108x (39.7 old vs
    # 44.0 new) — the per-position array-slice hash costs more than
    # the concat_ws string build it avoids. (An earlier 0.62x reading
    # was the AQE stage-reuse artifact this tool now guards against.)
    from pyspark.sql import Window as _W

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import (
        text as text_ops,
    )

    d = em._t(spark, sf_dir, "documents").select("doc_id", "text")
    old = text_ops.passage_coverage(
        d, "doc_id", "text", n=8, min_docs=2, max_coverage=0.2
    )

    n, min_docs = 8, 2
    toks = F.split(F.trim(F.col("text")), r"\s+")
    k = F.size(toks)
    gram_hashes = F.when(k < n, F.array(F.xxhash64(toks))).otherwise(
        F.transform(
            F.sequence(F.lit(1), k - n + 1),
            lambda i: F.xxhash64(F.slice(toks, i, n)),
        )
    )
    grams = d.select(
        F.col("doc_id"), F.explode_outer(F.array_distinct(gram_hashes)).alias("_g")
    )
    carriers = F.count("_g").over(_W.partitionBy("_g"))
    per_doc = (
        grams.withColumn("_carriers", carriers)
        .groupBy("doc_id")
        .agg(
            F.count("_g").cast("long").alias("n_passages"),
            F.count(F.when(F.col("_carriers") >= min_docs, F.lit(1)))
            .cast("long")
            .alias("n_dup_passages"),
        )
    )
    coverage = F.when(
        F.col("n_passages") > 0, F.col("n_dup_passages") / F.col("n_passages")
    ).otherwise(F.lit(0.0))
    new = per_doc.withColumn("dup_coverage", coverage.cast("double")).withColumn(
        "keep", F.col("dup_coverage") <= F.lit(0.2)
    )
    return old, new


def _contamination_pair(spark, sf_dir):
    old = em.queries()["text_contamination"](spark, sf_dir)

    n, min_shared = 3, 2

    def _hgrams(frame, id_col, text_col):
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        k = F.size(toks)
        gh = F.when(k < n, F.array(F.xxhash64(toks))).otherwise(
            F.transform(
                F.sequence(F.lit(1), k - n + 1),
                lambda i: F.xxhash64(F.slice(toks, i, n)),
            )
        )
        return frame.select(F.col(id_col), F.explode(F.array_distinct(gh)).alias("_g"))

    d = em._t(spark, sf_dir, "documents").select("doc_id", "text")
    probe = d.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("probe_id"), F.col("text").alias("ptext")
    )
    new = (
        _hgrams(d, "doc_id", "text")
        .join(_hgrams(probe, "probe_id", "ptext"), "_g")
        .groupBy("doc_id", "probe_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
        .select("doc_id", "probe_id", "shared_ngrams")
    )
    return old, new


def _jaccard_pair(spark, sf_dir):
    # OLD = the pre-r15 single-projection form (re-evaluates the
    # shingle chain per reference); NEW = the landed registered query
    # (barriered operator + word_shingles n=1 short-circuit).
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import (
        relational,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.functions.hashing import (
        word_shingles,
    )

    d = em._t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = relational.consecutive_pairs(d, "doc_id", "text", 100, "next_text").filter(
        F.col("next_text").isNotNull()
    )

    def _old_shingles(c):
        # pre-r15 word_shingles(n=1): per-token slice+concat_ws
        toks = F.split(F.trim(F.col(c)), r"\s+")
        k = F.size(toks)
        full = F.array(F.concat_ws(" ", toks))
        windows = F.transform(
            F.sequence(F.lit(1), k), lambda i: F.concat_ws(" ", F.slice(toks, i, 1))
        )
        return F.when(k < 1, full).otherwise(windows)

    sa = F.array_distinct(_old_shingles("text"))
    sb = F.array_distinct(_old_shingles("next_text"))
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    old = pairs.withColumn(
        "jaccard",
        F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0)),
    ).select("doc_id", F.round("jaccard", 4).alias("jaccard"))

    new = em.queries()["dedup_jaccard_consecutive"](spark, sf_dir)
    return old, new


PAIRS = {
    "dedup_exact_narrow": _dedup_exact_pair,
    "tumbling_longkey": _tumbling_pair,
    "ann_recall_fused": _ann_recall_pair,
    "dup_apply_hashed": _dup_apply_pair,
    "contamination_hashed": _contamination_pair,
    "jaccard_fast": _jaccard_pair,
}


def _canon(df):
    tbl = df.toArrow()
    import pyarrow.compute as pc

    order = [(n, "ascending") for n in tbl.column_names]
    return tbl.take(pc.sort_indices(tbl, sort_keys=order))


def main() -> None:
    cand = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = sized_session(sf_dir, app_name=f"r15ab_{cand}")
    warm_up(spark, sf_dir)
    old_df, new_df = PAIRS[cand](spark, sf_dir)

    a, b = _canon(old_df), _canon(new_df)
    # names + types must match; Arrow nullability flags are not part of
    # the oracle contract (the harness compares names + values only)
    assert [(f.name, f.type) for f in a.schema] == [
        (f.name, f.type) for f in b.schema
    ], (a.schema, b.schema)
    b = b.cast(a.schema)
    assert a.equals(b), "RESULTS DIFFER"
    print(f"results identical: {a.num_rows} rows")

    # REBUILD both frames for every timed execution: under AQE a
    # re-executed action on the SAME DataFrame object reuses its
    # already-materialized query stages (shuffles), so timing repeated
    # toArrow() calls on one object measures only the post-shuffle
    # tail (caught r15: a 25 s sf10 query "timed" 0.3 s). bench.py and
    # ab.py rebuild per call via queries()[name](...); mirror that.
    t_old = t_new = float("inf")
    for _ in range(reps):
        o_df, n_df = PAIRS[cand](spark, sf_dir)
        t0 = time.perf_counter(); n_df.toArrow(); t_new = min(t_new, time.perf_counter() - t0)
        o_df, n_df = PAIRS[cand](spark, sf_dir)
        t0 = time.perf_counter(); o_df.toArrow(); t_old = min(t_old, time.perf_counter() - t0)
    print(f"{cand}: old {t_old:.3f}s  new {t_new:.3f}s  new/old {t_new / t_old:.3f}  "
          f"load {os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()
