#!/usr/bin/env python
"""Interleaved old-vs-new plan-form A/B for the r16 optimization round.

Same protocol as tools/r15_form_ab.py: build BOTH forms in one
bench-policy session, assert identical results (sorted Arrow), then
time alternations with BOTH plans rebuilt per repetition (AQE
stage-reuse guard — r15's measurement trap) and report each form's
min. Timed action is the noop sink (guide §1.4) so huge results
(8.5M-row banded pairs) don't charge an Arrow fetch to either arm.

Usage: python tools/r16_form_ab.py <candidate> [reps]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Candidates: funnel_window | banded_full | repetition_rowlocal |
            sketches_hist
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from bench import sized_session, warm_up  # noqa: E402


def _funnel_pair(spark, sf_dir):
    # OLD = the pre-r16 per-user pandas DP (kept as the reference
    # implementation); NEW = the landed chained range-frame windows.
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        _sequence_funnel_maximal_dp,
    )

    e = em._t(spark, sf_dir, "events")
    old = _sequence_funnel_maximal_dp(
        e, "user_id", "ts", "event_type",
        ["signup", "click", "purchase"], max_gap_seconds=7 * 86400,
    ).select(
        "user_id",
        F.unix_micros("t1").alias("t1_us"),
        F.unix_micros("t2").alias("t2_us"),
        F.unix_micros("t3").alias("t3_us"),
    )
    new = em.queries()["funnel_three_step_maximal"](spark, sf_dir)
    return old, new


def _banded_pair(spark, sf_dir):
    # OLD = the r15 form: ids-only candidate SELF-JOIN + dropDuplicates,
    # vectors attached by planner-strategy joins, inline cosine_sim
    # (five HOF folds per pair). NEW = the landed r16 form (grouped
    # sorted-id-array pair generation, per-vector norms, gated
    # broadcast attach).
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.functions.vector import (
        cosine_sim,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import (
        vectors as vec_ops,
    )

    e = em._t(spark, sf_dir, "embeddings")
    planes = vec_ops.planes_for_corpus(em._table_rows(sf_dir, "embeddings"))
    banded = vec_ops.hyperplane_buckets_banded(
        e, "embedding", 64, 4, planes
    ).select(F.col("vec_id"), "band", "bucket")
    a = banded.select(F.col("vec_id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("vec_id").alias("id_b"), "band", "bucket")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"))
    old = (
        pairs.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cos", cosine_sim(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cos") > 0.6)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )
    new = em.queries()["vec_banded_neardup"](spark, sf_dir)
    return old, new


def _repetition_rowlocal_pair(spark, sf_dir):
    # OLD = the pre-r16 form: explode bigrams -> groupBy(doc_id, gram)
    # count -> groupBy(doc_id) max/sum (two gram-string exchanges).
    # NEW = the landed row-local form (operators.text.repetition_ratio):
    # sort the shingle array, longest equal run = top gram count —
    # zero exchanges, no gram ever leaves its row.
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.functions.hashing import (
        word_shingles,
    )

    d = em._t(spark, sf_dir, "documents").select("doc_id", "text")
    grams = d.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 2)).alias("_g")
    )
    per_gram = grams.groupBy("doc_id", "_g").agg(F.count(F.lit(1)).alias("_c"))
    old = per_gram.groupBy("doc_id").agg(
        F.round(
            F.max("_c").cast("double") / F.sum("_c").cast("double"), 4
        ).alias("rep_ratio"),
        F.max("_c").cast("long").alias("top_gram_count"),
        F.sum("_c").cast("long").alias("total_grams"),
    )
    new = em.queries()["text_repetition_ratio"](spark, sf_dir)
    return old, new


def _sketches_pair(spark, sf_dir):
    # OLD = the pre-r16 form: exact p49/p51 via buffer-everything
    # F.percentile in the sketch agg. NEW = the landed declared query
    # (exact percentiles by histogram selection — only distinct
    # (flag, price) rows shuffle).
    li = em._t(spark, sf_dir, "lineitem")
    exact = (
        li.groupBy("l_returnflag", "l_orderkey")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_nd"))
    )
    sk = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_nd"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_p50"),
        F.percentile("l_extendedprice", 0.49).alias("p49"),
        F.percentile("l_extendedprice", 0.51).alias("p51"),
    )
    old = sk.join(F.broadcast(exact), "l_returnflag").select(
        "l_returnflag",
        "exact_nd",
        (
            F.abs(F.col("approx_nd") - F.col("exact_nd"))
            <= 0.05 * F.col("exact_nd")
        ).alias("nd_ok"),
        (
            (F.col("approx_p50") >= F.col("p49"))
            & (F.col("approx_p50") <= F.col("p51"))
        ).alias("p50_ok"),
    )
    new = em.queries()["agg_approx_sketches"](spark, sf_dir)
    return old, new


def _neardup_norms_pair(spark, sf_dir):
    # OLD = pre-r16 embedding_near_dup: inline cosine_sim (five HOF
    # folds per candidate pair). NEW = the landed form (norms computed
    # once per vector in the join inputs).
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.functions.vector import (
        cosine_sim,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import (
        vectors as vec_ops,
    )

    e = em._t(spark, sf_dir, "embeddings")
    planes = vec_ops.planes_for_corpus(em._table_rows(sf_dir, "embeddings"))
    bkts = vec_ops.hyperplane_buckets(e, "embedding", dim=64, n_planes=planes)
    a = bkts.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"),
        F.col("bucket").alias("bkt"),
    )
    b = bkts.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"),
        F.col("bucket").alias("bkt"),
    )
    old = (
        a.join(b, ["bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_sim(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cos") > 0.6)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )
    new = em.queries()["dedup_embedding_neardup"](spark, sf_dir)
    return old, new


def _bigram_surprisal_pair(spark, sf_dir):
    # OLD = pre-r16 bigram_surprisal with per-position element_at
    # struct builds. NEW = the landed zip-with-two-slices form.
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.text import (
        tokens,
    )

    d = em._t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    train = d.filter(F.col("doc_id") % 10 < 8)
    score = d  # mirror the declared query's frames loosely; identity is
    # asserted between the two FORMS below, not against the query

    def _old_bigrams(frame, with_id):
        toks = tokens(F.col("text"))
        pairs = F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        )
        cols = [F.col("doc_id")] if with_id else []
        return (
            frame.filter(F.size(toks) >= 2)
            .select(*cols, F.explode(pairs).alias("_b"))
            .select(*cols, F.col("_b.w1").alias("_w1"), F.col("_b.w2").alias("_w2"))
        )

    alpha = 0.4
    uni = train.select(F.explode(tokens(F.col("text"))).alias("_tok")).groupBy(
        "_tok"
    ).agg(F.count(F.lit(1)).alias("_uc"))
    consts = uni.agg(F.sum("_uc").alias("_n"))
    bi = _old_bigrams(train, with_id=False).groupBy(
        F.col("_w1").alias("_bw1"), F.col("_w2").alias("_bw2")
    ).agg(F.count(F.lit(1)).alias("_bc"))
    sc = (
        _old_bigrams(score, with_id=True)
        .join(bi, (F.col("_w1") == F.col("_bw1")) & (F.col("_w2") == F.col("_bw2")), "left")
        .join(uni.select(F.col("_tok").alias("_t1"), F.col("_uc").alias("_uc1")),
              F.col("_w1") == F.col("_t1"), "left")
        .join(uni.select(F.col("_tok").alias("_t2"), F.col("_uc").alias("_uc2")),
              F.col("_w2") == F.col("_t2"), "left")
        .crossJoin(F.broadcast(consts))
    )
    s = (
        F.when(F.col("_bc").isNotNull(), F.col("_bc") / F.col("_uc1"))
        .when(F.col("_uc2").isNotNull(), F.lit(alpha) * F.col("_uc2") / F.col("_n"))
        .otherwise(F.lit(alpha) * F.lit(alpha) / F.col("_n"))
    )
    old = (
        sc.select(F.col("doc_id"), (-F.log(s)).alias("_nll"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             F.round(F.avg("_nll"), 6).alias("surprisal"))
    )

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import (
        text as text_ops,
    )

    new_raw = text_ops.bigram_surprisal(score, "doc_id", "text", alpha=alpha, train_df=train)
    new = new_raw.select(
        "doc_id", "n_bigrams", F.round("surprisal", 6).alias("surprisal")
    )
    return old, new


PAIRS = {
    "funnel_window": _funnel_pair,
    "banded_full": _banded_pair,
    "repetition_rowlocal": _repetition_rowlocal_pair,
    "sketches_hist": _sketches_pair,
    "neardup_norms": _neardup_norms_pair,
    "bigram_surprisal_zip": _bigram_surprisal_pair,
}


def _canon(df):
    tbl = df.toArrow()
    import pyarrow.compute as pc

    order = [(n, "ascending") for n in tbl.column_names]
    return tbl.take(pc.sort_indices(tbl, sort_keys=order))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    cand = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = sized_session(sf_dir, app_name=f"r16ab_{cand}")
    warm_up(spark, sf_dir)
    old_df, new_df = PAIRS[cand](spark, sf_dir)

    a, b = _canon(old_df), _canon(new_df)
    assert [(f.name, f.type) for f in a.schema] == [
        (f.name, f.type) for f in b.schema
    ], (a.schema, b.schema)
    b = b.cast(a.schema)
    assert a.equals(b), "RESULTS DIFFER"
    print(f"results identical: {a.num_rows} rows", flush=True)

    # rebuild both frames per timed execution (AQE stage-reuse guard);
    # noop sink so result size never biases an arm
    t_old = t_new = float("inf")
    for _ in range(reps):
        o_df, n_df = PAIRS[cand](spark, sf_dir)
        t0 = time.perf_counter(); _noop(n_df); t_new = min(t_new, time.perf_counter() - t0)
        o_df, n_df = PAIRS[cand](spark, sf_dir)
        t0 = time.perf_counter(); _noop(o_df); t_old = min(t_old, time.perf_counter() - t0)
        print(f"  rep done (load {os.getloadavg()[0]:.2f})", flush=True)
    print(f"{cand}: old {t_old:.3f}s  new {t_new:.3f}s  new/old {t_new / t_old:.3f}  "
          f"load {os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()
