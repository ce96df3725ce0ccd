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


PAIRS = {
    "funnel_window": _funnel_pair,
    "banded_full": _banded_pair,
    "repetition_rowlocal": _repetition_rowlocal_pair,
    "sketches_hist": _sketches_pair,
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
