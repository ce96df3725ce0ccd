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
    # OLD = explode bigrams -> groupBy(doc_id, gram) count -> groupBy
    # (doc_id) max/sum (two gram-string exchanges). NEW = per-row form:
    # sort the shingle array, longest equal run = top gram count —
    # zero exchanges, no gram ever leaves its row.
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.functions.hashing import (
        word_shingles,
    )

    d = em._t(spark, sf_dir, "documents").select("doc_id", "text")
    old = em.queries()["text_repetition_ratio"](spark, sf_dir)

    grams = word_shingles(F.col("text"), 2)
    # barrier: materialize the sorted gram array once (r15 Generate-
    # barrier pattern), then compute run stats from the materialized col
    bar = d.select(
        "doc_id", F.explode(F.array(F.array_sort(grams))).alias("_s")
    )
    s = F.col("_s")
    n = F.size(s)
    starts = F.filter(
        F.sequence(F.lit(1), n), lambda i: (i == 1) | (s[i - 1] != s[i - 2])
    )
    bar2 = bar.select(
        "doc_id", n.alias("_n"), F.explode(F.array(starts)).alias("_starts")
    )
    bounds = F.concat(
        F.slice(F.col("_starts"), 2, F.size(F.col("_starts"))),
        F.array(F.col("_n") + 1),
    )
    max_run = F.array_max(F.zip_with(bounds, F.col("_starts"), lambda b, a: b - a))
    new = bar2.filter(F.col("_n") > 0).select(
        "doc_id",
        F.round(max_run.cast("double") / F.col("_n").cast("double"), 4).alias(
            "rep_ratio"
        ),
        max_run.cast("long").alias("top_gram_count"),
        F.col("_n").cast("long").alias("total_grams"),
    )
    return old, new


def _sketches_pair(spark, sf_dir):
    # OLD = declared agg_approx_sketches (exact p49/p51 via
    # buffer-everything percentile). NEW = exact percentiles from a
    # value histogram: groupBy(flag, price) counts -> cumulative ranks
    # -> Spark's interpolation formula on the two straddling order
    # statistics; only distinct (flag, price) rows ever shuffle.
    li = em._t(spark, sf_dir, "lineitem")
    old = em.queries()["agg_approx_sketches"](spark, sf_dir)

    exact = (
        li.groupBy("l_returnflag", "l_orderkey")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_nd"))
    )
    sk = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_nd"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_p50"),
    )
    hist = (
        li.filter(F.col("l_extendedprice").isNotNull())
        .groupBy("l_returnflag", F.col("l_extendedprice").cast("double").alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wp = W.partitionBy("l_returnflag")
    wo = wp.orderBy("_v")
    cum = (
        hist.withColumn("_hi", F.sum("_c").over(wo))
        .withColumn("_lo", F.col("_hi") - F.col("_c"))
        .withColumn("_n", F.sum("_c").over(wp))
    )

    # Spark Percentile semantics: pos = p*(n-1) 0-based;
    # v = v_floor*(ceil-pos) + v_ceil*(pos-floor) when floor!=ceil
    pos49 = F.lit(0.49) * (F.col("_n") - 1).cast("double")
    pos51 = F.lit(0.51) * (F.col("_n") - 1).cast("double")
    agg = cum.groupBy("l_returnflag").agg(
        *[
            F.min(
                F.when(
                    (F.col("_lo") <= fn(pos)) & (fn(pos) < F.col("_hi")), F.col("_v")
                )
            ).alias(name)
            for pos, tag in ((pos49, "49"), (pos51, "51"))
            for fn, name in (
                (lambda p: F.floor(p).cast("long"), f"_f{tag}"),
                (lambda p: F.ceil(p).cast("long"), f"_c{tag}"),
            )
        ],
        F.first(pos49).alias("_pos49"),
        F.first(pos51).alias("_pos51"),
    )

    def interp(f, c, pos):
        fl = F.floor(pos).cast("double")
        ce = F.ceil(pos).cast("double")
        return F.when(fl == ce, F.col(f)).otherwise(
            F.col(f) * (ce - pos) + F.col(c) * (pos - fl)
        )

    pct = agg.select(
        "l_returnflag",
        interp("_f49", "_c49", F.col("_pos49")).alias("p49"),
        interp("_f51", "_c51", F.col("_pos51")).alias("p51"),
    )
    new = (
        sk.join(F.broadcast(exact), "l_returnflag")
        .join(F.broadcast(pct), "l_returnflag")
        .select(
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
    )
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
