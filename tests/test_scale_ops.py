"""Scale-engineering operator tests: salted skew joins agree with
plain joins; bucketed tables co-locate joins (no Exchange)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (  # noqa: E402
    salted_join,
)
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.plans import explain_str  # noqa: E402
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table  # noqa: E402
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import (  # noqa: E402
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = (
        o.join(c, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("t"))
    )
    salted = (
        salted_join(o, c, "o_custkey", salt_buckets=8)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("t"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_no_shuffle(spark, sf_dir):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        write_bucketed(li, "li_bkt", "l_orderkey", 8, sort_cols="l_orderkey")
        write_bucketed(
            o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_bkt", "l_orderkey", 8,
            sort_cols="l_orderkey",
        )
        joined = spark.table("li_bkt").join(spark.table("o_bkt"), "l_orderkey")
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan, plan
        # co-located: bucketed scans feed the join with no Exchange
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_band_count_join_matches_bnl_and_has_no_nested_loop(spark, sf_dir):
    """band_count_join must equal the naive band-BNL count per key and
    plan without any nested-loop/cartesian operator (the sf10
    scale-killer it replaces)."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        band_count_join,
    )

    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    fast = band_count_join(
        s, c, ["s_suppkey"], "s_acctbal", "c_acctbal",
        delta=100.0, bin_width=2.0, count_alias="n_close",
    )
    plan = explain_str(fast)
    assert "Cartesian" not in plan, plan[:800]
    # the ONLY nested-loop allowed is the condition-less Cross against
    # the broadcast 1-row bounds relation (the constants pattern);
    # a band-predicate BNL would plan as a CONDITIONED BNL join
    import re

    bnl = re.findall(r"BroadcastNestedLoopJoin[^\n]*", plan)
    assert not any((">=" in b) or ("<=" in b) for b in bnl), bnl
    naive = (
        s.join(c, c.c_acctbal.between(s.s_acctbal - 100, s.s_acctbal + 100), "left")
        .groupBy("s_suppkey")
        .agg(F.count("c_custkey").alias("n_close"))
    )
    a = {r["s_suppkey"]: r["n_close"] for r in fast.collect()}
    b = {r["s_suppkey"]: r["n_close"] for r in naive.collect()}
    assert a == b
    assert sum(a.values()) > 0


def test_band_count_join_null_and_boundary_semantics(spark):
    """NULL left values count 0; NULL right values never match;
    boundary values are inclusive on both ends (between semantics)."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        band_count_join,
    )

    left = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 100.0)], "k int, v double"
    )
    right = spark.createDataFrame(
        [(5.0,), (15.0,), (None,), (20.0,), (95.0,)], "w double"
    )
    out = {
        r["k"]: r["n"]
        for r in band_count_join(
            left, right, ["k"], "v", "w", delta=5.0, bin_width=2.0,
            count_alias="n",
        ).collect()
    }
    # k=1 band [5,15]: matches 5.0 and 15.0 (inclusive both ends)
    # k=2 NULL band: 0;  k=3 band [95,105]: matches 95.0
    assert out == {1: 2, 2: 0, 3: 1}, out


def test_binned_range_join_equijoin_plan_and_parity(spark, sf_dir):
    """binned_range_join must (a) match the BNL band join's answer and
    (b) execute as an equi-join on the bin id — no nested-loop or
    cartesian operator in the physical plan."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        binned_range_join,
    )

    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 100).alias("lo"),
        (F.col("s_acctbal") + 100).alias("hi"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    binned = binned_range_join(
        c, s, point_col="c_acctbal", lo_col="lo", hi_col="hi", bin_width=200.0
    )
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan

    naive = c.join(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal"),
        F.col("c_acctbal").between(F.col("s_acctbal") - 100, F.col("s_acctbal") + 100),
    ).select("s_suppkey", "c_custkey")
    got = binned.select("s_suppkey", "c_custkey")
    assert got.exceptAll(naive).count() == 0 and naive.exceptAll(got).count() == 0


def test_salted_outer_join_matches_plain(spark, sf_dir):
    """left/right/full salted joins must equal the plain outer joins
    row-for-row (exceptAll both ways = multiplicity-exact): unmatched
    big rows surface once (single salt per row), unmatched small rows
    once (anti-join recovery), never per-bucket."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", F.col("o_custkey").alias("c_custkey"), "o_totalprice")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 5)
        .select("c_custkey", "c_name")
    )
    for how in ("left", "right", "full"):
        plain = o.join(c, "c_custkey", how)
        salted = salted_join(o, c, "c_custkey", how=how, salt_buckets=8).select(
            *plain.columns
        )
        assert salted.exceptAll(plain).count() == 0, how
        assert plain.exceptAll(salted).count() == 0, how


def test_binned_range_outer_join_matches_plain(spark, sf_dir):
    """Outer binned range joins: parity with the BNL outer range join
    (exactly-once unmatched surfacing despite interval bin explosion)
    and no nested-loop operator in the physical plan."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        binned_range_join,
    )

    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 3)
        .select(
            "s_suppkey",
            (F.col("s_acctbal") - 50).alias("lo"),
            (F.col("s_acctbal") + 50).alias("hi"),
        )
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    for how in ("left", "right", "full"):
        plain = c.join(
            s, F.col("c_acctbal").between(F.col("lo"), F.col("hi")), how
        ).select("c_custkey", "c_acctbal", "s_suppkey")
        binned = binned_range_join(
            c, s, point_col="c_acctbal", lo_col="lo", hi_col="hi",
            bin_width=100.0, how=how,
        ).select("c_custkey", "c_acctbal", "s_suppkey")
        plan = binned._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
        assert binned.exceptAll(plain).count() == 0, how
        assert plain.exceptAll(binned).count() == 0, how


def test_binned_overlap_join_plan_and_parity(spark, sf_dir):
    """binned_overlap_join must (a) match the naive theta overlap join
    with multiplicity exactness — the canonical-bin assignment emits
    each overlapping pair exactly once despite multi-bin replication —
    (b) run as an equi-join (no BNL/cartesian), and (c) hold for full
    outer (unmatched intervals surface once, null-extended)."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        binned_overlap_join,
    )

    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("a_id"),
        F.col("s_acctbal").alias("a_lo"),
        (F.col("s_acctbal") + 150).alias("a_hi"),
    )
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 3).select(
        F.col("c_custkey").alias("b_id"),
        F.col("c_acctbal").alias("b_lo"),
        (F.col("c_acctbal") + 80).alias("b_hi"),
    )
    binned = binned_overlap_join(s, c, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=100.0)
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan

    naive = s.join(c, (F.col("a_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("a_hi")))
    got = binned.select("a_id", "b_id")
    want = naive.select("a_id", "b_id")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    full_b = binned_overlap_join(
        s, c, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=100.0, how="full"
    ).select("a_id", "b_id")
    full_n = s.join(
        c, (F.col("a_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("a_hi")), "full"
    ).select("a_id", "b_id")
    assert full_b.exceptAll(full_n).count() == 0 and full_n.exceptAll(full_b).count() == 0


def test_bloom_prefilter_join_exact_and_selective(spark, sf_dir):
    """Bloom-prefiltered join must equal the plain join exactly (no
    false negatives; false positives die in the exact join), and the
    pre-filter must actually drop most fact rows for a selective dim
    (the shuffle-volume win it exists for)."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        bloom_prefilter_join,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 490000
    ).select("o_orderkey", "o_orderpriority")

    got = bloom_prefilter_join(li, o, "o_orderkey")
    want = li.join(o, "o_orderkey")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # selectivity: the bloom pass keeps well under half the fact
    n_dim = o.count()
    if n_dim:  # fpr is sized for the fixture dim cardinality
        matched = want.count()
        # reconstruct the prefilter row count via a semi-join bound:
        # prefiltered >= matched (no false negatives) and << fact
        n_fact = li.count()
        kept = bloom_prefilter_join(li, o, "o_orderkey", how="left_semi").count()
        assert kept <= matched  # semi join of exact result
        assert matched < n_fact / 2


def test_bloom_prefilter_join_rejects_outer(spark, sf_dir):
    import pytest

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        bloom_prefilter_join,
    )

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_prefilter_join(li, o, "o_orderkey", how="left")


def test_assign_dense_ids_matches_global_window_without_global_sort(spark, sf_dir):
    """Dense ids must equal the single-window global row_number form
    value-for-value, while the plan contains NO single-partition
    exchange (the thing the operator exists to avoid). Also pins the
    boundary-consistency fix: offsets and final job must see the SAME
    range partitioning (RangePartitioner re-samples per job without
    the materialization — block-shifted ids, observed)."""
    from pyspark.sql import Window

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        assign_dense_ids,
    )

    e = load_table(spark, sf_dir, "events").select("event_id", "ts")
    out = assign_dense_ids(e, ["ts", "event_id"], num_partitions=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan

    got = {r["event_id"]: r["dense_id"] for r in out.collect()}
    w = Window.orderBy("ts", "event_id")
    want = {
        r["event_id"]: r["rn"]
        for r in e.withColumn("rn", (F.row_number().over(w) - 1).cast("long")).collect()
    }
    assert got == want
    assert sorted(got.values()) == list(range(len(got)))


def test_pack_sequences_matches_global_window_without_global_sort(spark, sf_dir):
    """Corpus-wide sequence packing (r13): values must equal the
    naive global-window prefix-sum form exactly, while the plan
    contains NO single-partition exchange (the operator's reason to
    exist — same mechanism as assign_dense_ids, SUM for COUNT). Also
    pins straddle semantics: a doc belongs to the sequence its FIRST
    token lands in, offsets are cum_tokens_before % budget, and every
    sequence id from 0..max is populated (contiguous packing can skip
    none)."""
    from pyspark.sql import Window

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.text import (
        pack_sequences,
        token_count,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = pack_sequences(d, order_col="doc_id", budget=256, num_partitions=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan

    got = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_offset"])
        for r in out.collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = (
        d.withColumn("n_tokens", token_count(F.col("text")).cast("long"))
        .withColumn("cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    )
    want = {
        r["doc_id"]: (r["n_tokens"], r["cum"] // 256, r["cum"] % 256)
        for r in naive.collect()
    }
    assert got == want
    seqs = sorted({v[1] for v in got.values()})
    assert seqs == list(range(seqs[-1] + 1))  # no skipped sequence ids
