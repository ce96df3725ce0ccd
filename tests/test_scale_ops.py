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


def test_repetition_ratio_rowlocal_matches_explode_form(spark):
    """r16 optimization equivalence: the zero-shuffle row-local form of
    text.repetition_ratio (sorted shingle array -> longest equal run)
    must reproduce the pre-r16 explode -> grouped-count form exactly —
    including max-count ties, all-identical grams, short docs hitting
    the k<n full-join shingle, empty text (one "" gram), and NULL text
    (document absent from the output)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.functions.hashing import (
        word_shingles,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.text import (
        repetition_ratio,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    rows = [
        (1, "a b a b a b c"),          # "a b" x3 dominates
        (2, "x y z w"),                # all bigrams distinct (tie at 1)
        (3, "q q q q q"),              # single repeated bigram
        (4, "one"),                    # k < n: one full-join gram
        (5, ""),                       # one "" gram
        (6, None),                     # NULL text: absent
        (7, "p q p q r s r s"),        # two bigrams tied at 2
    ]
    df = spark.createDataFrame(rows, schema)

    for n in (2, 3):
        got = {r["doc_id"]: tuple(r)[1:] for r in repetition_ratio(df, "doc_id", "text", n=n).collect()}
        grams = df.select(
            F.col("doc_id"), F.explode(word_shingles(F.col("text"), n)).alias("_g")
        )
        per_gram = grams.groupBy("doc_id", "_g").agg(F.count(F.lit(1)).alias("_c"))
        want = {
            r["doc_id"]: tuple(r)[1:]
            for r in per_gram.groupBy("doc_id")
            .agg(
                F.round(F.max("_c").cast("double") / F.sum("_c").cast("double"), 4).alias("rep_ratio"),
                F.max("_c").cast("long").alias("top_gram_count"),
                F.sum("_c").cast("long").alias("total_grams"),
            )
            .collect()
        }
        assert got == want, n
    assert 6 not in got


def test_exact_percentile_histogram_selection_matches_buffered(spark):
    """r16 optimization equivalence for agg_approx_sketches' corridor:
    exact percentiles computed by histogram selection (distinct-value
    counts + cumulative ranks + Percentile's weighted interpolation)
    must match F.percentile on adversarial groups — heavy duplicate
    values, a single-row group, fractional positions landing inside a
    duplicate run, and positions on an exact integer boundary."""
    import random

    from pyspark.sql import Window as W

    rng = random.Random(16)
    rows = [("a", float(rng.choice([1, 2, 2, 2, 3, 5, 8, 8, 13]))) for _ in range(101)]
    rows += [("b", 42.0)]                                 # single-row group
    rows += [("c", float(v)) for v in range(100)]         # all-distinct
    df = spark.createDataFrame(rows, "g string, v double")

    ps = (0.49, 0.5, 0.51, 0.25)
    want = {
        r["g"]: tuple(r)[1:]
        for r in df.groupBy("g")
        .agg(*[F.percentile("v", p).alias(f"p{i}") for i, p in enumerate(ps)])
        .collect()
    }

    hist = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("_c"))
    wp = W.partitionBy("g")
    cum = (
        hist.withColumn("_hi", F.sum("_c").over(wp.orderBy("v")))
        .withColumn("_lo", F.col("_hi") - F.col("_c"))
        .withColumn("_n", F.sum("_c").over(wp))
    )
    aggs, poss = [], []
    for i, p in enumerate(ps):
        pos = F.lit(p) * (F.col("_n") - 1).cast("double")
        poss.append(F.first(pos).alias(f"_pos{i}"))
        for ix, name in (
            (F.floor(pos).cast("long"), f"_f{i}"),
            (F.ceil(pos).cast("long"), f"_c{i}"),
        ):
            aggs.append(
                F.min(F.when((F.col("_lo") <= ix) & (ix < F.col("_hi")), F.col("v"))).alias(name)
            )
    agg = cum.groupBy("g").agg(*aggs, *poss)

    def interp(i):
        pos = F.col(f"_pos{i}")
        fl, ce = F.floor(pos).cast("double"), F.ceil(pos).cast("double")
        return F.when(fl == ce, F.col(f"_f{i}")).otherwise(
            F.col(f"_f{i}") * (ce - pos) + F.col(f"_c{i}") * (pos - fl)
        )

    got = {
        r["g"]: tuple(r)[1:]
        for r in agg.select("g", *[interp(i).alias(f"p{i}") for i in range(len(ps))]).collect()
    }
    assert got == want


def test_word_shingles_zipwith_chain_matches_per_position_form(spark):
    """r16 optimization equivalence: word_shingles' zip-with-chain
    window build (n slices + element-wise concat) must reproduce the
    pre-r16 per-position slice + concat_ws form for every n — short
    docs hitting the k<n full-join branch, empty text ([""]), NULL
    text (NULL array), ragged whitespace, and a long repeated doc."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.functions.hashing import (
        word_shingles,
    )

    rows = [
        (1, "a b c d e f g"),
        (2, "x y"),
        (3, "one"),
        (4, ""),
        (5, None),
        (6, "  padded   whitespace  text  here "),
        (7, "t " * 200),
    ]
    df = spark.createDataFrame(rows, "id long, text string")

    def old_shingles(text, n):
        toks = F.split(F.trim(text), r"\s+")
        k = F.size(toks)
        full = F.array(F.concat_ws(" ", toks))
        windows = F.transform(
            F.sequence(F.lit(1), k - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
        return F.when(k < n, full).otherwise(windows)

    for n in (2, 3, 4, 8):
        got = {r["id"]: r["s"] for r in df.select("id", word_shingles(F.col("text"), n).alias("s")).collect()}
        want = {r["id"]: r["s"] for r in df.select("id", old_shingles(F.col("text"), n).alias("s")).collect()}
        assert got == want, n


def test_winnow_least_chain_matches_per_position_window_min(spark):
    """r16 optimization equivalence: winnow_fingerprints' sliding
    window minima as a least() zip-with chain must reproduce the
    pre-r16 per-position slice + array_min form — short docs (fewer
    k-grams than the window), all-identical grams, empty text, NULL
    text (no fingerprints), and a long doc with repeating vocabulary —
    for several (k, window) shapes."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.functions.hashing import (
        base_hash31,
        word_shingles,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        winnow_fingerprints,
    )

    rows = [
        (1, "a b c d e f g h i j k l m n"),
        (2, "x y"),
        (3, "one"),
        (4, ""),
        (5, None),
        (6, "r r r r r r r r r r"),
        (7, " ".join(f"w{i % 5}" for i in range(60))),
    ]
    df = spark.createDataFrame(rows, "id long, text string")

    def old_winnow(df, text_col, id_col, k, window):
        hashes = F.transform(word_shingles(F.col(text_col), k), lambda s: base_hash31(s))
        hashed = df.select(F.col(id_col), F.explode(F.array(hashes)).alias("_h"))
        n_windows = F.greatest(F.size("_h") - F.lit(window - 1), F.lit(1))
        minima = F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_min(F.slice("_h", i, window)),
        )
        return (
            hashed.select(F.col(id_col), F.explode(F.array_distinct(minima)).alias("fingerprint"))
            .filter(F.col("fingerprint").isNotNull())
        )

    for k, w in ((4, 8), (2, 3), (1, 2)):
        got = sorted(map(tuple, winnow_fingerprints(df, "text", "id", k=k, window=w).collect()))
        want = sorted(map(tuple, old_winnow(df, "text", "id", k, w).collect()))
        assert got == want, (k, w)
