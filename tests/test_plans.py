"""Plan-shape tests: the 100 TB contract asserted on .explain output.

Correct results with a wrong plan (filter not pushed, dim not
broadcast, agg not partial) pass value tests but die at scale — so the
plan shape is tested explicitly (SURVEY §4)."""

from __future__ import annotations

import os
import re
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import cdc  # noqa: E402
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.plans import (  # noqa: E402
    assert_broadcast,
    assert_pushed_filters,
    explain_str,
)
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table  # noqa: E402


def test_incremental_scan_filter_pushed(spark, sf_dir):
    """The CDC watermark predicate must reach the scan (≙ the
    reference inlining it into source SQL, service.py:53)."""
    li = load_table(spark, sf_dir, "lineitem")
    df = cdc.incremental_scan(li, "l_shipdate", "1998-01-01").select("l_orderkey")
    assert_pushed_filters(df, "l_shipdate")


def test_scan_prunes_columns(spark, sf_dir):
    """A 2-column projection must not read all 11 lineitem columns."""
    li = load_table(spark, sf_dir, "lineitem")
    plan = explain_str(li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 10))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    assert "l_extendedprice" not in read_schema[0], read_schema[0]


def test_q3_broadcasts_dimension(spark, sf_dir):
    df = entrymod.queries()["q3_shipping_priority"](spark, sf_dir)
    assert_broadcast(df)


def test_q5_star_join_all_broadcast(spark, sf_dir):
    """Q5's dim chain must end up broadcast — zero sort-merge joins in
    the plan that actually ran. r3 dropped the forced hints (supplier
    scales SF*10k, unbounded at 100 TB), so the broadcast decision is
    AQE's, made from true runtime sizes: assert on the final adaptive
    plan after execution, not the static estimate."""
    df = entrymod.queries()["q5_region_revenue"](spark, sf_dir)
    df.collect()
    plan = explain_str(df)
    assert "isFinalPlan=true" in plan, plan
    final = plan.split("\n\n")[0].split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") >= 3, final
    assert "SortMergeJoin" not in final, final


def test_q1_partial_aggregation(spark, sf_dir):
    """Hash agg must run in partial+final mode (map-side combine)."""
    df = entrymod.queries()["q1_pricing_summary"](spark, sf_dir)
    plan = explain_str(df)
    assert "HashAggregate" in plan, plan
    assert "partial_" in plan.lower() or "Partial" in plan, plan


def test_topk_no_global_sort(spark, sf_dir):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject, not a full
    Exchange+Sort."""
    df = entrymod.queries()["sort_topk_lineitem"](spark, sf_dir)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_results_invariant_under_join_strategy(spark, sf_dir):
    """Correctness must not depend on the physical join strategy the
    optimizer picks (broadcast now, sort-merge at 100x the data): the
    same query forced down both paths returns identical results."""
    q3 = entrymod.queries()["q3_shipping_priority"]
    broadcast_rows = sorted(map(tuple, q3(spark, sf_dir).collect()))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        smj_rows = sorted(map(tuple, q3(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert broadcast_rows == smj_rows


def test_plan_report_q5(spark, sf_dir):
    """q5's executed-plan report: broadcast-only joins once AQE has
    applied runtime sizes, bounded shuffle count, pushdown present.
    (Pre-r3 this asserted on the static plan, which relied on forced
    broadcast hints the 100 TB contract forbids.)"""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.plans import plan_report

    df = entrymod.queries()["q5_region_revenue"](spark, sf_dir)
    df.collect()
    rep = plan_report(df)
    assert rep["sort_merge_joins"] == 0, rep
    assert rep["broadcast_joins"] >= 3, rep
    # AQE keeps the exchanges it later reads locally for converted
    # joins + the final agg; what matters is no join-side blowup
    assert rep["exchanges"] <= 4, rep
    assert rep["pushed_filters"], rep


def test_join_strategy_hints(spark, sf_dir):
    """Join strategy is steerable per-site when Catalyst's default is
    wrong for a workload: hints must survive into the physical plan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    shuffled = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    assert "ShuffledHashJoin" in explain_str(shuffled)
    merged = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    assert "SortMergeJoin" in explain_str(merged)


def test_partition_pruning(spark, sf_dir, tmp_path):
    """A partitioned layout must prune non-matching partitions at plan
    time (the 100 TB table layout: partition by coarse key, cluster by
    join key)."""
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    df = spark.read.parquet(out).filter(F.col("lang") == "en").select("doc_id")
    plan = explain_str(df)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "lang" in pf[0], plan
    assert df.count() == docs.filter(F.col("lang") == "en").count()


def test_minhash_partial_min(spark, sf_dir):
    """MinHash signature agg must combine map-side: the shuffle
    carries (id, k longs), not shingles."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        minhash_signatures,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = explain_str(minhash_signatures(d, "text", "doc_id", 8))
    assert "partial_min" in plan, plan


def test_no_fact_side_broadcast_hints(spark, sf_dir):
    """Regression (VERDICT r1 #3, tightened r3 per ADVICE): every
    SF-scaled relation — orders, customer, part, AND supplier (SF*10k
    rows) — must carry no forced broadcast hint. With the
    auto-broadcast threshold disabled, q3 and q5 must show zero
    BroadcastHashJoin: q5's supplier⋈nation⋈region chain is
    supplier-derived and unbounded at 100 TB, so its broadcast is
    AQE's runtime call, never forced."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q3_plan = explain_str(entrymod.queries()["q3_shipping_priority"](spark, sf_dir))
        q5_plan = explain_str(entrymod.queries()["q5_region_revenue"](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "BroadcastHashJoin" not in q3_plan, q3_plan
    # formatted plans list each node twice (tree + details); count the
    # detail headers only
    bhj = re.findall(r"^\(\d+\) BroadcastHashJoin", q5_plan, flags=re.M)
    assert len(bhj) == 0, q5_plan


def _forced_bhj_count(spark, sf_dir, name):
    """BroadcastHashJoin nodes that survive auto-broadcast being off —
    i.e. joins we explicitly hinted."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(entrymod.queries()[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    return len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan, flags=re.M)), plan


def test_no_fact_side_broadcast_hints_tpch_family(spark, sf_dir):
    """Regression (VERDICT r1 #3; tightened r3 per ADVICE): every
    SF-scaled relation — orders, customer, part, supplier, and any
    frame derived from them — must carry no forced broadcast hint.
    The only hints that survive auto-broadcast being disabled are on
    constant-cardinality frames: nation (25 rows), region (5),
    nation⋈region key lists, and 1-row scalar aggregates."""
    expected = {
        # broadcast(nation) + broadcast(region); x2 because the dim
        # chain subtree is evaluated twice (`eligible` also feeds the
        # per-part min aggregate it rejoins with)
        "q2_min_cost_supplier": 4,
        "q7_volume_shipping": 0,  # r3: supplier-chain hint dropped
        "q8_market_share": 1,  # nation⋈region(ASIA) key list only
        # r7: supplier⋈nation now rides _supplier_chain (LocalRelation
        # below the gate — the planner broadcasts it by size, no hint)
        "q9_product_type_profit": 0,
        "q10_returned_items": 1,  # customer ⋈ broadcast(nation) only
        # broadcast(nation) only; x2 because pv (which embeds it) is
        # evaluated twice — once per se, once for the scalar total
        "q11_important_stock": 2,
        "q12_priority_shipmode": 0,
        "q13_customer_distribution": 0,
        "q14_promo_share": 0,
        "q15_top_supplier": 1,  # 1-row max(total_revenue) only
        "q16_parts_supplier_count": 0,  # r3: denylist hint dropped
        "q17_small_quantity_revenue": 0,  # r3: part-derived hints dropped
        "q18_large_orders_having": 0,
        "q19_disjunctive_predicates": 0,
        "q20_part_promo_suppliers": 1,  # broadcast(nation) only
        "q21_suppliers_kept_waiting": 0,  # r3: supplier hint dropped
    }
    for name, want in expected.items():
        n, plan = _forced_bhj_count(spark, sf_dir, name)
        assert n == want, (name, want, n, plan)


def test_multigrain_rollup_single_scan(spark, sf_dir):
    """timeseries_multigrain_rollup must roll up all granularities in
    ONE table pass: exactly one FileScan, fan-out via Expand, and a
    partial aggregate before the exchange (a grain-per-job loop would
    read the table G times — the 100 TB anti-pattern)."""
    import __spark_entry__ as entry

    df = entry.queries()["timeseries_multigrain_rollup"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan
    assert "Expand" in plan
    assert "partial_count" in plan  # map-side combine for both grains


def test_r5_new_query_plan_shapes(spark, sf_dir):
    """The r5 additions must keep their scale-shaped plans:

    - text_length_outliers: the per-lang bounds frame BROADCASTS back
      onto the corpus (no SortMergeJoin — at 100 TB the bounds side is
      KB-sized) and the scan prunes to the three needed columns.
    - cdc_apply_changelog: the tombstone materialization partial-
      aggregates map-side (partial_max_by) — one candidate per key per
      partition crosses the shuffle, never the raw changelog.
    - text_source_cap: the rank-limit pushes down (WindowGroupLimit
      Partial) so only the per-source top-k rows enter the exchange,
      not the whole corpus.
    """
    import __spark_entry__ as entry

    qs = entry.queries()

    plan = qs["text_length_outliers"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>" in plan, plan

    plan = qs["cdc_apply_changelog"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan, plan
    assert "Window" not in plan, plan

    plan = qs["text_source_cap"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


def test_r5_continuation_plan_shapes(spark, sf_dir):
    """Late-r5 additions keep their scale shapes:

    - dedup_winnow_fingerprints: the k-gram md5 chain is materialized
      through a Generate barrier, NOT inlined into the window-min
      lambda — md5 appears a bounded number of times in the plan (the
      k-fold recompute would splatter it).
    - join_bloom_prefilter: the Bloom probe filters the fact BELOW the
      exact join (xxhash64 probe in a Filter; the dim's filter rides a
      BroadcastExchange), and no BNL/cartesian anywhere.
    - join_interval_overlap: equi-join on the bin id, no BNL.
    """
    import __spark_entry__ as entry

    qs = entry.queries()

    plan = qs["dedup_winnow_fingerprints"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("md5") <= 4, plan.count("md5")
    assert "Generate explode" in plan, plan

    plan = qs["join_bloom_prefilter"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan, plan
    assert "BroadcastExchange" in plan, plan
    # the 1-row Bloom bitmap rides a broadcast nested loop BY DESIGN
    # (constant-frame pattern); the KEY join itself must be a hash join
    # and nothing may degenerate to a cartesian product
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan

    plan = qs["join_interval_overlap"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_pipeline_training_data_single_exchange_at_fixture_scale(spark, sf_dir):
    """VERDICT r5 task 2: at footer-stat fixture scale the composite
    pipeline plans exactly TWO exchanges — the scan-parallelism
    fan-out (regex work above it) and the fingerprint dedup shuffle.
    The per-language rollup's clustering requirement is satisfied by
    the coalesce(1) SinglePartition, so ITS exchange vanishes; no
    broadcast/cartesian anywhere."""
    df = entrymod.queries()["pipeline_training_data"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # npart=1 renders as "Exchange SinglePartition", larger counts as
    # "Exchange hashpartitioning" — count every exchange either way
    n_exchanges = len(re.findall(r"\bExchange ", plan))
    assert n_exchanges == 2, plan
    assert "hashpartitioning(lang" not in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_lsh_candidates_single_exchange_at_fixture_scale(spark, sf_dir):
    """VERDICT r5 task 4: below the footer-stat gate the LSH candidate
    plan has exactly ONE data shuffle (the signature aggregate's) plus
    the parallelism round-robin — banding groupBy and pair distinct
    ride the SinglePartition output; md5 stays on the parallel map
    side (the serial variant was measured 5x worse and must not come
    back)."""
    df = entrymod.queries()["dedup_lsh_candidates"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly two exchanges, both on doc_id BELOW the signature
    # aggregate: the scan-parallelism fan-out and the narrow agg
    # shuffle; banding groupBy (band/bucket keys) and pair distinct
    # (id_a/id_b keys) must have none
    exchanges = re.findall(r"Exchange \S+[^\n]*", plan)
    assert len(exchanges) == 2, plan
    assert not re.search(r"Exchange hashpartitioning\((?:band|bucket|id_a)", plan), plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_q5_dim_chain_local_relation_at_fixture_scale(spark, sf_dir):
    """r7 (VERDICT r6 task 2b): below the footer gate the
    supplier⋈nation⋈region chain enters q5's plan as a LocalRelation
    (driver-held, broadcast without scan jobs); both _supplier_chain
    paths must produce the identical relation."""
    df = entrymod.queries()["q5_region_revenue"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan, plan
    # and no supplier/nation/region parquet scan feeds the plan now
    assert "supplier.parquet" not in plan, plan

    local = entrymod._supplier_chain(spark, sf_dir, region="ASIA")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    spark_side = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    assert sorted(map(tuple, local.collect())) == sorted(map(tuple, spark_side.collect()))
    # no-region path (q7/q8/q9's frame): pure supplier⋈nation — region
    # must NOT participate (review catch r7)
    local_nr = entrymod._supplier_chain(spark, sf_dir)
    sn = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    assert sorted(map(tuple, local_nr.collect())) == sorted(map(tuple, sn.collect()))


def test_narrow_shuffle_gates_on_row_count(spark, sf_dir):
    """r7: the generalized footer-stat narrowing must size the
    exchange from the row count under the gate and be a strict NO-OP
    at scale-sized counts (the conf-sized plan untouched)."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.plans.partitioning import (
        narrow_shuffle,
    )

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    narrowed = narrow_shuffle(o, 150_000, "o_custkey")
    if spark.sparkContext.defaultParallelism > 3:
        assert narrowed.rdd.getNumPartitions() == 3  # ceil(150k/50k)
    else:
        # on a <=3-core runner the helper correctly no-ops (target >=
        # parallelism) — the gate, not the width, is what's under test
        # (ADVICE r7: the exact-width assert was environment-dependent)
        assert narrowed is o
    big = narrow_shuffle(o, 10_000_000_000, "o_custkey")
    assert big is o  # scale path: identical plan object, no exchange
    # and the headline window rides it: its exchange is data-sized
    # (execute first — under AQE the unexecuted plan prints only the
    # AdaptiveSparkPlan header)
    w = entrymod.queries()["window_rank_orders_per_customer"](spark, sf_dir)
    w.count()
    plan = w._jdf.queryExecution().executedPlan().toString()
    # a 1-wide repartition renders as SinglePartition, wider as
    # hashpartitioning(o_custkey, k) — either way k must be data-sized
    m = re.search(
        r"Exchange (SinglePartition|hashpartitioning\(o_custkey#\d+L?, (\d+)\))", plan
    )
    assert m, plan
    if m.group(2) is not None:
        assert int(m.group(2)) <= 3, plan


def test_join_outer_aggregates_below_join(spark, sf_dir):
    """r8: join_outer_customer_orders pushes the aggregate BELOW the
    left join — orders collapses per custkey first (partial+final on
    o_custkey), the join probes aggregated rows, and NO aggregate runs
    above the join. A regression to the agg-above-join shape re-ships
    every order row through the join and re-aggregates post-join."""
    df = entrymod.queries()["join_outer_customer_orders"](spark, sf_dir)
    plan = explain_str(df)
    aggs = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
    assert aggs, plan
    # every aggregate keys on the orders side, none on c_custkey
    assert all("o_custkey" in ln for ln in aggs if "keys=" in ln), plan
    assert not any("keys=[c_custkey" in ln for ln in aggs), plan
    # partial+final combine on the pre-aggregation
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_q19_derived_filters_reach_both_scans(spark, sf_dir):
    """r11/r12: Q19's single-table derivations must land where they
    pay — the derived lineitem quantity range PUSHED into the fact
    scan (60M rows at sf10), and the r12 part-side bitmask
    pre-classification (each part evaluates its three conjunct
    classes once; only pmask>0 parts enter the broadcast hash table)
    sitting as the Filter directly on the part scan, replacing the
    old brand/type weakening. The residual join predicate is the
    int bit-tests, and the join is a broadcast at fixture scale."""
    df = entrymod.queries()["q19_disjunctive_predicates"](spark, sf_dir)
    plan = explain_str(df)
    # formatted mode: each scan = a block with Location + PushedFilters
    blocks = re.split(r"\n\s*\n", plan)
    li = next(b for b in blocks if "lineitem.parquet" in b)
    assert (
        "Or(And(GreaterThanOrEqual(l_quantity,1.0),"
        "LessThanOrEqual(l_quantity,40.0)),"
        "GreaterThanOrEqual(l_quantity,45.0))" in li
    ), li
    # the class-mask filter evaluates ON the part side (build), so the
    # string/size comparisons appear exactly once, below the join
    mask_filters = [
        b for b in blocks
        if b.lstrip().startswith(("(4) Filter", "(3) Filter", "(2) Filter"))
        and "Brand#1" in b and "p_size" in b and "ECONOMY" in b
    ]
    assert len(mask_filters) == 1, blocks
    # and the probe-side residual predicate is bit-tests, not strings
    post_join = next(b for b in blocks if "BroadcastHashJoin" in b)
    assert "Brand#1" not in post_join, post_join
    assert "& 1" in plan or "and(pmask" in plan.lower() or "pmask" in plan
    assert "BroadcastHashJoin" in plan
