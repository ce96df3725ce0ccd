#!/usr/bin/env python
"""Spark-vs-Spark CORE-CONF A/B over the shuffle-heavy headline subset.

Some knobs (spark.shuffle.compress, spark.local.dir, io codec) are
read once at SparkEnv creation and cannot be flipped on a live
session, so tools/ab.py's within-session interleaving can't measure
them. This runner alternates full SparkContext rebuilds —
[base, variant, base, variant, ...] — and reports per-round subset
totals, so host-load drift hits both arms equally. Each rebuilt
session pays its own warm pass (codegen cache and shuffle writers are
per-SparkEnv) outside the timed region.

Usage: python tools/knob_ab.py KEY=VAL [KEY=VAL ...] [--rounds N]
Env:   SPARK_GRAFT_SF_DIR (default fixtures/sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import scratch_dir, warm_up  # noqa: E402

SUBSET = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_outer_customer_orders",
    "window_rank_orders_per_customer",
    "cdc_snapshot_latest",
    "dedup_exact",
]


def build_session(sf_dir: str, extra: dict[str, str]):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # mirror bench.sized_session's large-regime policy, then overlay
    input_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(sf_dir)
        for f in fs
    )
    width = max(16, min(256, input_bytes // (8 * 1024 * 1024)))
    mpb = min(128 * 1024 * 1024, max(1 << 20, input_bytes // (3 * 32)))
    b = (
        SparkSession.builder.master("local[32]")
        .appName("knob_ab")
        .config("spark.sql.shuffle.partitions", str(width))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.files.maxPartitionBytes", str(mpb))
        .config("spark.sql.autoBroadcastJoinThreshold", str(4 << 20))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", str(32 << 20))
    )
    scratch = scratch_dir(input_bytes)
    if scratch:
        b = b.config("spark.local.dir", scratch)
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()


def run_subset(spark, sf_dir: str) -> dict[str, float]:
    queries = entrymod.queries()
    out = {}
    for name in SUBSET:
        fn = queries[name]
        fn(spark, sf_dir).toArrow()  # warm (codegen for this plan)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toArrow()
            best = min(best, time.perf_counter() - t0)
        out[name] = best
    return out


def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "sf1"),
    )
    rounds = 2
    variant: dict[str, str] = {}
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--rounds":
            rounds = int(args[i + 1])
            i += 2
        else:
            k, v = args[i].split("=", 1)
            variant[k] = v
            i += 1
    if not variant:
        sys.exit("usage: knob_ab.py KEY=VAL [...] [--rounds N]")

    totals = {"base": [], "variant": []}
    detail = {"base": [], "variant": []}
    for r in range(rounds):
        for label, extra in (("base", {}), ("variant", variant)):
            spark = build_session(sf_dir, extra)
            warm_up(spark, sf_dir)
            res = run_subset(spark, sf_dir)
            tot = sum(res.values())
            totals[label].append(tot)
            detail[label].append(res)
            print(f"round {r} {label:8s} total {tot:.3f}  " + " ".join(f"{k.split('_')[0]}:{v:.3f}" for k, v in res.items()), flush=True)
    mb = min(totals["base"])
    mv = min(totals["variant"])
    print(f"\nbase min {mb:.3f}  variant min {mv:.3f}  delta {100*(mv-mb)/mb:+.1f}%  load {os.getloadavg()[0]:.1f}")
    for name in SUBSET:
        b = min(d[name] for d in detail["base"])
        v = min(d[name] for d in detail["variant"])
        print(f"  {name:35s} base {b:.3f}  var {v:.3f}  {100*(v-b)/b:+.1f}%")


if __name__ == "__main__":
    main()
