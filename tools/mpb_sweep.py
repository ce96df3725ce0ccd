#!/usr/bin/env python
"""Per-query maxPartitionBytes sweep (dynamic conf, same session).

spark.sql.files.maxPartitionBytes is read at scan planning, so it can
vary per query within one session — this sweeps it for the named
queries and prints wall time per setting, interleaved
round-robin so host drift spreads across settings.

Usage: python tools/mpb_sweep.py q1_pricing_summary [more...] [--mb 1,4,16,64]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import sized_session, warm_up  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "sf1"),
    )
    args = sys.argv[1:]
    mbs = [1, 4, 16, 64]
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--mb":
            mbs = [int(x) for x in args[i + 1].split(",")]
            i += 2
        else:
            names.append(args[i])
            i += 1
    queries = entrymod.queries()
    spark = sized_session(sf_dir, app_name="mpb_sweep")
    warm_up(spark, sf_dir)
    base_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    results = {n: {mb: float("inf") for mb in mbs} for n in names}
    for _round in range(3):
        for name in names:
            for mb in mbs:
                spark.conf.set("spark.sql.files.maxPartitionBytes", str(mb * 1024 * 1024))
                if _round == 0:
                    # warm codegen for this (plan, split) combo — on a
                    # FRESH DataFrame: re-executing the same object
                    # reuses its shuffle map outputs (same RDD
                    # lineage) and skips every pre-shuffle stage,
                    # which is not the quantity the bench measures
                    queries[name](spark, sf_dir).toArrow()
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).toArrow()
                dt = time.perf_counter() - t0
                results[name][mb] = min(results[name][mb], dt)
    spark.conf.set("spark.sql.files.maxPartitionBytes", base_mpb)
    print(f"base mpb {int(base_mpb)//(1024*1024)} MiB  load {os.getloadavg()[0]:.1f}")
    for name in names:
        row = "  ".join(f"{mb}MiB:{t:.3f}" for mb, t in results[name].items())
        print(f"{name:35s} {row}")


if __name__ == "__main__":
    main()
