#!/usr/bin/env python
"""Per-query Arrow maxRecordsPerBatch A/B across the Python-hop family
(VERDICT r14 task 3 — land or close the r14 side-find that 2000 read
stably faster for vec_lsh_bucket_histogram).

``spark.sql.execution.arrow.maxRecordsPerBatch`` is a runtime conf read
by the Arrow serializer at execution, so it can vary per query within
one session. This interleaves settings round-robin (host drift spreads
across settings, same discipline as mpb_sweep/ab) and reports min-of-N
per (query, setting), plus the ratio of each setting vs the session
default the bench currently lands (131072).

Usage: python tools/mrb_sweep.py [query ...] [--mrb 2000,10000,131072]
           [--iters 3]
Env:   SPARK_GRAFT_SF_DIR (default fixtures/sf10 — the scale where the
       r14 side-find lives)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import sized_session, warm_up  # noqa: E402

#: The Python-hop (Arrow-serialized) registry family at the bench's
#: default sf: every query whose plan crosses pandas_udf / mapInPandas
#: / mapInArrow. vec_knn_bruteforce / vec_ann_topk are JVM-side at
#: scale (explode kernel) and excluded on purpose.
DEFAULT_FAMILY = [
    "vec_lsh_bucket_histogram",
    "mm_binary_features",
    "mm_resize_plan",
    "mm_frame_sample",
    "embed_documents",
    "vec_knn_arrow_kernel",
    "vec_lsh_arrow_kernel",
]


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", os.path.join(here, "fixtures", "sf10")
    )
    args = sys.argv[1:]
    mrbs = [2000, 10000, 131072]
    iters = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--mrb":
            mrbs = [int(x) for x in args[i + 1].split(",")]
            i += 2
        elif args[i] == "--iters":
            iters = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = list(DEFAULT_FAMILY)
    queries = entrymod.queries()
    spark = sized_session(sf_dir, app_name="mrb_sweep")
    warm_up(spark, sf_dir)
    base = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    results = {n: {m: float("inf") for m in mrbs} for n in names}
    for _round in range(iters):
        for name in names:
            for m in mrbs:
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", str(m)
                )
                if _round == 0:
                    # warm codegen/worker for this (plan, batch) combo
                    # on a FRESH DataFrame (never re-time the same
                    # object: shuffle-map reuse skips stages)
                    queries[name](spark, sf_dir).toArrow()
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).toArrow()
                dt = time.perf_counter() - t0
                results[name][m] = min(results[name][m], dt)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", base)
    print(
        f"base mrb {base}  sf_dir {sf_dir}  load {os.getloadavg()[0]:.1f}"
    )
    table = {}
    for name in names:
        r = results[name]
        ref = r.get(131072) or min(r.values())
        row = "  ".join(f"{m}:{t:.3f}" for m, t in r.items())
        best = min(r, key=r.get)
        gain = 1 - r[best] / ref if ref else 0.0
        table[name] = {
            "times": {str(m): round(t, 3) for m, t in r.items()},
            "best": best,
            "gain_vs_131072": round(gain, 3),
        }
        print(f"{name:28s} {row}  best={best} ({gain:+.1%} vs 131072)")
    print(json.dumps({"sf_dir": sf_dir, "mrb": table}))


if __name__ == "__main__":
    main()
