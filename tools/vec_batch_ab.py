#!/usr/bin/env python
"""Arrow batch-size A/B for the pandas_udf vector kernels at sf10
(VERDICT r9 task 6): the vec family's residual vs DuckDB is Arrow
IPC/dispatch latency, which amortizes with batch size. This sweeps
spark.sql.execution.arrow.maxRecordsPerBatch (a runtime conf — safe
to flip on a live session) interleaved round-robin so host-load
drift hits every arm equally; min-of-N per arm per query.

Usage: SPARK_GRAFT_SF_DIR=fixtures/sf10 python tools/vec_batch_ab.py [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import sized_session, warm_up  # noqa: E402

QUERIES = ["vec_knn_bruteforce", "vec_lsh_bucket_histogram", "mm_binary_features"]
BATCH_SIZES = [65536, 131072, 262144, 524288, 1048576]


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/fixtures/sf10")
    spark = sized_session(sf_dir, app_name="vec-batch-ab")
    warm_up(spark, sf_dir)
    qs = entrymod.queries()
    best: dict[str, dict[int, float]] = {q: {b: float("inf") for b in BATCH_SIZES} for q in QUERIES}
    # one untimed warm execution per query at the default size
    for q in QUERIES:
        qs[q](spark, sf_dir).toArrow()
    for _ in range(iters):
        for b in BATCH_SIZES:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(b))
            for q in QUERIES:
                t = time.perf_counter()
                qs[q](spark, sf_dir).toArrow()
                best[q][b] = min(best[q][b], time.perf_counter() - t)
    # Second dimension: the scan split size. sized_session's
    # maxPartitionBytes policy (~3 splits/core of TOTAL input) is tuned
    # for the lineitem joins but fragments the embeddings file into
    # ~15k-row tasks, capping every Arrow batch well below
    # maxRecordsPerBatch — the batch-size knob can't act until splits
    # are coarse enough to feed it.
    mpb0 = spark.conf.get("spark.sql.files.maxPartitionBytes")
    mpb_best: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for mpb_mib in [int(mpb0) >> 20 or 1, 32, 64, 128]:
        key = f"{mpb_mib}MiB"
        if key in mpb_best[QUERIES[0]]:
            continue
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb_mib << 20))
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1048576")
        for q in QUERIES:
            qs[q](spark, sf_dir).toArrow()  # re-plan under new split size
            b = float("inf")
            for _ in range(iters):
                t = time.perf_counter()
                qs[q](spark, sf_dir).toArrow()
                b = min(b, time.perf_counter() - t)
            mpb_best[q][key] = round(b, 3)
    spark.conf.set("spark.sql.files.maxPartitionBytes", mpb0)
    out = {
        "sf_dir": sf_dir,
        "iters": iters,
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "best_sec": {q: {str(b): round(s, 3) for b, s in d.items()} for q, d in best.items()},
        "winner": {
            q: min(d, key=d.get) for q, d in best.items()
        },
        "mpb_sweep_at_1M_batch": mpb_best,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
