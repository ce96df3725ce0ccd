#!/usr/bin/env python
"""Stage decomposition for mm_binary_features (VERDICT r12 task 5:
7.7x at sf10 is the worst non-vector ratio, but had no table naming
where the milliseconds go).

Stages, each forced by an aggregate that cannot be pruned below it:

  scan_encode   parquet scan + UTF-8 encode of the payload column
                (sum of payload lengths — JVM only, no Python)
  plus_sha      + the JVM-side sha2(payload, 256)
                (sum of hash string lengths)
  noop_kernel   + mapInPandas dispatch + Arrow IPC of the payload
                bytes to Python and the derived columns back, with
                the decode loop REPLACED by constant columns — the
                pure plumbing cost of the Python hop
  full          the registry query (decode stub runs per row)
  duck          the DuckDB oracle, same projection

full - noop_kernel  = the per-row Python decode loop
noop_kernel - plus_sha = Arrow IPC + worker dispatch (the contractual
cost of shipping payload bytes to a real Pillow/ffmpeg kernel)
plus_sha - scan_encode = JVM hashing

Also A/Bs spark.sql.execution.arrow.maxRecordsPerBatch over the
payload column (binary rows are ~KB-scale, so the 10k default makes
~10-50 MB Arrow batches; smaller batches trade IPC overhead for
pipelining).

Interleaved min-of-N (default 3); one JSON line to stdout.

Usage: SPARK_GRAFT_SF_DIR=fixtures/sf10 python tools/mm_decomp.py [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from pyspark.sql import functions as F  # noqa: E402

from bench import sized_session, warm_up  # noqa: E402
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import (  # noqa: E402
    multimodal,
)
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.tables import (  # noqa: E402
    load_table,
)


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(REPO, "fixtures", "sf10"))
    spark = sized_session(sf_dir, app_name="mm-decomp")
    warm_up(spark, sf_dir)

    import __spark_entry__ as entrymod
    from oracle_harness import duck_con

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = multimodal.attach_binary(d, "text")
    pre = media.select(
        "id",
        "media_type",
        "payload",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )

    def scan_encode():
        return media.select(F.sum(F.length("payload"))).collect()

    def plus_sha():
        return pre.select(F.sum(F.length("sha256")), F.sum("n_bytes")).collect()

    def noop_kernel():
        import pandas as pd

        def batches(it):
            for pdf in it:
                yield pd.DataFrame(
                    {
                        "id": pdf["id"],
                        "media_type": pdf["media_type"],
                        "n_bytes": pdf["n_bytes"],
                        "sha256": pdf["sha256"],
                        "width": 1,
                        "height": 1,
                    }
                )

        return (
            pre.mapInPandas(batches, schema=multimodal.FEATURE_SCHEMA)
            .select(F.sum("n_bytes"), F.sum(F.length("sha256")), F.sum("width"))
            .collect()
        )

    def full():
        return (
            entrymod.mm_binary_features(spark, sf_dir)
            .select(F.sum("n_bytes"), F.sum(F.length("sha")), F.sum("width"))
            .collect()
        )

    def full_arrow():
        return (
            multimodal.extract_features_arrow(media)
            .select(F.sum("n_bytes"), F.sum(F.length("sha256")), F.sum("width"))
            .collect()
        )

    arms = {
        "scan_encode": scan_encode,
        "plus_sha": plus_sha,
        "noop_kernel": noop_kernel,
        "full": full,
        "full_arrow": full_arrow,
    }
    for fn in arms.values():
        fn()  # untimed warm exec
    best = {a: float("inf") for a in arms}
    for _ in range(iters):
        for a, fn in arms.items():
            t0 = time.time()
            fn()
            best[a] = min(best[a], time.time() - t0)

    con = duck_con(sf_dir)
    dsql = (
        "SELECT sum(CAST(octet_length(encode(text)) AS BIGINT)), "
        "sum(length(sha256(text))), "
        "sum(octet_length(encode(text)) % 640 + 1) FROM documents"
    )
    con.sql(dsql).fetchall()  # warm
    duck_best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        con.sql(dsql).fetchall()
        duck_best = min(duck_best, time.time() - t0)

    # batch-size A/B on the full query
    batch_ab = {}
    cur = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        for mrpb in ("2000", "10000", "50000"):
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", mrpb)
            full()  # warm under this conf
            b = float("inf")
            for _ in range(iters):
                t0 = time.time()
                full()
                b = min(b, time.time() - t0)
            batch_ab[mrpb] = round(b, 3)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", cur)

    out = {
        "sf_dir": sf_dir,
        "iters": iters,
        "best_sec": {a: round(s, 3) for a, s in best.items()},
        "arrow_over_pandas": round(best["full_arrow"] / best["full"], 3),
        "decode_loop_s": round(best["full"] - best["noop_kernel"], 3),
        "arrow_ipc_dispatch_s": round(best["noop_kernel"] - best["plus_sha"], 3),
        "jvm_sha_s": round(best["plus_sha"] - best["scan_encode"], 3),
        "duck_best_s": round(duck_best, 3),
        "full_over_duck": round(best["full"] / duck_best, 3),
        "batch_ab_full_s": batch_ab,
        "load_avg_1m": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
