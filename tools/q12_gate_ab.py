#!/usr/bin/env python
"""q12 auto-layout gate payoff at scale: the SAME registry dataflow
with layout='auto' (co-bucketed facts picked up from the warehouse)
vs layout='plain', interleaved min-of-N in one session — the measured
answer to "what did flipping q12 to the gate actually buy".

The o⋈li join keys on the bucket key but the final aggregate
(l_returnflag, 3 rows) does not, so unlike q18 only the JOIN exchange
is deleted — this measures the gate's payoff on the common
join-on-key/aggregate-elsewhere shape.

Usage: SPARK_GRAFT_SF_DIR=fixtures/sf10 python tools/q12_gate_ab.py [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench import sized_session, warm_up  # noqa: E402
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.tables import (  # noqa: E402
    load_fact,
)


def q12_frame(spark, sf_dir, layout):
    o = load_fact(spark, sf_dir, "orders", layout=layout).select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_fact(spark, sf_dir, "lineitem", layout=layout).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(REPO, "fixtures", "sf10"))
    spark = sized_session(sf_dir, app_name="q12-gate-ab")
    warm_up(spark, sf_dir)

    import __spark_entry__ as entrymod

    # ensure the layout exists (ingest-once; warehouse reuse makes
    # this ~free after the first ever run at this sf)
    entrymod._bucketed_fact(spark, sf_dir, "orders", "o_orderkey")
    entrymod._bucketed_fact(spark, sf_dir, "lineitem", "l_orderkey")

    auto = q12_frame(spark, sf_dir, "auto")
    plain = q12_frame(spark, sf_dir, "plain")
    a_rows = sorted(map(tuple, auto.collect()))
    p_rows = sorted(map(tuple, plain.collect()))
    assert a_rows == p_rows, "layout changed values!"
    plan = auto._jdf.queryExecution().executedPlan().toString()
    gate_active = "Bucketed: true" in plan or "bktfact" in plan

    # rebuild the frame per timed run: re-executing the SAME DataFrame
    # object reuses AQE's already-materialized query stages (measured
    # 6.1 s -> 0.07 s on the identical object), which is plan-cache
    # reuse, not query speed
    best = {"auto": float("inf"), "plain": float("inf")}
    for name in best:
        q12_frame(spark, sf_dir, name).toArrow()  # warm
    for _ in range(iters):
        for name in best:
            df = q12_frame(spark, sf_dir, name)
            t0 = time.time()
            df.toArrow()
            best[name] = min(best[name], time.time() - t0)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "iters": iters,
                "gate_active": gate_active,
                "auto_s": round(best["auto"], 3),
                "plain_s": round(best["plain"], 3),
                "auto_over_plain": round(best["auto"] / best["plain"], 3),
                "load_avg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
