#!/usr/bin/env python
"""Interleaved Spark-vs-DuckDB A/B over the bench headline set.

Host wall timings drift 25-40% with hypervisor load, so only
same-window ratios are meaningful (PERFORMANCE.md). This runner
alternates Spark and DuckDB executions per query within one window:
for each query it runs [spark, duck, spark, duck, spark, duck] and
records each engine's min, then prints per-query and total ratios.

Usage: python tools/ab.py [query ...]   (default: bench HEADLINE set)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark import get_spark  # noqa: E402
from tests.oracle_harness import duck_con  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or list(HEADLINE)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    input_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(sf_dir)
        for f in fs
    )
    small = input_bytes < 1 << 30
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "ab",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus if small else "64")),
        adaptive=not small,
    )
    con = duck_con(sf_dir)

    # same warm-up as bench.py
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import (
        TABLES,
        load_table,
    )

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    _o = load_table(spark, sf_dir, "orders")
    _c = load_table(spark, sf_dir, "customer")
    (
        _o.join(_F.broadcast(_c), _o.o_custkey == _c.c_custkey)
        .withColumn("_r", _F.row_number().over(_W.partitionBy("o_custkey").orderBy("o_orderkey")))
        .groupBy("o_orderstatus")
        .agg(_F.sum("o_totalprice"))
        .count()
    )

    rows = []
    for name in names:
        fn = queries[name]
        sql = oracles.get(name)
        s_best = d_best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            s_best = min(s_best, time.perf_counter() - t0)
            if sql is not None:
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                d_best = min(d_best, time.perf_counter() - t0)
        rows.append((name, s_best, d_best if sql else float("nan")))
        ratio = s_best / d_best if sql else float("nan")
        print(f"{name:40s} spark {s_best:7.3f}  duck {d_best:7.3f}  ratio {ratio:6.2f}x",
              flush=True)

    s_tot = sum(r[1] for r in rows)
    d_tot = sum(r[2] for r in rows if r[2] == r[2])
    try:
        load = round(os.getloadavg()[0], 2)
    except OSError:
        load = None
    print(json.dumps({
        "spark_total": round(s_tot, 3),
        "duck_total": round(d_tot, 3),
        "ratio": round(s_tot / d_tot, 3) if d_tot else None,
        "n_queries": len(rows),
        "load_avg_1m": load,
    }))


if __name__ == "__main__":
    main()
