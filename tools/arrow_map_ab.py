#!/usr/bin/env python
"""mapInArrow vs pandas_udf A/B for the vector kernels AT sf10
(VERDICT r11 task 1). The r10 sf1 A/B rejected mapInArrow (20k rows:
dispatch floor dominates, zero-copy reshape can't show), but at 200k
rows the pandas path's per-row ndarray-object churn is 10x bigger
while dispatch is constant — this window re-runs the comparison where
the conversion cost actually scales, plus identity round-trips for
both mechanisms to decompose conversion vs dispatch.

Arms (interleaved round-robin, min-of-N, same session):
  knn_pandas / knn_map      — full vec_knn query, both kernels
  lsh_pandas / lsh_map      — full lsh histogram query, both kernels
  ident_pandas / ident_map  — ship vectors to Python, return a
                              constant per row: the pure IPC floor
  duck_knn / duck_lsh       — DuckDB denominators, same window

Usage: SPARK_GRAFT_SF_DIR=fixtures/sf10 python tools/arrow_map_ab.py [iters]
Env:   SPARK_GRAFT_ARROW_BATCH (maxRecordsPerBatch for the window)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import sized_session, warm_up  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from tests.oracle_harness import duck_con  # noqa: E402

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.functions.vector import (  # noqa: E402
    cosine_scores_arrow,
    cosine_scores_map_arrow,
    lsh_bucket_arrow,
    lsh_bucket_counts_map_arrow,
)
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import (  # noqa: E402
    vectors as vec_ops,
)
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.tables import (  # noqa: E402
    load_table,
)


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/fixtures/sf10")
    batch = os.environ.get("SPARK_GRAFT_ARROW_BATCH")
    spark = sized_session(sf_dir, app_name="arrow-map-ab")
    if batch:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", batch)
    warm_up(spark, sf_dir)
    con = duck_con(sf_dir)

    e = load_table(spark, sf_dir, "embeddings")
    qvec = entrymod._query_vector(sf_dir)
    n_rows = entrymod._table_rows(sf_dir, "embeddings")
    n_planes = vec_ops.planes_for_corpus(n_rows)
    planes = [vec_ops._hyperplane(64, p) for p in range(n_planes)]
    oracles = entrymod.oracle_sql()

    def knn_pandas():
        return (
            e.select("vec_id", F.round(
                cosine_scores_arrow(F.col("embedding"), qvec), 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col("vec_id")).limit(10).toArrow()
        )

    def knn_map():
        return (
            cosine_scores_map_arrow(e, ["vec_id"], "embedding", qvec)
            .select("vec_id", F.round(F.col("score"), 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col("vec_id")).limit(10).toArrow()
        )

    def lsh_pandas():
        return (
            e.select(lsh_bucket_arrow(F.col("embedding"), planes).alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).toArrow()
        )

    def lsh_map():
        return (
            lsh_bucket_counts_map_arrow(e, "embedding", planes)
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).toArrow()
        )

    def ident_pandas():
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("int")
        def _one(v):
            import pandas as pd

            return pd.Series([1] * len(v), dtype="int32")

        return e.select(_one(F.col("embedding")).alias("x")).groupBy("x").count().toArrow()

    def ident_map():
        def _fn(batches):
            import pyarrow as pa

            for b in batches:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([1] * len(b), type=pa.int32())], names=["x"])

        return (
            e.select("embedding").mapInArrow(_fn, "x int")
            .groupBy("x").count().toArrow()
        )

    def duck_knn():
        return con.execute(oracles["vec_knn_bruteforce"]).arrow()

    def duck_lsh():
        return con.execute(oracles["vec_lsh_bucket_histogram"]).arrow()

    arms = {
        "knn_pandas": knn_pandas, "knn_map": knn_map,
        "lsh_pandas": lsh_pandas, "lsh_map": lsh_map,
        "ident_pandas": ident_pandas, "ident_map": ident_map,
        "duck_knn": duck_knn, "duck_lsh": duck_lsh,
    }

    # result-equality gate between the paired full-query arms
    def _sorted(t, keys):
        import pyarrow.compute as pc

        return t.sort_by([(k, "ascending") for k in keys])

    assert _sorted(knn_pandas(), ["vec_id"]).equals(_sorted(knn_map(), ["vec_id"]))
    assert _sorted(lsh_pandas(), ["bucket"]).equals(_sorted(lsh_map(), ["bucket"]))

    for fn in arms.values():  # untimed warm execution per arm
        fn()
    best = {a: float("inf") for a in arms}
    for _ in range(iters):
        for a, fn in arms.items():
            t = time.perf_counter()
            fn()
            best[a] = min(best[a], time.perf_counter() - t)

    out = {
        "sf_dir": sf_dir,
        "iters": iters,
        "arrow_batch": batch or "default(10000)",
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "n_planes": n_planes,
        "best_sec": {a: round(s, 3) for a, s in best.items()},
        "map_over_pandas": {
            "knn": round(best["knn_map"] / best["knn_pandas"], 3),
            "lsh": round(best["lsh_map"] / best["lsh_pandas"], 3),
            "ident": round(best["ident_map"] / best["ident_pandas"], 3),
        },
        "ratio_vs_duck": {
            "knn_pandas": round(best["knn_pandas"] / best["duck_knn"], 1),
            "knn_map": round(best["knn_map"] / best["duck_knn"], 1),
            "lsh_pandas": round(best["lsh_pandas"] / best["duck_lsh"], 1),
            "lsh_map": round(best["lsh_map"] / best["duck_lsh"], 1),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
