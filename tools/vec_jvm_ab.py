#!/usr/bin/env python
"""JVM explode-shape vs Arrow-Python kernels for the vector queries.

The r11/r12 A/Bs compared pandas_udf against mapInArrow — both PYTHON
mechanisms — and found a ~0.38 s per-query Python-eval dispatch floor
that neither can avoid. This window tests the third formulation nobody
has measured: keep the whole kernel JVM-side in the explode shape that
wins everywhere else on this engine (minhash, r8/r12 lessons):

    posexplode(embedding) -> val * element_at(<literal array>, pos+1)
    -> hash-agg SUM per vec_id

No lambda is interpreted (the HOF dead end) and no byte crosses the
Python boundary (the Arrow-kernel floor). Bit-exactness argument: a
row's exploded elements stay contiguous in one partition and the
partial hash aggregate folds each group's values in encounter order,
so SUM accumulates in pos order — the identical sequential fold the
HOF/numpy kernels implement ((0+v0)+v1)+... The script GATES on raw
(unrounded) score equality across all arms before timing.

Arms (interleaved, min-of-N, same session):
  knn_pandas / knn_explode   — full cosine top-k, both kernels
  lsh_pandas / lsh_explode   — full bucket histogram, both kernels
  duck_knn / duck_lsh        — DuckDB denominators, same window

Usage: SPARK_GRAFT_SF_DIR=fixtures/sf10 python tools/vec_jvm_ab.py [iters]
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
    cosine_scores_explode,
    lit_double_array,
    lsh_bucket_arrow,
)
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import (  # noqa: E402
    vectors as vec_ops,
)
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.tables import (  # noqa: E402
    load_table,
)


def explode_cosine_scores(e, qvec):
    """vec_id + raw cosine score via the landed JVM explode kernel."""
    return cosine_scores_explode(e, ["vec_id"], "embedding", qvec)


def explode_lsh_buckets(e, planes):
    """vec_id + LSH bucket id via the JVM explode shape: one hash agg
    with one SUM per plane, sign bits assembled after the agg.
    posexplode_outer (mirroring cosine_scores_explode) keeps NULL/empty
    embeddings as rows — a plain posexplode would drop them and the
    equality gate below would die on an Arrow length mismatch instead
    of reporting a clean bit-mismatch."""
    ex = e.select("vec_id", F.posexplode_outer("embedding").alias("pos", "val"))
    v = F.col("val").cast("double")
    sums = [
        F.sum(v * F.element_at(lit_double_array(p), F.col("pos") + 1)).alias(f"d{b}")
        for b, p in enumerate(planes)
    ]
    agg = ex.groupBy("vec_id").agg(*sums)
    bucket = None
    for b in range(len(planes)):
        term = F.when(F.col(f"d{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return agg.select("vec_id", bucket.cast("int").alias("bucket"))


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/fixtures/sf10")
    spark = sized_session(sf_dir, app_name="vec-jvm-ab")
    warm_up(spark, sf_dir)
    con = duck_con(sf_dir)

    e = load_table(spark, sf_dir, "embeddings")
    qvec = entrymod._query_vector(sf_dir)
    n_rows = entrymod._table_rows(sf_dir, "embeddings")
    n_planes = vec_ops.planes_for_corpus(n_rows)
    planes = [vec_ops._hyperplane(64, p) for p in range(n_planes)]
    oracles = entrymod.oracle_sql()

    # ---- bit-exactness gates (raw, unrounded) ----
    import pyarrow.compute as pc

    def _sorted(t, keys):
        return t.sort_by([(k, "ascending") for k in keys])

    pandas_raw = _sorted(
        e.select("vec_id", cosine_scores_arrow(F.col("embedding"), qvec).alias("score"))
        .toArrow(), ["vec_id"])
    explode_raw = _sorted(explode_cosine_scores(e, qvec).toArrow(), ["vec_id"])
    assert pandas_raw.num_rows == explode_raw.num_rows
    eq = pc.all(pc.equal(pandas_raw.column("score"), explode_raw.column("score"))).as_py()
    assert eq, "raw cosine scores are not bit-identical"

    pb = _sorted(
        e.select("vec_id", lsh_bucket_arrow(F.col("embedding"), planes).alias("bucket"))
        .toArrow(), ["vec_id"])
    xb = _sorted(explode_lsh_buckets(e, planes).toArrow(), ["vec_id"])
    assert pb.num_rows == xb.num_rows, (
        f"bucket row counts differ: pandas {pb.num_rows} vs explode {xb.num_rows}")
    assert pc.all(pc.equal(pb.column("bucket"), xb.column("bucket"))).as_py(), (
        "bucket ids differ")
    print("exactness gates: PASS (raw scores and buckets bit-identical)")

    # ---- timed arms ----
    def knn_pandas():
        return (
            e.select("vec_id", F.round(
                cosine_scores_arrow(F.col("embedding"), qvec), 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col("vec_id")).limit(10).toArrow()
        )

    def knn_explode():
        return (
            explode_cosine_scores(e, qvec)
            .select("vec_id", F.round(F.col("score"), 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col("vec_id")).limit(10).toArrow()
        )

    def lsh_pandas():
        return (
            e.select(lsh_bucket_arrow(F.col("embedding"), planes).alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).toArrow()
        )

    def lsh_explode():
        return (
            explode_lsh_buckets(e, planes)
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).toArrow()
        )

    def duck_knn():
        return con.execute(oracles["vec_knn_bruteforce"]).arrow()

    def duck_lsh():
        return con.execute(oracles["vec_lsh_bucket_histogram"]).arrow()

    arms = {
        "knn_pandas": knn_pandas, "knn_explode": knn_explode,
        "lsh_pandas": lsh_pandas, "lsh_explode": lsh_explode,
        "duck_knn": duck_knn, "duck_lsh": duck_lsh,
    }
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
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "n_planes": n_planes,
        "n_rows": n_rows,
        "best_sec": {a: round(s, 3) for a, s in best.items()},
        "explode_over_pandas": {
            "knn": round(best["knn_explode"] / best["knn_pandas"], 3),
            "lsh": round(best["lsh_explode"] / best["lsh_pandas"], 3),
        },
        "ratio_vs_duck": {
            "knn_pandas": round(best["knn_pandas"] / best["duck_knn"], 1),
            "knn_explode": round(best["knn_explode"] / best["duck_knn"], 1),
            "lsh_pandas": round(best["lsh_pandas"] / best["duck_lsh"], 1),
            "lsh_explode": round(best["lsh_explode"] / best["duck_lsh"], 1),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
