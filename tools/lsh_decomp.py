#!/usr/bin/env python
"""Stage decomposition + shape A/B for vec_lsh_bucket_histogram
(VERDICT r13 task 3: 9.97x at sf10 is the worst remaining flag and —
unlike mm_binary_features — had no table naming where its milliseconds
go).

Stages, each forced by an aggregate that cannot be pruned below it:

  scan_vec      parquet scan + array<float> materialization
                (sum of element counts — JVM only, no Python)
  noop_arrow    + pandas_udf dispatch + Arrow IPC of the vectors to
                Python, kernel body replaced by a constant — the pure
                plumbing cost of the Python hop
  stack_only    + the Series-of-lists -> float64 ndarray conversion
                (_stack) — the per-batch marshalling numpy needs
  kernel        + the 13 plane dots + sign-fold (the registry kernel)
  full          the registry query (kernel + bucket histogram agg)
  duck          the DuckDB oracle, same result

Shape A/B (same session, interleaved min-of-N):

  perplane      landed r9 kernel: _fold_dot per plane — 13 transposed
                batch COPIES + 13x64 vectorized adds
  fused         ONE transpose + one 64-iteration loop over dims with an
                (n x 13) accumulator — per-plane addition order is
                IDENTICAL (bit-exact by construction), numpy pass count
                drops 13x
  explode13     the VERDICT-suggested JVM form: posexplode + ONE
                hash-agg producing a 13-slot array of partial sums
                (one shuffle row per vector), signs/bucket from the
                array, then the histogram — no Python worker at all
  batch A/B     maxRecordsPerBatch {2k, 10k, 131072} on the winner

Bit-exactness gate: before timing, fused and explode13 bucket ids are
asserted EQUAL to the per-plane kernel's on the full corpus (a
disagreement would need a plane dot within float64 summation-order
noise of exactly zero — and would break the shared DuckDB oracle).

Usage: SPARK_GRAFT_SF_DIR=fixtures/sf10 python tools/lsh_decomp.py [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402

from bench import sized_session, warm_up  # noqa: E402
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.functions import (  # noqa: E402
    vector as vfn,
)
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import (  # noqa: E402
    vectors as vec_ops,
)
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.tables import (  # noqa: E402
    load_table,
)

DIM = 64


def perplane_kernel(planes):
    """The landed r9 kernel shape, inlined: _fold_dot per plane."""
    P = np.asarray(planes, dtype=np.float64)
    W = (1 << np.arange(P.shape[0])).astype(np.int64)

    @pandas_udf("int")
    def _bucket(v):
        import numpy as np

        mat, mask = vfn._stack(v)
        signs = np.stack(
            [vfn._fold_dot(mat, P[i]) >= 0 for i in range(P.shape[0])], axis=1
        )
        b = (signs @ W).astype(np.float64)
        out = vfn._masked_series(b, mask)
        return out.astype("Int32" if mask.any() else "int32")

    return _bucket


def fused_kernel(planes):
    """One transpose + one dim-loop, (n x k) accumulator. Column b's
    additions happen in the same j order as _fold_dot(mat, P[b]) —
    bit-identical signs."""
    P = np.asarray(planes, dtype=np.float64)
    W = (1 << np.arange(P.shape[0])).astype(np.int64)
    PT = np.ascontiguousarray(P.T)  # (dim, k)

    @pandas_udf("int")
    def _bucket(v):
        import numpy as np

        mat, mask = vfn._stack(v)
        matT = np.ascontiguousarray(mat.T)  # ONE copy, not 13
        acc = np.zeros((mat.shape[0], P.shape[0]), dtype=np.float64)
        for j in range(matT.shape[0]):
            acc += matT[j][:, None] * PT[j][None, :]
        b = ((acc >= 0) @ W).astype(np.float64)
        out = vfn._masked_series(b, mask)
        return out.astype("Int32" if mask.any() else "int32")

    return _bucket


def arrow_map_kernel(e, planes):
    """mapInArrow shape (the mm_binary_features r13 win): read the
    list array's VALUES BUFFER zero-copy as float32, reshape, upcast
    to float64 (same upcast _stack does per row), fused fold — no
    pandas, no per-row objects. Fold order per plane unchanged."""
    import pyarrow as pa

    P = np.asarray(planes, dtype=np.float64)
    W = (1 << np.arange(P.shape[0])).astype(np.int64)
    PT = np.ascontiguousarray(P.T)

    def batches(it):
        import numpy as np

        for rb in it:
            emb = rb.column(rb.schema.get_field_index("embedding"))
            flat = emb.flatten().to_numpy(zero_copy_only=False)
            mat = flat.reshape(len(emb), DIM).astype(np.float64)
            matT = np.ascontiguousarray(mat.T)
            acc = np.zeros((mat.shape[0], P.shape[0]), dtype=np.float64)
            for j in range(matT.shape[0]):
                acc += matT[j][:, None] * PT[j][None, :]
            b = ((acc >= 0) @ W).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [rb.column(rb.schema.get_field_index("vec_id")), pa.array(b, pa.int32())],
                names=["vec_id", "bucket"],
            )

    return e.mapInArrow(batches, "vec_id long, bucket int")


def explode13_bucket(e, planes):
    """VERDICT-suggested JVM shape: posexplode the vector, ONE hash-agg
    whose 13 partial sums ride a single shuffle row per vector as an
    array, bucket derived from the array. Fold order inside each SUM is
    pos order within partition (exploded rows stay in generation
    order), matching the HOF/oracle sequential fold."""
    k = len(planes)
    plane_lits = [
        "array(" + ",".join(f"{float(x)!r}D" for x in p) + ")" for p in planes
    ]
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    )
    sums = ex.groupBy("vec_id").agg(
        F.array(
            *[
                F.sum(
                    F.col("val").cast("double")
                    * F.expr(f"element_at({plane_lits[b]}, pos + 1)")
                )
                for b in range(k)
            ]
        ).alias("dots")
    )
    bucket = sums.select(
        "vec_id",
        F.expr(
            "CAST("
            + " + ".join(f"(CASE WHEN dots[{b}] >= 0 THEN {1 << b} ELSE 0 END)" for b in range(k))
            + " AS INT)"
        ).alias("bucket"),
    )
    return bucket


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(REPO, "fixtures", "sf10"))
    spark = sized_session(sf_dir, app_name="lsh-decomp")
    warm_up(spark, sf_dir)

    import pyarrow.parquet as pq

    from oracle_harness import duck_con

    n_rows = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    n_planes = vec_ops.planes_for_corpus(n_rows)
    planes = [vec_ops._hyperplane(DIM, p) for p in range(n_planes)]
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # ---- bit-exactness gates (once, full corpus) ----
    base = (
        e.withColumn("bucket", perplane_kernel(planes)(F.col("embedding")))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    )
    base_rows = {r["bucket"]: r["n"] for r in base.collect()}
    fused = (
        e.withColumn("bucket", fused_kernel(planes)(F.col("embedding")))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    )
    fused_rows = {r["bucket"]: r["n"] for r in fused.collect()}
    assert fused_rows == base_rows, "fused kernel bucket drift"
    exploded = explode13_bucket(e, planes).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    exploded_rows = {r["bucket"]: r["n"] for r in exploded.collect()}
    assert exploded_rows == base_rows, "explode13 bucket drift"
    am = arrow_map_kernel(e, planes).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    am_rows = {r["bucket"]: r["n"] for r in am.collect()}
    assert am_rows == base_rows, "arrow-map kernel bucket drift"
    print(f"bit-exact gates OK: {len(base_rows)} buckets, n_planes={n_planes}", file=sys.stderr)

    # ---- stage decomposition ----
    noop = pandas_udf(lambda v: __import__("pandas").Series([1] * len(v), dtype="int32"), "int")

    @pandas_udf("int")
    def stack_noop(v):
        mat, mask = vfn._stack(v)
        import pandas as pd

        return pd.Series(np.full(mat.shape[0], 1, dtype=np.int32))

    def scan_vec():
        return e.select(F.sum(F.size("embedding"))).collect()

    def noop_arrow():
        return e.withColumn("b", noop(F.col("embedding"))).select(F.sum("b")).collect()

    def stack_only():
        return e.withColumn("b", stack_noop(F.col("embedding"))).select(F.sum("b")).collect()

    def kernel_only():
        return (
            e.withColumn("bucket", perplane_kernel(planes)(F.col("embedding")))
            .select(F.sum("bucket")).collect()
        )

    def full():
        df = (
            e.withColumn("bucket", perplane_kernel(planes)(F.col("embedding")))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
        )
        return df.toArrow()

    def full_fused():
        df = (
            e.withColumn("bucket", fused_kernel(planes)(F.col("embedding")))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
        )
        return df.toArrow()

    def full_explode():
        df = explode13_bucket(e, planes).groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n")
        )
        return df.toArrow()

    def full_arrow_map():
        df = arrow_map_kernel(e, planes).groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n")
        )
        return df.toArrow()

    arms = {
        "scan_vec": scan_vec,
        "noop_arrow": noop_arrow,
        "stack_only": stack_only,
        "kernel_only": kernel_only,
        "full": full,
        "full_fused": full_fused,
        "full_explode": full_explode,
        "full_arrow_map": full_arrow_map,
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
    import __spark_entry__ as entrymod

    dsql = entrymod.oracle_sql()["vec_lsh_bucket_histogram"]
    con.sql(dsql).arrow()  # warm
    duck_best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        con.sql(dsql).arrow()
        duck_best = min(duck_best, time.time() - t0)

    # batch-size A/B on the best python kernel
    winner = min(
        (full, best["full"]),
        (full_fused, best["full_fused"]),
        (full_arrow_map, best["full_arrow_map"]),
        key=lambda t: t[1],
    )[0]
    batch_ab = {}
    cur = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        for mrpb in ("2000", "10000", "131072"):
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", mrpb)
            winner()
            b = float("inf")
            for _ in range(iters):
                t0 = time.time()
                winner()
                b = min(b, time.time() - t0)
            batch_ab[mrpb] = round(b, 3)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", cur)

    out = {
        "sf_dir": sf_dir,
        "iters": iters,
        "n_rows": n_rows,
        "n_planes": n_planes,
        "best_sec": {a: round(s, 3) for a, s in best.items()},
        "histogram_agg_s": round(best["full"] - best["kernel_only"], 3),
        "plane_dots_s": round(best["kernel_only"] - best["stack_only"], 3),
        "ndarray_stack_s": round(best["stack_only"] - best["noop_arrow"], 3),
        "arrow_ipc_dispatch_s": round(best["noop_arrow"] - best["scan_vec"], 3),
        "scan_s": round(best["scan_vec"], 3),
        "fused_over_perplane": round(best["full_fused"] / best["full"], 3),
        "explode_over_perplane": round(best["full_explode"] / best["full"], 3),
        "arrow_map_over_perplane": round(best["full_arrow_map"] / best["full"], 3),
        "duck_best_s": round(duck_best, 3),
        "full_over_duck": round(best["full"] / duck_best, 3),
        "batch_ab_winner_s": batch_ab,
        "load_avg_1m": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
