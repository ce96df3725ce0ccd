#!/usr/bin/env python
"""A/B: the repeated CDC snapshot-cycle workload with vs without
bucketed snapshot storage (VERDICT r9 task 5).

Models the reference's poll loop (controller.py:35 + service.py:52-57:
every cycle re-reads the current snapshot and re-matches it by key):
each cycle persists the new snapshot, then runs the per-cycle keyed
work against the previous one — change-feed generation
(snapshot_diff's full outer join) plus a keyed rollup. Arm "bucketed"
persists snapshots via persist_snapshot_bucketed (catalog tables,
hash-bucketed+sorted on the key: downstream joins/aggs are
zero-Exchange); arm "plain" persists plain parquet (every downstream
key op pays its shuffle).

Both arms pay a snapshot write per cycle — the bucketed arm moves the
partitioning cost INTO that write; the question measured here is
whether one write-side shuffle beats the per-cycle join+agg shuffles
it removes. Interleaved arms, N cycles each, wall totals printed as
one JSON line.

Usage: SPARK_GRAFT_SF_DIR=fixtures/sf1 python tools/snapshot_cycle_ab.py [cycles]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench import sized_session  # noqa: E402
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.cdc import (  # noqa: E402
    persist_snapshot_bucketed,
    snapshot_diff,
)
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.tables import (  # noqa: E402
    load_table,
)

N_BUCKETS = 32


def _cycle_snapshot(base, i: int):
    """Deterministic per-cycle mutation: a sliding ~5% of keys drop
    (deletes/re-inserts across cycles) and ~14% mutate their price."""
    return (
        base.filter((F.col("o_orderkey") + i) % 19 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == i % 7, F.col("o_totalprice") + i
            ).otherwise(F.col("o_totalprice")),
        )
    )


def run_arm(spark, base, cycles: int, bucketed: bool, db: str) -> dict:
    import shutil
    from urllib.parse import urlparse

    # A KILLED prior run (timeout, ctrl-C) never reaches this
    # function's finally-cleanup, and the in-memory catalog dies with
    # the process — leaving orphan snap_i directories under the db
    # location that the next run's saveAsTable dies on with
    # LOCATION_ALREADY_EXISTS (observed: a timed-out bench poisoned
    # the next bench's snapshot_cycle block). The catalog is fresh
    # per process, so any files at this db's location are stale by
    # construction: drop whatever the catalog knows, then scrub the
    # location itself.
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path or spark.conf.get(
        "spark.sql.warehouse.dir"
    )
    shutil.rmtree(os.path.join(wh, f"{db}.db"), ignore_errors=True)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    tmp_root = f"/tmp/snapcycle_{db}"
    shutil.rmtree(tmp_root, ignore_errors=True)
    persist_s = diff_s = rollup_s = 0.0
    n_changes = 0
    try:
        for i in range(cycles + 1):
            snap = _cycle_snapshot(base, i)
            t = time.time()
            if bucketed:
                persist_snapshot_bucketed(
                    snap, f"{db}.snap_{i}", ["o_orderkey"], N_BUCKETS
                )
                cur = spark.table(f"{db}.snap_{i}")
            else:
                snap.write.mode("overwrite").parquet(f"{tmp_root}/snap_{i}")
                cur = spark.read.parquet(f"{tmp_root}/snap_{i}")
            persist_s += time.time() - t
            if i == 0:
                prev = cur
                continue
            t = time.time()
            d = snapshot_diff(
                prev, cur, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
            )
            n_changes = d.count()
            diff_s += time.time() - t
            t = time.time()
            cur.groupBy("o_orderkey").agg(
                F.sum("o_totalprice").alias("t")
            ).agg(F.count(F.lit(1)), F.sum("t")).collect()
            rollup_s += time.time() - t
            prev = cur
        return {
            "persist_s": round(persist_s, 2),
            "diff_s": round(diff_s, 2),
            "rollup_s": round(rollup_s, 2),
            "total_s": round(persist_s + diff_s + rollup_s, 2),
            "last_cycle_changes": n_changes,
        }
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        import shutil

        shutil.rmtree(tmp_root, ignore_errors=True)


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = sized_session(sf_dir, app_name="snapshot-cycle-ab")
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base.count()  # warm the scan
    out = {"sf_dir": sf_dir, "cycles": cycles, "n_buckets": N_BUCKETS}
    # interleave arms to share host-load conditions
    for rep in range(2):
        out[f"plain_{rep}"] = run_arm(spark, base, cycles, False, f"sc_plain_{rep}")
        out[f"bucketed_{rep}"] = run_arm(spark, base, cycles, True, f"sc_bkt_{rep}")
    best_p = min(out["plain_0"]["total_s"], out["plain_1"]["total_s"])
    best_b = min(out["bucketed_0"]["total_s"], out["bucketed_1"]["total_s"])
    out["bucketed_over_plain"] = round(best_b / best_p, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
