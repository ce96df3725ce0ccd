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


class _ArmState:
    """One arm of the snapshot-cycle A/B as a per-cycle STEPPER, so
    the caller can interleave cycle i of both arms under the same
    instantaneous host load (VERDICT r12 task 3: the sequential
    all-of-plain-then-all-of-bucketed protocol let a load spike land
    entirely on one arm — the official r12 artifact recorded the
    ratio at 1.298 while three quiet windows said 0.60-0.70)."""

    def __init__(self, spark, base, bucketed: bool, db: str):
        import shutil
        from urllib.parse import urlparse

        self.spark, self.base, self.bucketed, self.db = spark, base, bucketed, db
        # A KILLED prior run (timeout, ctrl-C) never reaches cleanup,
        # and the in-memory catalog dies with the process — leaving
        # orphan snap_i directories the next run's saveAsTable dies on
        # with LOCATION_ALREADY_EXISTS. The catalog is fresh per
        # process, so any files at this db's location are stale by
        # construction: drop whatever the catalog knows, then scrub
        # the location itself.
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path or spark.conf.get(
            "spark.sql.warehouse.dir"
        )
        shutil.rmtree(os.path.join(wh, f"{db}.db"), ignore_errors=True)
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        self.tmp_root = f"/tmp/snapcycle_{db}"
        shutil.rmtree(self.tmp_root, ignore_errors=True)
        self.prev = None
        self.persist_s = self.diff_s = self.rollup_s = 0.0
        self.cycle_totals: list[float] = []
        self.n_changes = 0

    def cycle(self, i: int) -> None:
        """Run cycle i: persist the mutated snapshot, then (for i>0)
        the keyed per-cycle work (diff + rollup) against cycle i-1."""
        snap = _cycle_snapshot(self.base, i)
        t0 = time.time()
        if self.bucketed:
            persist_snapshot_bucketed(
                snap, f"{self.db}.snap_{i}", ["o_orderkey"], N_BUCKETS
            )
            cur = self.spark.table(f"{self.db}.snap_{i}")
        else:
            snap.write.mode("overwrite").parquet(f"{self.tmp_root}/snap_{i}")
            cur = self.spark.read.parquet(f"{self.tmp_root}/snap_{i}")
        self.persist_s += time.time() - t0
        if i == 0:
            self.prev = cur
            return
        t = time.time()
        d = snapshot_diff(
            self.prev, cur, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
        )
        self.n_changes = d.count()
        self.diff_s += time.time() - t
        t = time.time()
        cur.groupBy("o_orderkey").agg(
            F.sum("o_totalprice").alias("t")
        ).agg(F.count(F.lit(1)), F.sum("t")).collect()
        self.rollup_s += time.time() - t
        self.prev = cur
        self.cycle_totals.append(round(time.time() - t0, 3))

    def result(self) -> dict:
        return {
            "persist_s": round(self.persist_s, 2),
            "diff_s": round(self.diff_s, 2),
            "rollup_s": round(self.rollup_s, 2),
            "total_s": round(self.persist_s + self.diff_s + self.rollup_s, 2),
            "cycle_totals_s": self.cycle_totals,
            "min_cycle_s": round(min(self.cycle_totals), 3) if self.cycle_totals else None,
            "last_cycle_changes": self.n_changes,
        }

    def cleanup(self) -> None:
        import shutil

        self.spark.sql(f"DROP DATABASE IF EXISTS {self.db} CASCADE")
        shutil.rmtree(self.tmp_root, ignore_errors=True)


def run_arm(spark, base, cycles: int, bucketed: bool, db: str) -> dict:
    """Single sequential arm (kept for targeted profiling; the
    load-robust protocol is run_interleaved)."""
    arm = _ArmState(spark, base, bucketed, db)
    try:
        for i in range(cycles + 1):
            arm.cycle(i)
        return arm.result()
    finally:
        arm.cleanup()


def run_interleaved(spark, base, cycles: int, db_prefix: str = "sc") -> dict:
    """Cycle-pair-interleaved A/B: cycle i runs back-to-back on both
    arms (plain_i then bucketed_i), so host-load spikes hit both arms
    near-identically. The headline ratio uses MIN-OF-N per arm (the
    min over per-cycle wall totals — same discipline as tools/ab.py's
    min-of-3), with sum-totals kept for reference; the 1-min load
    average brackets the block so a noisy recording is self-labeling."""
    la0 = os.getloadavg()[0]
    plain = _ArmState(spark, base, False, f"{db_prefix}_plain")
    bkt = _ArmState(spark, base, True, f"{db_prefix}_bkt")
    try:
        for i in range(cycles + 1):
            plain.cycle(i)
            bkt.cycle(i)
        rp, rb = plain.result(), bkt.result()
        return {
            "cycles": cycles,
            "interleaved": True,
            "plain": rp,
            "bucketed": rb,
            "bucketed_over_plain_min": round(rb["min_cycle_s"] / rp["min_cycle_s"], 3),
            "bucketed_over_plain_total": round(rb["total_s"] / rp["total_s"], 3),
            "load_avg_1m_start": round(la0, 2),
            "load_avg_1m_end": round(os.getloadavg()[0], 2),
        }
    finally:
        plain.cleanup()
        bkt.cleanup()


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = sized_session(sf_dir, app_name="snapshot-cycle-ab")
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base.count()  # warm the scan
    out = {"sf_dir": sf_dir, "cycles": cycles, "n_buckets": N_BUCKETS}
    # two interleaved reps: cycle pairs share instantaneous load, and
    # the rep-level min guards against a spike spanning a whole rep
    for rep in range(2):
        out[f"rep_{rep}"] = run_interleaved(spark, base, cycles, f"sc{rep}")
    out["bucketed_over_plain"] = min(
        out["rep_0"]["bucketed_over_plain_min"],
        out["rep_1"]["bucketed_over_plain_min"],
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
