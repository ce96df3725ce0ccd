"""SparkSession factory.

Tuned for correctness-vs-DuckDB comparison (UTC session timezone) and
for the local[32] test harness, while keeping every knob meaningful on
a real multi-executor cluster:

- AQE on: runtime coalescing, skew-join splitting, dynamic join
  strategy switches — the knobs that matter at 100 TB.
- shuffle.partitions sized to cores locally; on a cluster this would be
  ~2-3x total cores (or left to AQE's coalescing with a high initial).
- Arrow enabled for the (rare) pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cdc_pipeline_spark",
    shuffle_partitions: int | None = None,
    adaptive: bool = True,
    cores: int | None = None,
    local_dir: str | None = None,
    java_opts: str | None = None,
) -> SparkSession:
    """``adaptive=False`` turns AQE off — right for sub-GB workloads
    where AQE's stage-by-stage materialization barriers cost more than
    its runtime re-planning saves (measured ~30% on the sf0.1 bench).
    At real scale leave it on: coalescing, skew splits, and dynamic
    join switches are the 100 TB safety net. ``cores`` overrides the
    local-mode thread count ($SPARK_GRAFT_CPUS, default 32) for
    experiments — an auto-narrowing default was A/B'd in r6 and
    rejected as host-noise (one interleaved window favored local[8]
    by ~15%, the next favored local[32]). ``local_dir`` sets
    ``spark.local.dir`` (shuffle/spill scratch) — a core conf read at
    SparkEnv creation, so it only takes effect on the FIRST
    getOrCreate in the process; on a cluster this is the standard
    "scratch on the fastest local storage" deploy knob (NVMe; here a
    tmpfs when it has headroom — see bench.sized_session, measured
    -12% on the sf1 shuffle-heavy subset vs journaled-/tmp).
    NOTE: in one JVM the first getOrCreate pins the master for the
    process."""
    cpus = cores if cores is not None else os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true" if adaptive else "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4 reads tz-naive parquet timestamps as TIMESTAMP_NTZ by
        # default; unix_micros()/withWatermark() reject NTZ. Keep the
        # classic TimestampType read semantics (UTC instants).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    # JVM flags (GC etc.): a core conf read at JVM launch, so it only
    # takes effect when set before the process's first getOrCreate —
    # fresh-process harnesses (tools/windows.py, the driver's bench
    # run) get it; an already-running JVM ignores it. The env var
    # overrides the argument so per-arm A/B subprocesses can steer it.
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS", java_opts)
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def session_cache(spark: SparkSession, name: str) -> dict:
    """A named per-session memo dict held ON the session object.

    Replaces the module-global ``WeakKeyDictionary`` caches (ADVICE
    r8): a weak-keyed map whose VALUES are DataFrames never frees
    anything, because every DataFrame strongly references its
    SparkSession — the value pinned the key, so entries outlived
    ``newSession()`` churn for process lifetime. Storing the dict in
    the session wrapper's own ``__dict__`` ties the cache's lifetime
    to the session with no global registry at all: the session dies,
    the cache dies with it.

    Identity semantics match the old weak keying — a second Python
    wrapper around the same JVM session misses the cache (harmless
    rebuild), and a DataFrame can never leak across sessions because
    the cache lives on exactly the session that built it."""
    caches = spark.__dict__.setdefault("_cdc_graft_session_caches", {})
    return caches.setdefault(name, {})
