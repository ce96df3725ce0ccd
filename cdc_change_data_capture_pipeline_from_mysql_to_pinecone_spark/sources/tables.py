"""Table sources.

The reference discovers tables at runtime (``SHOW TABLES``,
service_layer/service.py:11-19) and reads them over a single MySQL
connection with ``SELECT *`` (service.py:52-57). Here the equivalent
surface is:

- parquet scans of the driver fixtures (column-pruned, predicate-pushed
  by Catalyst for free — the reference always reads all columns);
- a catalog-enumeration helper (≙ S1);
- a JDBC option builder that documents how the MySQL path parallelizes
  at scale (≙ S3/S4): ``partitionColumn`` from the table's primary key
  so a 100 TB initial load becomes N bounded-memory range scans instead
  of the reference's single ``fetchall`` (service.py:59).

No MySQL server exists in the test environment, so the JDBC path is
configuration + documented contract, exercised only via its option
dict.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Driver-provided fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_NS_COLS_CACHE: dict[str, list[str]] = {}
# Per-SESSION analyzed-relation memo, held on the session object itself
# (session_cache, r9 — ADVICE r8: the r8 WeakKeyDictionary never freed
# anything because the cached DataFrames strongly reference their
# session, pinning the weak key). ``spark.newSession()`` shares the
# applicationId but not session state, so the cache must key on the
# session, never the app id — a DataFrame must not cross sessions.
from ..session import session_cache as _session_cache


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark 4 rejects the
    physical type outright, so they are read as raw int64 nanos (legacy
    conf) and converted to TimestampType with integer division (no
    double round-trip: ns epoch values exceed 2^53). Footer probe is
    memoized — fixtures are immutable and every query calls this."""
    if path not in _NS_COLS_CACHE:
        import pyarrow.parquet as pq
        import pyarrow.types as pat

        schema = pq.read_schema(path)
        _NS_COLS_CACHE[path] = [
            f.name for f in schema if pat.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    return _NS_COLS_CACHE[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one fixture table (≙ reference full scan S3,
    service.py:56-57, but columnar with pushdown/pruning).

    Note: the fixture files are a single parquet row group, so the
    scan itself cannot split — a repartition-after-read was measured
    NET NEGATIVE for scan->agg/join plans at sf0.1 (the exchange costs
    more than the parallelism buys); CPU-heavy operators instead widen
    their own input via plans.partitioning.ensure_parallelism, which
    is a no-op on real multi-split inputs.
    """
    from pyspark.sql import functions as F

    path = os.path.join(sf_dir, f"{name}.parquet")
    # fixtures are read-only: reuse the analyzed relation per (session,
    # path) so repeated queries skip file listing + schema resolution
    per_session = _session_cache(spark, "load_table")
    if path in per_session:
        return per_session[path]
    ns_cols = _nanos_ts_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Spark 4 defaults spark.sql.parquet.inferTimestampNTZ.enabled=true,
    # which reads the fixtures' tz-naive timestamp[us] columns as
    # TIMESTAMP_NTZ — and unix_micros()/withWatermark() reject NTZ. The
    # engine's output convention is epoch micros of the stored instant
    # (entry module docstring), i.e. classic TimestampType semantics, so
    # force the pre-4.x read behavior. Set here (not only in get_spark)
    # because the driver harness passes its own SparkSession.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Defensive: if a future runtime ignores the conf, normalize any NTZ
    # column back to TimestampType (values preserved under UTC session tz).
    from pyspark.sql.types import TimestampNTZType

    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    per_session[path] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register all fixture tables as temp views for the SQL surface.

    ≙ the reference's runtime table enumeration (service.py:11-19): the
    set of queryable relations is discovered, not declared.
    """
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


_FOOTER_ROWS_CACHE: dict[str, int] = {}


def table_rows(sf_dir: str, name: str) -> int:
    """Row count from the parquet footer (no Spark job). Fixtures are
    immutable, so the count is memoized per path — used both to size
    corpus-dependent parameters and as the currency check for the
    auto layout gate below."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if path not in _FOOTER_ROWS_CACHE:
        import pyarrow.parquet as pq

        _FOOTER_ROWS_CACHE[path] = pq.ParquetFile(path).metadata.num_rows
    return _FOOTER_ROWS_CACHE[path]


def bucketed_fact_name(sf_dir: str, table: str, n_buckets: int = 128) -> str:
    """Catalog name of the ingest-once co-bucketed copy of a fixture
    fact table. ONE naming convention shared by the ingest path
    (``_bucketed_fact`` in the entry module) and the read gate
    (:func:`load_fact`) so the two can never drift.

    The name encodes the bucket COUNT and the bucket KEY (ADVICE r14):
    attach trusts the warehouse files to carry the declared spec, so a
    future revision that changed the key (or the hash layout) while
    sharing an old warehouse dir would otherwise re-attach those files
    under wrong bucket metadata — Spark would elide the join Exchange
    on a distribution the files don't have, producing wrong join rows
    that the row-count verify cannot catch. Keying the NAME on the
    spec makes a spec change miss the old dir entirely (worst case: a
    re-ingest, never a wrong plan)."""
    import re

    key = _FACT_BUCKET_KEYS.get(table, "nokey")
    token = re.sub(r"[^0-9A-Za-z]+", "_", os.path.basename(sf_dir.rstrip("/")))
    return f"bktfact.{table}_{token}_{key}_ok{int(n_buckets)}"


def load_fact(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    layout: str = "auto",
    n_buckets: int = 128,
) -> DataFrame:
    """Fact-table scan with an automatic storage-layout gate (VERDICT
    r13 task 4). ``layout='auto'``: if a CURRENT co-bucketed managed
    table exists for this fact (catalog entry present AND its row count
    matches the parquet footer — fixtures are immutable, so a count
    match means the layout is the same data), return it; otherwise
    return the plain parquet scan. The gate NEVER ingests — paying the
    one-time partitioning shuffle stays an explicit choice
    (``_bucketed_fact``); this is purely "use the better layout when
    someone already built it".

    Correctness is layout-independent (same rows either way — the
    bucketed arm queries share oracles with their plain twins); what
    changes is the plan: equi-joins and aggregations on the bucket key
    between co-bucketed tables run with zero Exchange. At 100 TB this
    is the table-format pattern (a catalog that records clustering and
    lets every reader benefit) in miniature.

    Cross-process: the default in-memory catalog dies with each
    process while the bucketed FILES survive in the warehouse, so a
    catalog-only check would miss the layout in exactly the realistic
    deployment (ingest job builds it once, readers are other
    processes). If the catalog misses but the expected warehouse
    location exists, the gate RE-ATTACHES it as an external
    ``CLUSTERED BY`` table and count-verifies — attach-only: it never
    writes data and never deletes files (a failed or stale attach is
    dropped from the catalog — external drops leave files — and falls
    back to plain; rewrites stay ``_bucketed_fact``'s job).

    ``layout='plain'`` forces the parquet scan — contract/baseline
    numbers keep an explicit opt-out.
    """
    if layout not in ("auto", "plain"):
        raise ValueError(f"layout must be 'auto' or 'plain', got {layout!r}")
    base = load_table(spark, sf_dir, table)
    if layout == "plain":
        return base
    per_session = _session_cache(spark, "load_fact_auto")
    ck = (sf_dir, table, int(n_buckets))
    got = per_session.get(ck)
    if got is not None:
        return got
    df = base
    try:
        name = bucketed_fact_name(sf_dir, table, n_buckets)
        expected = table_rows(sf_dir, table)
        if spark.catalog.tableExists(name):
            t = spark.table(name)
            if t.count() == expected:
                df = t
        else:
            df = _attach_bucketed(spark, base, name, table, expected, n_buckets) or base
    except Exception:
        df = base
    # Cache POSITIVE (bucketed) hits only (ADVICE r14): a cached plain
    # fallback would pin the whole session to the plain scan even after
    # _bucketed_fact ingests the layout later in the same session
    # (performance-only miss, results identical — but a silent one).
    # The re-probe on the plain path is a catalog lookup + parquet
    # footer count, negligible next to any query that reads the fact.
    if df is not base:
        per_session[ck] = df
    return df


#: Bucket key per fixture fact table (the ingest-once layout is always
#: keyed on the order key — the repeated fact-fact join column).
_FACT_BUCKET_KEYS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}


def _attach_bucketed(
    spark: SparkSession, base: DataFrame, name: str, table: str, expected: int, n_buckets: int
) -> DataFrame | None:
    """Catalog-lost-but-files-intact recovery for :func:`load_fact`:
    re-attach the warehouse directory written by a prior process's
    ``_bucketed_fact`` as an EXTERNAL bucketed table (bucketing is a
    catalog property; the files carry Spark's own bucket hashing).
    Returns the attached frame, or None if the location is missing,
    foreign, or fails the row-count verify (catalog entry dropped
    again — external drop leaves files untouched)."""
    key = _FACT_BUCKET_KEYS.get(table)
    if key is None:
        return None
    from urllib.parse import urlparse

    wh = spark.conf.get("spark.sql.warehouse.dir")
    loc = os.path.join(
        urlparse(wh).path or wh, "bktfact.db", name.split(".", 1)[1]
    )
    if not os.path.isdir(loc):
        return None
    try:
        spark.sql("CREATE DATABASE IF NOT EXISTS bktfact")
        ddl = spark.createDataFrame([], base.schema)._jdf.schema().toDDL()
        spark.sql(
            f"CREATE TABLE {name} ({ddl}) USING PARQUET "
            f"CLUSTERED BY ({key}) INTO {int(n_buckets)} BUCKETS "
            f"LOCATION '{loc}'"
        )
        t = spark.table(name)
        if t.count() == expected:
            return t
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        return None
    except Exception:
        try:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        except Exception:
            pass
        return None


def jdbc_reader_options(
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 64,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    r"""JDBC scan options for the MySQL source path.

    The reference reads each table on one connection and materializes
    the whole delta in memory (``cursor.fetchall``, service.py:59).
    At scale the scan must be range-partitioned on the primary key
    (discovered via information_schema, utils/util.py:2-18) so every
    task reads a bounded slice; Catalyst pushes filters (e.g. the
    CDC watermark predicate, service.py:53) into the generated SQL.

    MySQL dialect mapping (documented, not executed — no MySQL in the
    test env; the same contracts are EXECUTED against embedded Derby
    in tests/test_jdbc_integration.py, including timestamp-predicate
    pushdown and quoted identifiers):

    * ``url``: ``jdbc:mysql://host:3306/db`` with the Connector/J
      driver ``com.mysql.cj.jdbc.Driver`` on the executor classpath
      (≙ utils/mysql_connect.py:5-17's host/user/password/database).
    * Identifier quoting: Spark's built-in MySQLDialect emits
      BACKTICKS (``\`order\```) where Derby/ANSI use double quotes —
      reserved-word and case-sensitive columns need no caller action,
      exactly as the quoted-identifier Derby test demonstrates.
    * Table discovery: the reference's ``SHOW TABLES``
      (service.py:48-50) maps to reading
      ``information_schema.tables`` through this same reader
      (``dbtable='(SELECT table_name FROM information_schema.tables
      WHERE table_schema = DATABASE()) t'``) — a plain JDBC scan, so
      the catalog walk partakes of pushdown/partitioning like any
      other table.
    * TIMESTAMP watermarks: MySQL TIMESTAMP columns arrive as
      session-timezone-relative; pin ``connectionTimeZone=UTC`` (and
      keep the Spark session UTC) so the ``updated_at > watermark``
      pushdown compares in one zone — the Derby timestamp-pushdown
      test exercises the same θ-predicate shape.
    """
    return {
        "url": url,
        "dbtable": table,
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetch_size),
        "pushDownPredicate": "true",
    }


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: str | list[str] | tuple[str, ...],
    n_buckets: int,
    sort_cols: str | list[str] | tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a hash-BUCKETED managed table (Spark
    ``bucketBy`` + ``saveAsTable``): the write shuffles ONCE on the
    bucket keys and records the layout in the catalog, after which
    every equi-join or aggregation on those keys between co-bucketed
    tables runs with NO Exchange on either side — the join degenerates
    to a per-bucket zip. This is the storage-layout answer to the
    reference's repeated snapshot-vs-snapshot key joins
    (service_layer/service.py:52-57 re-reads and re-matches full
    tables every cycle): at 100 TB you pay the partitioning shuffle
    at ingest, not once per query.

    Sizing: ``n_buckets`` should put one healthy task's worth of data
    in each bucket per table (hundreds of MB compressed) and both
    join sides MUST use the same ``n_buckets`` and key order —
    mismatched counts fall back to a normal shuffled join (Spark
    bucket coalescing can bridge integer multiples;
    ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
    ``sort_cols`` additionally sorts within each bucket FILE, letting
    sort-merge joins skip their sort when files-per-bucket is 1.

    Plan-proof in tests/test_bucketing.py: bucketed join + bucket-key
    aggregation is a zero-Exchange plan under forced SMJ; the same
    query on plain parquet shows both hash-partitioning shuffles.
    (The in-bucket SMJ Sort only drops when each bucket is a single
    file — multi-partition writers emit one file per task per bucket,
    so Spark keeps the sort; coalesce the writer to guarantee it.)
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if isinstance(sort_cols, str):
        sort_cols = [sort_cols]
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    w = df.write.mode(mode).bucketBy(int(n_buckets), *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read of a table written by ``write_bucketed``. The
    bucket spec rides in the catalog entry, so the scan reports
    ``SelectedBucketsCount`` and downstream joins/aggregations on the
    bucket keys satisfy their required distribution without an
    Exchange. (A bare ``spark.read.parquet`` of the same files would
    LOSE the layout — bucketing only exists through the catalog.)"""
    return spark.table(table_name)
