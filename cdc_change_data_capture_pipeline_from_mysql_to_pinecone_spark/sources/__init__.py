from .sinks import (
    compact_parquet,
    upsert_parquet,
    upsert_parquet_partitioned,
    write_bucketed,
    write_partitioned,
)
from .tables import TABLES, jdbc_reader_options, load_table, register_views

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "jdbc_reader_options",
    "upsert_parquet",
    "upsert_parquet_partitioned",
    "write_bucketed",
    "write_partitioned",
    "compact_parquet",
]
