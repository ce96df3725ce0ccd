from .sinks import upsert_parquet
from .tables import TABLES, jdbc_reader_options, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views", "jdbc_reader_options", "upsert_parquet"]
