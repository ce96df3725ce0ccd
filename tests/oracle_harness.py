"""Local mirror of the driver's DuckDB differential oracle.

Runs a Spark query and its oracle SQL on the same parquet fixtures and
compares row count, column names/types (normalized), and an
order-insensitive value hash — the same gate CORRECTNESS_r{N}.json
records, so mismatches surface here first.
"""

from __future__ import annotations

import math
import os

import duckdb

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


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # match ints embedded in doubles; keep 10 sig digits otherwise
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _rowset(cols: list[str], rows) -> tuple[int, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    return len(rows), normed


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    d = con.sql(sql)
    d_cols = [c for c in d.columns]
    d_rows = d.fetchall()
    n_s, h_s = _rowset(s_cols, [tuple(r) for r in s_rows])
    n_d, h_d = _rowset(d_cols, d_rows)
    result = {
        "rows_spark": n_s,
        "rows_duck": n_d,
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "cols_spark": sorted(s_cols),
        "cols_duck": sorted(d_cols),
        "rows_match": n_s == n_d,
        "values_match": h_s == h_d,
    }
    if not result["values_match"]:
        sset, dset = set(h_s), set(h_d)
        result["only_spark"] = sorted(sset - dset)[:5]
        result["only_duck"] = sorted(dset - sset)[:5]
    return result
