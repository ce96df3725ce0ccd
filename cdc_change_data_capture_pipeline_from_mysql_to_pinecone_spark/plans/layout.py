"""Z-order (Morton-curve) data layout for multi-column pruning.

At 100 TB, partition pruning handles ONE filter column; a scan
filtered on two or more columns (user_id AND time, lat AND lon)
still reads everything unless the file layout clusters those columns
jointly. Interleaving the bits of the (range-normalized) columns into
one Morton key and range-partitioning the write on that key puts rows
close in EVERY keyed dimension into the same files, so parquet
min/max row-group statistics prune a k-dimensional box filter to a
~linear number of files — the same idea behind lakehouse
``OPTIMIZE ZORDER BY`` (public Delta/Iceberg feature; reimplemented
here over plain parquet with pure built-in expressions).

The reference has no layout management at all (its store is an
external vector index); this operator is the [EXT] scale path for the
engine's own parquet tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols: list[tuple[str, float, float]], bits: int = 8
) -> Column:
    """Morton key over ``(name, lo, hi)`` columns: each value is
    min/max-scaled to ``bits`` bits, then bit b of column c lands at
    interleaved position ``b * n_cols + c``. Pure integer expressions
    (one parsed expr string — no UDF, no shuffle); bounds are caller
    metadata (at scale: table stats / footer min-max, a free read).

    ``bits=8`` per column keeps the key in a BIGINT for up to 8
    columns and is plenty: pruning happens at file granularity, so key
    resolution only needs to out-resolve the file count, not the rows.
    """
    return F.expr(zorder_sql(cols, bits)).alias("zkey")


def zorder_sql(cols: list[tuple[str, float, float]], bits: int = 8) -> str:
    """The Morton-key expression as engine-portable SQL text (mirrored
    verbatim into DuckDB oracles; only >>, &, | and arithmetic —
    column names must be plain identifiers, no quoting dialect)."""
    n = len(cols)
    scaled = []
    for name, lo, hi in cols:
        span = float(hi) - float(lo)
        top = (1 << bits) - 1
        scaled.append(
            f"least({top}, greatest(0, CAST(floor(((CAST({name} AS DOUBLE)"
            f" - {float(lo)!r}) / {span!r}) * {1 << bits}) AS BIGINT)))"
        )
    terms = [
        f"((({s} >> {b}) & 1) << {b * n + c})"
        for c, s in enumerate(scaled)
        for b in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    cols: list[tuple[str, float, float]],
    path: str,
    n_files: int = 32,
    bits: int = 8,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files range-partitioned on
    the Morton key (one shuffle — the same cost as any repartition
    rewrite, amortized over every multi-column scan after it). The key
    column is dropped from the data: its effect lives in the file
    boundaries and each file's parquet min/max stats."""
    keyed = df.withColumn("_zkey", zorder_key(cols, bits))
    (
        keyed.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_touched(path: str, box: dict[str, tuple[float, float]]) -> tuple[int, int]:
    """Count parquet files whose column min/max statistics overlap the
    k-dimensional ``box`` filter, vs total files. This is exactly the
    row-group-skipping decision a scan makes; fewer touched files =
    less IO at 100 TB."""
    import os

    import pyarrow.parquet as pq

    total = touched = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            total += 1
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            overlap = True
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                names = {
                    row_group.column(i).path_in_schema: row_group.column(i)
                    for i in range(row_group.num_columns)
                }
                overlap = True
                for col, (lo, hi) in box.items():
                    st = names[col].statistics
                    if st is None:
                        continue
                    if st.min > hi or st.max < lo:
                        overlap = False
                        break
                if overlap:
                    break
            if overlap:
                touched += 1
    return touched, total
