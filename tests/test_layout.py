"""Z-order layout tests: the Morton key clusters multi-column boxes
into few files (measured from parquet footer min/max stats — the same
decision row-group skipping makes at scale)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.plans.layout import (  # noqa: E402
    files_touched,
    zorder_key,
    zorder_layout,
)
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table  # noqa: E402


def test_zorder_key_interleaves_and_bounds(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (255.0, 255.0), (-5.0, 300.0)], "x double, y double"
    )
    got = [
        r["zkey"]
        for r in df.select(
            zorder_key([("x", 0.0, 256.0), ("y", 0.0, 256.0)], bits=8)
        ).collect()
    ]
    # (0,0) -> 0; (255,255) -> all 16 bits set; out-of-range clamps
    assert got[0] == 0
    assert got[1] == (1 << 16) - 1
    # x clamps to 0, y clamps to max -> exactly the odd (y) bit lanes
    assert got[2] == sum(1 << (2 * b + 1) for b in range(8))


def test_zorder_layout_prunes_multicolumn_box(spark, sf_dir, tmp_path):
    """A 2-D box filter over a z-ordered layout must touch a small
    fraction of files; the same data laid out by a single column
    touches ~all files for the second column's filter. Footer min/max
    stats are the ground truth (what row-group skipping reads)."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    lo_u, hi_u = 0.0, 200.0
    lo_v, hi_v = 0.0, 1000.0

    z_path = str(tmp_path / "zorder")
    zorder_layout(
        e,
        [("user_id", lo_u, hi_u), ("value", lo_v, hi_v)],
        z_path,
        n_files=16,
    )
    lin_path = str(tmp_path / "linear")
    # single-column clustering (the non-z baseline): order by user_id only
    e.repartitionByRange(16, F.col("user_id")).sortWithinPartitions(
        "user_id"
    ).write.mode("overwrite").parquet(lin_path)

    # same row count both layouts
    assert spark.read.parquet(z_path).count() == e.count()

    box = {"user_id": (10, 40), "value": (100.0, 250.0)}
    z_touch, z_total = files_touched(z_path, box)
    l_touch, l_total = files_touched(lin_path, box)
    # range partitioner may leave a couple of empty partitions
    assert z_total >= 14 and l_total >= 14
    # z-order prunes the joint box strictly better than one-column
    # clustering, and to well under half the files
    assert z_touch < l_touch, (z_touch, l_touch)
    assert z_touch <= z_total // 2, (z_touch, z_total)

    # correctness: the boxed scan returns identical rows on both layouts
    def boxed(path):
        return (
            spark.read.parquet(path)
            .filter(
                (F.col("user_id").between(*box["user_id"]))
                & (F.col("value").between(*box["value"]))
            )
            .select("event_id")
        )

    a = sorted(r["event_id"] for r in boxed(z_path).collect())
    b = sorted(r["event_id"] for r in boxed(lin_path).collect())
    assert a == b and a
