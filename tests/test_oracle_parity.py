"""Differential test: every queries() entry with an oracle must match
DuckDB on rows + columns + order-insensitive values — the driver's
correctness gate, run locally first."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare, duck_con  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    result = compare(df, con, ORACLES[name])
    assert result["cols_match"], f"{name}: column mismatch {result}"
    assert result["rows_match"], f"{name}: row-count mismatch {result}"
    assert result["values_match"], f"{name}: value mismatch {result}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["id", "dim", "n_chars", "source"]


def test_all_queries_run(spark, sf_dir):
    """Queries without oracles must still execute and return rows."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, sf_dir)
        df.limit(5).collect()
