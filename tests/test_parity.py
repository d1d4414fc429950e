"""Rehearse the driver's DuckDB-oracle correctness gate on every registered
query (exact value equality, not approximate — if this passes, the driver's
order-insensitive value-hash must match)."""

from __future__ import annotations

import pytest

from pg2parquet_spark.oracle import run_compare
from pg2parquet_spark.registry import load_all

NAMES = sorted(load_all().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    res = run_compare(spark, sf_dir, name)
    assert res.ok, str(res)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
    # every query has a callable; every oracle key is a subset of queries
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(NAMES)
