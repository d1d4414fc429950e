"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``pg2parquet_spark`` package; this module is a
thin adapter over its query registry (pg2parquet_spark/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pg2parquet_spark.operators.relational import flagship
    from pg2parquet_spark.session import tune_existing

    tune_existing(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ pipeline ops).

    Each callable first applies the engine's runtime session tuning (UTC
    session timezone, AQE) — the driver may call queries() without entry(),
    and the timestamp queries' oracle parity depends on the UTC pin.
    """
    from pg2parquet_spark.registry import load_all
    from pg2parquet_spark.session import tune_existing

    def tuned(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(tune_existing(spark), sf_dir)

        return run

    return {name: tuned(spec.fn) for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted → rows-only check."""
    from pg2parquet_spark.registry import load_all

    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
