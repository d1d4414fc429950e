"""Generic file sources beyond the PG/parquet pair.

The reference reads exactly one source (PostgreSQL); its README points users
at DuckDB/Spark for post-processing other formats (README.md:86-89). Here the
engine accepts any Spark-readable file format as a query source, so fixture
dirs can mix formats: `<table>.parquet|csv|json|jsonl|orc` all register as
views.

Scale notes: CSV/JSON are line-splittable (gz is not — a 100 TB landing zone
should use bzip2/zstd-seekable or many files); schemas are supplied or
sampled with `samplingRatio` rather than full-scan inferred; every view is
still a lazy scan, so Catalyst prunes columns and (for parquet/orc) pushes
predicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".orc": "orc",
}


def infer_format(path: str) -> str:
    ext = os.path.splitext(path)[1].lower()
    if ext not in _EXT_FORMAT:
        raise ValueError(
            f"cannot infer source format from {path!r}; expected one of {sorted(_EXT_FORMAT)}"
        )
    return _EXT_FORMAT[ext]


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read one table from a file/dir in any supported format.

    CSV defaults: header on, schema inference bounded by samplingRatio (pass
    an explicit ``schema`` in production — inference reads data twice).
    """
    fmt = fmt or infer_format(path)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", schema is None)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def register_file_views(spark: SparkSession, directory: str) -> list[str]:
    """Register every recognized file in ``directory`` as a temp view named
    after its stem. Mixed formats coexist; parquet wins on stem collisions."""
    # events-style fixtures carry TIMESTAMP(NANOS) parquet columns, which the
    # vectorized reader rejects without this conf (see tables._events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    chosen: dict[str, str] = {}
    for fname in sorted(os.listdir(directory)):
        stem, ext = os.path.splitext(fname)
        if ext.lower() not in _EXT_FORMAT:
            continue
        if stem in chosen and chosen[stem].endswith(".parquet"):
            continue
        chosen[stem] = os.path.join(directory, fname)
    for stem, path in chosen.items():
        df = read_table(spark, path)
        if stem == "events" and dict(df.dtypes).get("ts") == "bigint":
            # nanos-as-long twin of tables._events for parquet event fixtures
            from pyspark.sql import functions as F

            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
            )
        df.createOrReplaceTempView(stem)
    return sorted(chosen)
