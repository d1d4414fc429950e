"""Parquet sink (SURVEY §2.A A5-A8) — Spark's writer, configured.

The reference hand-rolls a streaming columnar writer (appenders +
level_index + parquet_writer.rs). All of that machinery is internal to
Spark's ParquetOutputWriter; what we reproduce is the *configuration
surface*:

- compression codec map incl. levels (main.rs:228-250; zstd level 3 default)
- row-group sizing: 500 MiB raw / parquet.block.size (postgres_cloner.rs:305)
- overwrite-on-exists (main.rs output_file docs)
- optional single-file output (the reference is single-file by construction;
  at 100 TB you want many files — single_file=False default keeps the
  parallel writer, one file per task)

Deviations (documented, value-preserving): LZO unsupported by Spark's
writer (hard error, same contract); `created_by` metadata not settable.

Ordering (SURVEY §7.2): with single_file=True the input's sort order is
preserved — sort first, then coalesce(1) keeps one ordered partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pg2parquet_spark.options import ExportOptions


def export(df: DataFrame, path: str, options: ExportOptions | None = None) -> None:
    """Write ``df`` to ``path`` as Parquet per the export options."""
    options = options or ExportOptions()
    codec = options.spark_codec  # raises for lzo — same error contract as writer absence
    out = df.coalesce(1) if options.single_file else df
    writer = (
        out.write.mode("overwrite")
        .option("compression", codec)
        .option("parquet.block.size", str(options.row_group_bytes))
    )
    if options.compression == "zstd" and options.compression_level is not None:
        writer = writer.option(
            "parquet.compression.codec.zstd.level", str(options.compression_level)
        )
    writer.parquet(path)


def export_query(
    spark: SparkSession, query: str, path: str, options: ExportOptions | None = None
) -> DataFrame:
    """Reference main path: one SQL query → one Parquet dataset.

    The query runs against whatever sources are registered in the session
    (JDBC-backed temp views from sources.jdbc, or parquet fixture views).
    Returns the DataFrame for inspection (schema printing — A36's analog is
    Spark's own UI/listener; ``df.schema`` mirrors format_schema).
    """
    df = spark.sql(query)
    export(df, path, options)
    return df
