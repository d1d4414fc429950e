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
    """Write ``df`` to ``path`` per the export options (parquet default)."""
    options = options or ExportOptions()
    if options.sort_by:
        df = df.orderBy(*options.sort_by)
    out = df.coalesce(1) if options.single_file else df
    writer = out.write.mode("overwrite")
    if options.output_format == "parquet":
        codec = options.spark_codec  # raises for lzo — same error contract as writer absence
        writer = writer.option("compression", codec).option(
            "parquet.block.size", str(options.row_group_bytes)
        )
        if options.compression == "zstd" and options.compression_level is not None:
            writer = writer.option(
                "parquet.compression.codec.zstd.level", str(options.compression_level)
            )
    if options.partition_by:
        # hive-style layout: readers get partition pruning on these columns
        writer = writer.partitionBy(*options.partition_by)
    if options.output_format == "parquet":
        writer.parquet(path)
    elif options.output_format == "csv":
        writer.option("header", "true").csv(path)
    elif options.output_format == "json":
        writer.json(path)
    else:
        writer.orc(path)


def export_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed+sorted managed parquet table.

    The scale story: two tables bucketed on their join key by the same
    bucket count join WITHOUT a shuffle (SortMergeJoin reads co-located
    buckets directly) — the Spark analog of co-partitioned storage. Used for
    fact tables that are joined repeatedly on the same key; verified
    shuffle-free by tests/test_export.py::test_bucketed_join_no_shuffle.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table_name)


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


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 512,
    options: ExportOptions | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files of
    ~target_file_mb. The many-small-files problem is the chronic failure
    mode of incremental ingestion at scale (every NameNode/footer-read
    scales with file count); this is the maintenance pass that fixes it.

    File count = ceil(current_bytes / target); data is round-robin
    repartitioned so output files are uniform. Returns the new file count.
    Rewrites via a temp dir so a mid-compaction failure never corrupts the
    source dataset.
    """
    import glob
    import math
    import os
    import shutil

    current_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    )
    n_files = max(1, math.ceil(current_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    export(df.repartition(n_files), tmp, options)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return len(glob.glob(os.path.join(path, "*.parquet")))
