"""Data-layout operators: the storage-side half of the 100 TB story.

A query plan is only as good as the layout it scans. These queries exercise
the two layout techniques that decide scan cost at scale, end-to-end through
real writes (like sink_roundtrip does for the plain sink):

- Hive partitioning: write partitioned by a low-cardinality column, read
  with a partition predicate — the scan must list ONLY the matching
  directories (PartitionFilters, pinned by a plan test). At 100 TB this is
  the difference between reading one partition and reading everything.
- Bucketing: write both join sides bucketed by the join key into the
  warehouse, then join — co-located buckets make the join exchange-free
  (no shuffle of either side; plan-tested). This is the pre-shuffle
  amortization every repeatedly-joined 100 TB fact table wants.

Writes go to a per-process tempdir / uniquely-named warehouse tables, so
concurrent harness runs never collide.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg2parquet_spark.registry import register
from pg2parquet_spark.tables import table

N_BUCKETS = 8


@register(
    "layout_partition_prune",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
WHERE event_type = 'click'
GROUP BY user_id
""",
    doc="Hive-partitioned layout: events written partitionBy(event_type), "
    "read back with an event_type predicate. The filter must prune at the "
    "directory level (PartitionFilters in the scan, plan-tested) so the "
    "query reads one partition's files, never the full dataset.",
)
def layout_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = tempfile.mkdtemp(prefix="pg2parquet_part_") + "/events_by_type"
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
    )


@register(
    "layout_bucketed_join",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    doc=f"Bucketed co-located join: orders and customer written bucketBy"
    f"({N_BUCKETS}, custkey) into warehouse tables, then joined on the "
    "bucket key. Matching bucket layouts on both sides make the join "
    "exchange-free (no shuffle of either table, plan-tested) — the "
    "write-once/join-many amortization a repeatedly-joined fact table "
    "needs at 100 TB.",
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unique table names per process: concurrent runs share spark-warehouse/
    pid = os.getpid()
    t_orders, t_cust = f"b_orders_{pid}", f"b_customer_{pid}"
    for name, df, key in (
        (t_orders, table(spark, sf_dir, "orders"), "o_custkey"),
        (t_cust, table(spark, sf_dir, "customer"), "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    joined = spark.table(t_orders).join(
        spark.table(t_cust),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("sum_price"),
    )
