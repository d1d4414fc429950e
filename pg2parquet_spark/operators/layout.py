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
    from pg2parquet_spark.tmpdirs import memo_tmpdir

    ev = table(spark, sf_dir, "events")
    # memoized dir per corpus (no per-invocation mkdtemp churn); the write
    # itself re-runs every invocation — overwrite into the same layout is
    # the behavior under test
    base, _ = memo_tmpdir("pg2parquet_part", sf_dir)
    out = base + "/events_by_type"
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
    )


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:  # pragma: no cover - exists but owned elsewhere
        return True
    return True


def _sweep_stale_bucket_tables(spark: SparkSession, max_age_s: int = 3600) -> None:
    """Reap b_orders_*/b_customer_* bucket tables left by finished runs.

    Per-pid table names keep concurrent runs from clobbering each other, but
    every process leaves two tables behind; a long-lived harness would
    accumulate them without bound. A table is stale when its owning pid is
    dead (the common case — reaps a same-hour burst of driver + selfcheck +
    bench + pytest runs immediately) or, as a fallback for pid reuse, when
    its data dir is older than ``max_age_s``.

    Stale CATALOG entries are dropped with ``DROP TABLE IF EXISTS`` — which
    removes both the metastore row and the managed data dir; deleting the
    dir directly would leave a dangling catalog entry that breaks
    ``SHOW TABLES`` / ``spark.table`` forever. Orphan DIRS with no catalog
    entry (a previous session's metastore_db is gone) have nothing to drop,
    so those are rmtree'd under the same staleness gate.
    """
    import shutil
    import time

    def _stale(name: str, data_dir: str) -> bool:
        pid_s = name.rsplit("_", 1)[-1]
        if pid_s.isdigit() and not _pid_alive(int(pid_s)):
            return True
        try:
            return os.path.getmtime(data_dir) < time.time() - max_age_s
        except OSError:
            return True  # dir already gone: catalog entry is dangling

    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    mine = (f"b_orders_{os.getpid()}", f"b_customer_{os.getpid()}")
    cataloged = set()
    for t in spark.catalog.listTables():
        n = t.name
        if n.startswith(("b_orders_", "b_customer_")):
            cataloged.add(n)
            if n not in mine and _stale(n, os.path.join(wh, n)):
                spark.sql(f"DROP TABLE IF EXISTS {n}")
    if not os.path.isdir(wh):
        return
    for d in os.listdir(wh):
        if (
            d.startswith(("b_orders_", "b_customer_"))
            and d not in cataloged
            and d not in mine
            and _stale(d, os.path.join(wh, d))
        ):
            shutil.rmtree(os.path.join(wh, d), ignore_errors=True)


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
    _sweep_stale_bucket_tables(spark)
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


def zorder16(x8, y8):
    """Interleave two 8-bit ints into a 16-bit Z-value (Morton code) with
    plain integer arithmetic — identical in any engine, no UDF."""
    z = F.lit(0)
    for i in range(8):
        z = (
            z
            + F.shiftleft(F.shiftright(x8, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y8, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(df: DataFrame, out: str, zcol, n_files: int) -> None:
    """Range-partition + sort by the Z-value and write: each output file
    covers one compact Z-curve segment ≈ one rectangle of the 2-D domain,
    so a box predicate on EITHER dimension prunes files/row-groups by
    min-max stats. The scale dial is n_files; the sort is the one-time
    layout cost a repeatedly-range-queried 100 TB table amortizes."""
    (
        df.repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .write.mode("overwrite")
        .parquet(out)
    )


@register(
    "layout_zorder_cluster",
    oracle="""
WITH e AS (
  SELECT event_type, value,
         CAST(user_id % 256 AS INT) AS x8,
         CAST((extract(day FROM ts) * 24 + extract(hour FROM ts)) % 256 AS INT) AS y8
  FROM events
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
FROM e
WHERE x8 BETWEEN 16 AND 47 AND y8 BETWEEN 32 AND 95
GROUP BY event_type
""",
    doc="Z-order (Morton) clustering: events written range-partitioned by "
    "the bit-interleave of (user bucket, hour-of-month bucket), then read "
    "back with a 2-D box predicate on the STORED dimension columns — "
    "min-max row-group stats prune on both dimensions at once, which a "
    "single-column sort can only do for one. The clustering win is "
    "MEASURED in tests (per-file spans vs a time-sorted layout), not "
    "asserted. Pure integer arithmetic, no UDF.",
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    x8 = (F.col("user_id") % 256).cast("int")
    y8 = ((F.dayofmonth("ts") * 24 + F.hour("ts")) % 256).cast("int")
    staged = ev.select("event_type", "value", x8.alias("x8"), y8.alias("y8"))
    from pg2parquet_spark.tmpdirs import memo_tmpdir

    base, _ = memo_tmpdir("pg2parquet_zorder", sf_dir)
    out = base + "/events_z"
    write_zordered(staged.withColumn("z", zorder16(F.col("x8"), F.col("y8"))), out, F.col("z"), 4)
    back = spark.read.parquet(out).filter(
        F.col("x8").between(16, 47) & F.col("y8").between(32, 95)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_value"),
    )
