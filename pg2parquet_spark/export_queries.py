"""Driver-facing queries exercising the export sink (SURVEY §2.A A5-A8).

``sink_roundtrip`` actually writes Parquet through export() (zstd, custom
row-group size), reads it back, and aggregates — so the correctness gate
covers the sink path end-to-end, not just in pytest.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg2parquet_spark.export import export
from pg2parquet_spark.options import ExportOptions
from pg2parquet_spark.registry import register
from pg2parquet_spark.tables import table


@register(
    "sink_roundtrip",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_quantity > 30
GROUP BY l_returnflag
""",
    doc="A5-A8 sink: filter → export() with zstd + row-group sizing → read back → aggregate. "
    "Values must survive the write/read cycle bit-exactly.",
)
def sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 30)
    out = tempfile.mkdtemp(prefix="pg2parquet_sink_") + "/lineitem_filtered.parquet"
    export(li, out, ExportOptions(compression="zstd", compression_level=3,
                                  row_group_bytes=64 * 1024 * 1024))
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
    )
