"""Grouped feature extraction via ``groupBy().applyInPandas`` — the third
pandas execution surface next to mapInPandas (multimodal codecs, ANN/LSH
kernels) and applyInPandasWithState (streaming session state).

The operator shape: one shuffle co-locates each user's events, then an
Arrow-batched pandas function computes per-group sequence features that are
awkward as window expressions but one line each in pandas (sorted
inter-arrival deltas, their order statistics). This is exactly how a
training-data pipeline lifts per-entity behavioral features at 100 TB: the
group key is the shuffle key, groups are independent, and the pandas
function sees one group at a time (so its memory is bounded by the largest
group, which per-user event streams keep small; a pathological hot key
would go through the skew utilities in operators/skew.py first).

Determinism: all features are integer microseconds (epoch diffs) or single
integer divisions — no float accumulation, so the DuckDB oracle (lag-based
SQL) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg2parquet_spark.registry import register
from pg2parquet_spark.tables import table


@register(
    "ml_user_event_features",
    oracle="""
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
),
gaps AS (
  SELECT user_id, us - prev_us AS gap FROM seq WHERE prev_us IS NOT NULL
)
SELECT s.user_id,
       CAST(s.n_events AS BIGINT) AS n_events,
       CAST(g.min_gap AS BIGINT) AS min_gap_us,
       CAST(g.max_gap AS BIGINT) AS max_gap_us,
       CAST(g.sum_gap // g.n_gaps AS BIGINT) AS mean_gap_us
FROM (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) s
JOIN (SELECT user_id, MIN(gap) AS min_gap, MAX(gap) AS max_gap,
             SUM(gap) AS sum_gap, COUNT(*) AS n_gaps
      FROM gaps GROUP BY user_id) g USING (user_id)
""",
    doc="Per-user behavioral features via groupBy().applyInPandas: one "
    "shuffle on user_id, then each group's event sequence is sorted in "
    "pandas and its inter-arrival gaps summarized (count, min/max/mean gap "
    "in integer µs). The oracle recomputes the same features with LAG-based "
    "SQL, pinning both the grouping and the per-group sequence arithmetic. "
    "Mean is floor(sum/n) in exact integers — no float accumulation.",
)
def ml_user_event_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )

    schema = (
        "user_id long, n_events long, min_gap_us long, max_gap_us long, "
        "mean_gap_us long"
    )

    def features(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["us", "event_id"])
        gaps = pdf["us"].diff().dropna().astype("int64")
        if len(gaps) == 0:
            return pd.DataFrame(
                columns=["user_id", "n_events", "min_gap_us", "max_gap_us", "mean_gap_us"]
            )
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "min_gap_us": [int(gaps.min())],
                "max_gap_us": [int(gaps.max())],
                "mean_gap_us": [int(gaps.sum()) // len(gaps)],
            }
        )

    return ev.groupBy("user_id").applyInPandas(features, schema)
