"""Temporal join operators Spark lacks as built-ins: as-of join and range join.

The reference inherits these from PostgreSQL SQL (correlated subqueries /
inequality joins run server-side, SURVEY.md §2.B); Spark has no ASOF JOIN
operator and executes a pure inequality join as BroadcastNestedLoopJoin —
O(n·m) and driver-limited. Both are re-expressed here as compositions of
built-in DataFrame ops with scale-safe shapes:

- **as-of join** (`q_asof_join`): tag left/right rows, union, one window
  sorted by (ts, side) per key, `last(value, ignorenulls)` carries the most
  recent right-side value forward. ONE shuffle on the join key, no
  inequality join at all — the canonical distributed as-of shape (same idea
  as Flink's event-time temporal join). Right side is pre-aggregated per
  (key, ts) so ties are deterministic in both engines.

- **range join** (`q_range_join_binned`): bin both sides into fixed windows
  the width of the range predicate, explode the probe side into the 2
  candidate bins, equi-join on the bin, then apply the exact range filter.
  Turns the O(n·m) band join into a near-linear equi-shuffle whose key is
  the bin — the standard trick behind "range join optimization" in
  warehouse engines. Bin width = band width keeps candidates ≤ 2× true
  matches regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pg2parquet_spark.registry import register
from pg2parquet_spark.tables import table

# five-minute band for the range join (seconds / microseconds)
_BAND_S = 300
_BAND_US = _BAND_S * 1_000_000


@register(
    "q_asof_join",
    oracle="""
WITH v AS (
  SELECT user_id, ts, MAX(value) AS view_value
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
),
p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, v.view_value AS last_view_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
""",
    doc="As-of join: each purchase gets the value of the same user's most recent "
    "view at-or-before it (NULL if none). Spark side is the union+window shape — "
    "one shuffle on user_id, no inequality join; oracle is DuckDB's native ASOF "
    "JOIN. Right side pre-aggregated per (user_id, ts) so >=-ties are "
    "deterministic in both engines.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts",
            F.lit(1).alias("is_view"),
            "view_value",
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(0).alias("is_view"),
        F.lit(None).cast("double").alias("view_value"),
    )
    # at equal ts the view row must sort BEFORE the purchase row (>= semantics)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_view").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        views.unionAll(purchases)
        .withColumn("last_view_value", F.last("view_value", ignorenulls=True).over(w))
        .filter(F.col("is_view") == 0)
        .select("event_id", "user_id", "last_view_value")
    )


@register(
    "q_range_join_binned",
    oracle=f"""
WITH e AS (SELECT event_id, ts FROM events WHERE event_type = 'error'),
     c AS (SELECT ts FROM events WHERE event_type = 'click')
SELECT e.event_id, COUNT(*) AS n_prior_clicks
FROM e JOIN c ON c.ts >= e.ts - INTERVAL {_BAND_S} SECOND AND c.ts < e.ts
GROUP BY e.event_id
""",
    doc="Range (band) join: clicks in the 5 minutes before each error, across all "
    "users — no equi-key, so a naive Spark plan is a nested-loop cross join. "
    "Implemented as a binned equi-join: bin width = band width, probe side "
    "explodes into its 2 candidate bins, exact filter after the equi-join. "
    "Oracle is DuckDB's native inequality (IE) join.",
)
def q_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # epoch µs for exact range arithmetic (session tz is UTC; ts is NTZ)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        us.alias("c_us")
    ).withColumn("bin", F.expr(f"c_us DIV {_BAND_US}"))
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", us.alias("e_us")
    )
    # [e_us - BAND, e_us) overlaps exactly bins floor(e/B)-1 and floor(e/B)
    e_bin = F.expr(f"e_us DIV {_BAND_US}")
    probe = errors.select(
        "event_id",
        "e_us",
        F.explode(F.array(e_bin - 1, e_bin)).alias("bin"),
    )
    return (
        probe.join(clicks, "bin")
        .filter((F.col("c_us") >= F.col("e_us") - _BAND_US) & (F.col("c_us") < F.col("e_us")))
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_prior_clicks"))
    )
