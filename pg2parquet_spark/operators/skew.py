"""Skew mitigation utilities.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on in session.py)
handles most sort-merge skew at runtime. These helpers cover the cases AQE
can't: broadcast-ineligible dimension joins against a fact table whose join
key is pathologically hot, and hot-key aggregations.

- `salted_join`: replicate the small side N ways (explode over salt ids),
  salt the large side's key with a deterministic hash-mod, equi-join on
  (key, salt). The hot key's rows spread over N tasks instead of one.
  Result is row-identical to the plain join (verified in tests).
- `two_phase_agg`: pre-aggregate on (key, salt) then re-aggregate on key —
  the classic two-stage combine for hot-key groupBys whose partial
  aggregation alone can't keep up (e.g. collect-like or high-cardinality
  distinct states per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pg2parquet_spark.registry import register
from pg2parquet_spark.tables import table


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` to ``small`` on ``key`` with the small side replicated
    across ``n_salts`` salt buckets.

    The salt is a deterministic hash of the large row's whole tuple mod
    n_salts, so a single hot key fans out over n_salts tasks. Output columns
    = large's ∪ small's (minus the duplicate key), like a plain equi-join.
    """
    salt = (F.abs(F.hash(*[F.col(c) for c in large.columns])) % n_salts).alias("_salt")
    salted_large = large.withColumn("_salt", salt)
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_large.join(replicated, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """SUM(agg_col) GROUP BY key, executed as two shuffles: (key, salt) then
    key. Use when one key dominates and a single hash-agg task becomes the
    straggler; the first phase bounds any task's group size to ~1/n_salts."""
    salt = (F.abs(F.hash(*[F.col(c) for c in df.columns])) % n_salts).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(agg_col).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(f"sum_{agg_col}"))


# --------------------------------------------------- oracle-gated queries --
# The point of both gates: salting/two-phase must be SEMANTICS-INVISIBLE —
# the oracle is the plain join / plain GROUP BY, with no salt anywhere.


@register(
    "q_salted_join",
    oracle="""
SELECT s.s_nationkey,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
""",
    doc="Skew-mitigated dimension join: lineitem⋈supplier through "
    "salted_join (small side exploded over 8 salt buckets, large side's key "
    "salted by a deterministic row hash) then a per-nation aggregate. The "
    "oracle is the PLAIN unsalted join — salting must not change a single "
    "row. This is the AQE-can't-help case: a broadcast-ineligible dim whose "
    "fact-side key is pathologically hot spreads over n_salts tasks instead "
    "of one straggler. Plan-tested to carry the salt explode "
    "(tests/test_plans.py).",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    sup = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, sup, "l_suppkey", n_salts=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
    )


@register(
    "q_two_phase_agg",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Hot-key aggregation through two_phase_agg: SUM per l_returnflag "
    "(3 distinct values over all of lineitem — maximal key skew) executed "
    "as (key, salt) partials then a key-level re-sum. The oracle is the "
    "plain one-shot GROUP BY — the two-phase rewrite must be invisible. "
    "Decimal arithmetic keeps both phases exact, so the salt-bucket "
    "summation order cannot drift the result. Plan-tested to contain both "
    "exchanges (tests/test_plans.py).",
)
def q_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("decimal(12,2)").alias("qty")
    )
    out = two_phase_agg(li, "l_returnflag", "qty", n_salts=8)
    return out.select(
        "l_returnflag", F.col("sum_qty").cast("double").alias("sum_qty")
    )
