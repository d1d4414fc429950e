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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
