"""PG `numeric` / `money` conversions — the reference's four numeric modes.

Reference semantics (SURVEY §1.4):
- decimal mode (`datatypes/numeric.rs:12-50`, `postgres_cloner.rs:701-728`):
  rescale to CLI-configured (precision, scale); overflow → NULL (reference
  also warns to stderr); PG `NaN` numeric → NULL ("parquet doesn't support
  NaN, so NULL it is", py-tests/test_basic_types.py:115). The reference
  picks INT32/INT64/BYTE_ARRAY physical storage by precision — Spark's
  Parquet writer applies exactly the same rule for DecimalType, so that
  behavior comes free.
- double/float32 (`datatypes/numeric.rs:81-98`): text round-trip (to_f64 is
  lossy in the reference's decimal library); NaN stays NaN. Spark's
  string→double cast is a correctly-rounded text parse — same result.
- string (`postgres_cloner.rs:735-739`): exact decimal text, NaN → "NaN".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_string(col: Column) -> Column:
    return col.cast("string")


def numeric_to_decimal(col: Column, precision: int = 38, scale: int = 18) -> Column:
    """`numeric` → DecimalType(precision, scale); NaN → NULL; overflow → NULL.

    Spark's non-ANSI decimal cast already returns NULL on overflow, matching
    the reference's NULL-on-overflow (datatypes/numeric.rs:19-28).
    """
    s = _as_string(col)
    # try_cast: NULL on overflow even under ANSI mode (Spark 4 default),
    # matching the reference's overflow→NULL+warn contract.
    return F.when(s == "NaN", F.lit(None)).otherwise(
        s.try_cast(f"decimal({precision},{scale})")
    )


def numeric_to_double(col: Column) -> Column:
    """`numeric` → double via text round-trip; NaN → NaN (numeric.rs:81-98)."""
    return _as_string(col).cast("double")


def numeric_to_float32(col: Column) -> Column:
    """`numeric` → float32 via text round-trip; NaN → NaN."""
    return _as_string(col).cast("float")


def numeric_to_string(col: Column) -> Column:
    """`numeric` → exact text; NaN → 'NaN' (postgres_cloner.rs:735-739)."""
    return _as_string(col)


def money_to_decimal(cents: Column) -> Column:
    """PG `money` arrives as int64 cents → Decimal(18,2)
    (datatypes/money.rs:11-26, postgres_cloner.rs:596).

    cents * 0.01 in decimal space is exact (scale arithmetic, no division).
    """
    return (cents.cast("decimal(16,0)") * F.lit("0.01").cast("decimal(3,2)")).cast(
        "decimal(18,2)"
    )
