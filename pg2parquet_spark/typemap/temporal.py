"""Temporal conversions: time-of-day µs, and PG `interval` in both modes.

Reference:
- time → µs since midnight (myfrom.rs:80-85; Parquet Time(µs) — Spark has no
  TimeType, so the µs int64 IS our representation; documented deviation).
- interval struct mode → {months:int, days:int, microseconds:long} exactly
  as PG stores it (postgres_cloner.rs:638-653).
- interval INTERVAL mode → 12-byte FLBA, little-endian (months, days,
  millis); µs truncated to ms and whole days overflowed from the time part
  into the day field (datatypes/interval.rs:27-44).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MS_PER_DAY = 1000 * 60 * 60 * 24


def time_to_micros(time_str: Column) -> Column:
    """'HH:MM:SS[.ffffff]' → µs since midnight (int64)."""
    ts = F.to_timestamp(F.concat(F.lit("1970-01-01 "), time_str))
    return F.unix_micros(ts)


def interval_to_struct(months: Column, days: Column, microseconds: Column) -> Column:
    """Lossless struct mode: exactly the three fields PG stores."""
    return F.struct(
        months.cast("int").alias("months"),
        days.cast("int").alias("days"),
        microseconds.cast("long").alias("microseconds"),
    )


def _int32_le_hex(v: Column) -> Column:
    """int32 → 8 hex chars of its little-endian byte order (two's complement).

    Byte-swap as integer arithmetic, then ONE hex()+lpad — not a
    format_string per byte: String.format is the expensive expression in
    this family (4 per int32 × 3 int32s = 12 per row made the interval
    query a 600k-rows-in-seconds affair; hex/lpad/bit ops stay cheap in
    whole-stage codegen).
    """
    b = v.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    swapped = (
        F.shiftleft(b.bitwiseAND(F.lit(255)), 24)
        .bitwiseOR(F.shiftleft(F.shiftright(b, 8).bitwiseAND(F.lit(255)), 16))
        .bitwiseOR(F.shiftleft(F.shiftright(b, 16).bitwiseAND(F.lit(255)), 8))
        .bitwiseOR(F.shiftright(b, 24).bitwiseAND(F.lit(255)))
    )
    return F.lower(F.lpad(F.hex(swapped), 8, "0"))


def interval_to_flba12(months: Column, days: Column, microseconds: Column) -> Column:
    """Parquet INTERVAL 12-byte value, faithful to datatypes/interval.rs:27-44:
    millis_total = µs ÷ 1000 (truncating); whole days move from the millis
    into the day count; all three little-endian int32s concatenated.

    `DIV` truncates toward zero on Spark longs, matching Rust i64 division.
    """
    m_us = microseconds.cast("long")
    millis = (m_us - (m_us % 1000)) / 1000  # exact: subtracting remainder first
    millis = millis.cast("long")
    extra_days = (millis - (millis % _MS_PER_DAY)) / _MS_PER_DAY
    extra_days = extra_days.cast("long")
    millis_rem = millis % _MS_PER_DAY
    total_days = (days.cast("long") + extra_days).cast("int")
    return F.unhex(
        F.concat(
            _int32_le_hex(months.cast("int")),
            _int32_le_hex(total_days),
            _int32_le_hex(millis_rem.cast("int")),
        )
    )
