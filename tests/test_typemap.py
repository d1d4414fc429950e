"""Typemap semantics tests — the reference's load-bearing fixtures (§1.5).

Mirrors the reference's multi-reader round-trip pattern
(py-tests/test_arrays.py, test_custom_types.py, test_pgvector.py): write
Parquet through our sink, read back with BOTH Spark and an independent
reader (DuckDB / pyarrow), assert the nullability trifecta and struct
semantics survive byte-for-byte.
"""

from __future__ import annotations

import glob
import struct as pystruct

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StructField,
    StructType,
)

from pg2parquet_spark.export import export
from pg2parquet_spark.options import ExportOptions
from pg2parquet_spark.typemap.enums import enum_to_int
from pg2parquet_spark.typemap.numeric import money_to_decimal, numeric_to_decimal, numeric_to_string
from pg2parquet_spark.typemap.pgvector import parse_sparsevec, parse_vector
from pg2parquet_spark.typemap.ranges import parse_range
from pg2parquet_spark.typemap.temporal import interval_to_flba12, time_to_micros


# ----------------------------------------------------- §1.5 null trifecta --
def test_empty_vs_null_vs_null_element_arrays(spark, tmp_path):
    """[] ≠ NULL ≠ [NULL] must survive the full write/read cycle
    (reference: appenders/array.rs:98-115; py-tests/test_pgvector.py:73-79)."""
    schema = StructType(
        [
            StructField("id", IntegerType(), False),
            StructField("arr", ArrayType(IntegerType(), containsNull=True), True),
        ]
    )
    rows = [(1, []), (2, None), (3, [None]), (4, [7, None, 9])]
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "trifecta.parquet")
    export(df, out, ExportOptions(compression="snappy"))

    got = {r.id: r.arr for r in spark.read.parquet(out).collect()}
    assert got[1] == []
    assert got[2] is None
    assert got[3] == [None]
    assert got[4] == [7, None, 9]

    con = duckdb.connect()
    dd = {
        r[0]: r[1]
        for r in con.execute(f"SELECT id, arr FROM '{out}/*.parquet'").fetchall()
    }
    assert dd[1] == []
    assert dd[2] is None
    assert dd[3] == [None]
    assert dd[4] == [7, None, 9]


def test_null_struct_vs_struct_of_nulls(spark, tmp_path):
    """NULL struct ≠ struct of NULL fields (reference:
    py-tests/test_custom_types.py:144-147)."""
    df = spark.range(2).select(
        F.col("id").cast("int").alias("id"),
        F.when(
            F.col("id") == 0,
            F.struct(F.lit(None).cast("int").alias("a"), F.lit(None).cast("string").alias("b")),
        ).alias("s"),
    )
    out = str(tmp_path / "structs.parquet")
    export(df, out, ExportOptions(compression="snappy"))
    got = {r.id: r.s for r in spark.read.parquet(out).collect()}
    assert got[0] is not None and got[0].a is None and got[0].b is None
    assert got[1] is None
    con = duckdb.connect()
    dd = dict(con.execute(f"SELECT id, s FROM '{out}/*.parquet'").fetchall())
    assert dd[0] == {"a": None, "b": None}
    assert dd[1] is None


# ------------------------------------------------------------ range parse --
@pytest.mark.parametrize(
    "text,expected",
    [
        ("empty", (None, None, False, False, True)),
        ("[1,3)", (1, 3, True, False, False)),
        ("(,)", (None, None, False, False, False)),
        ("(,5]", (None, 5, False, True, False)),
        ("[-2,)", (-2, None, True, False, False)),
        (None, None),
    ],
)
def test_parse_range_int(spark, text, expected):
    df = spark.createDataFrame([(text,)], "r string").select(
        parse_range(F.col("r"), lambda c: c.cast("int")).alias("s")
    )
    row = df.collect()[0].s
    if expected is None:
        assert row is None
    else:
        assert tuple(row) == expected


def test_parse_range_quoted_timestamp_bounds(spark):
    df = spark.createDataFrame(
        [('["2020-01-01 00:00:00","2021-06-30 12:00:00")',)], "r string"
    ).select(parse_range(F.col("r"), lambda c: c.cast("timestamp_ntz")).alias("s"))
    s = df.collect()[0].s
    assert str(s.lower) == "2020-01-01 00:00:00"
    assert str(s.upper) == "2021-06-30 12:00:00"
    assert s.lower_inclusive and not s.upper_inclusive and not s.is_empty


# --------------------------------------------------------------- pgvector --
def test_parse_vector_trifecta(spark):
    df = spark.createDataFrame(
        [(1, "[1.5,2,3]"), (2, "[]"), (3, None)], "id int, v string"
    ).select("id", parse_vector(F.col("v")).alias("v"))
    got = {r.id: r.v for r in df.collect()}
    assert got[1] == [1.5, 2.0, 3.0]
    assert got[2] == []
    assert got[3] is None


def test_parse_sparsevec_one_based(spark):
    df = spark.createDataFrame(
        [(1, "{1:0.5,4:2}/6"), (2, "{}/4"), (3, None)], "id int, v string"
    ).select("id", parse_sparsevec(F.col("v")).alias("s"))
    got = {r.id: r.s for r in df.collect()}
    assert got[1].entries == {1: 0.5, 4: 2.0}
    assert got[1].dim == 6
    assert got[2].entries == {}
    assert got[3] is None


# ------------------------------------------------------- interval FLBA(12) --
@pytest.mark.parametrize(
    "months,days,us",
    [
        (1, 2, 3_600_000_123),        # 1h +123µs → truncate to ms
        (0, 0, 90_000_000_000),       # 25h → 1 day overflow + 1h millis
        (-1, -2, -3_600_000_000),     # negative components
        (0, 0, 0),
    ],
)
def test_interval_flba12_layout(spark, months, days, us):
    """Byte layout must match datatypes/interval.rs:27-44: little-endian
    (months, days+overflow, millis%day) int32s."""
    ms_total = int(us / 1000) if us >= 0 else -(abs(us) // 1000)
    extra_days = int(ms_total / 86_400_000)
    ms = ms_total - extra_days * 86_400_000
    expected = pystruct.pack("<iii", months, days + extra_days, ms).hex()
    df = spark.createDataFrame([(months, days, us)], "m int, d int, us long").select(
        F.lower(F.hex(interval_to_flba12(F.col("m"), F.col("d"), F.col("us")))).alias("h")
    )
    assert df.collect()[0].h == expected


# ------------------------------------------------------------ scalar modes --
def test_numeric_nan_contracts(spark):
    df = spark.createDataFrame([("NaN",), ("12.5",), (None,)], "n string").select(
        numeric_to_decimal(F.col("n"), 10, 2).alias("dec"),
        numeric_to_string(F.col("n")).alias("s"),
    )
    rows = df.collect()
    assert rows[0].dec is None and rows[0].s == "NaN"   # NaN→NULL (decimal), 'NaN' (string)
    assert str(rows[1].dec) == "12.50"
    assert rows[2].dec is None and rows[2].s is None


def test_decimal_overflow_nulls(spark):
    df = spark.createDataFrame([("123456789012",)], "n string").select(
        numeric_to_decimal(F.col("n"), 10, 2).alias("dec")
    )
    assert df.collect()[0].dec is None  # > precision → NULL + warn in reference


def test_money_exact_cents(spark):
    df = spark.createDataFrame([(199,), (-50,), (None,)], "c long").select(
        money_to_decimal(F.col("c")).alias("m")
    )
    vals = [r.m for r in df.collect()]
    assert str(vals[0]) == "1.99" and str(vals[1]) == "-0.50" and vals[2] is None


def test_enum_ordinal_one_based(spark):
    labels = ["happy", "ok", "sad"]
    df = spark.createDataFrame(
        [("happy",), ("sad",), ("unknown",), (None,)], "e string"
    ).select(enum_to_int(F.col("e"), labels).alias("o"))
    assert [r.o for r in df.collect()] == [1, 3, None, None]


def test_time_to_micros(spark):
    df = spark.createDataFrame([("13:45:30.123456",), ("00:00:00",)], "t string").select(
        time_to_micros(F.col("t")).alias("us")
    )
    got = [r.us for r in df.collect()]
    assert got == [(13 * 3600 + 45 * 60 + 30) * 1_000_000 + 123_456, 0]
