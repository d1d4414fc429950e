"""Export sink + options + CLI tests (SURVEY A5-A8 semantics)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pg2parquet_spark.export import export, export_query
from pg2parquet_spark.options import ExportOptions
from pg2parquet_spark.sources.jdbc import (
    PostgresConnection,
    quote_ident,
    rewrite_query_for_exotics,
    table_query,
)
from pg2parquet_spark.tables import register_views, table


@pytest.mark.parametrize("codec", ["zstd", "snappy", "gzip", "none", "lz4"])
def test_roundtrip_codecs(spark, sf_dir, tmp_path, codec):
    df = table(spark, sf_dir, "nation")
    out = str(tmp_path / f"n_{codec}.parquet")
    export(df, out, ExportOptions(compression=codec))
    back = spark.read.parquet(out)
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in df.collect()
    )


def test_lzo_rejected():
    with pytest.raises(ValueError, match="not supported by Spark"):
        ExportOptions(compression="lzo").spark_codec


def test_precision_over_38_rejected():
    with pytest.raises(ValueError, match="string"):
        ExportOptions(decimal_precision=76)


def test_single_file_preserves_order(spark, sf_dir, tmp_path):
    # SURVEY §7.2 ordering trap: sort → coalesce(1) → one ordered file
    df = table(spark, sf_dir, "orders").orderBy("o_orderkey")
    out = str(tmp_path / "ordered.parquet")
    export(df, out, ExportOptions(single_file=True))
    files = [f for f in glob.glob(out + "/*.parquet")]
    assert len(files) == 1
    keys = [r.o_orderkey for r in spark.read.parquet(out).collect()]
    assert keys == sorted(keys)


def test_decimal_physical_widths(spark, tmp_path):
    """The reference picks INT32/INT64/BYTE_ARRAY physical storage by decimal
    precision (postgres_cloner.rs:706-712); Spark's writer must do the same."""
    df = spark.range(3).select(
        F.lit("123.45").cast("decimal(9,4)").alias("d32"),
        F.lit("123.45").cast("decimal(18,9)").alias("d64"),
        F.lit("123.45").cast("decimal(38,18)").alias("dbytes"),
    )
    out = str(tmp_path / "dec.parquet")
    export(df, out, ExportOptions(compression="snappy"))
    pf = pq.ParquetFile(glob.glob(out + "/*.parquet")[0])
    phys = {c.name: c.physical_type for c in pf.schema}
    assert phys["d32"] == "INT32"
    assert phys["d64"] == "INT64"
    assert phys["dbytes"] == "FIXED_LEN_BYTE_ARRAY"  # spark uses FLBA for wide decimals


def test_row_group_size_applied(spark, sf_dir, tmp_path):
    df = table(spark, sf_dir, "lineitem").coalesce(1)
    out = str(tmp_path / "rg.parquet")
    export(df, out, ExportOptions(row_group_bytes=64 * 1024, single_file=True))
    pf = pq.ParquetFile(glob.glob(out + "/*.parquet")[0])
    assert pf.num_row_groups > 1  # 64 KiB groups → many groups for 6k rows


def test_export_query_over_views(spark, sf_dir, tmp_path):
    register_views(spark, sf_dir, ["region"])
    out = str(tmp_path / "q.parquet")
    df = export_query(spark, "SELECT r_name FROM region WHERE r_regionkey < 2", out)
    assert df.count() == 2
    assert spark.read.parquet(out).count() == 2


# ------------------------------------------------------------- jdbc (pure) --
def test_quote_ident():
    assert quote_ident("t") == '"t"'
    assert quote_ident("public.my table") == '"public"."my table"'
    assert quote_ident('we"ird') == '"we""ird"'
    assert table_query("s.t") == 'SELECT * FROM "s"."t"'


def test_connection_precedence(monkeypatch):
    monkeypatch.delenv("DATABASE_URL", raising=False)
    monkeypatch.delenv("POSTGRES_URL", raising=False)
    c = PostgresConnection(host="h", dbname="d", user="u")
    assert c.resolve_url() == "jdbc:postgresql://h:5432/d"
    monkeypatch.setenv("DATABASE_URL", "postgres://x/db")
    assert PostgresConnection().resolve_url() == "jdbc:postgresql://x/db"
    with pytest.raises(ValueError):
        monkeypatch.delenv("DATABASE_URL")
        PostgresConnection(host="h").resolve_url()
    monkeypatch.setenv("PGPASSWORD", "sekret")
    assert PostgresConnection(host="h", dbname="d").properties()["password"] == "sekret"


def test_rewrite_query_for_exotics():
    q = rewrite_query_for_exotics(
        "SELECT * FROM t",
        ["id", "mood", "span", "grid"],
        {"mood": "enum", "span": "range", "grid": "multidim_array"},
    )
    assert '(q."mood")::text AS "mood"' in q
    assert '(q."span")::text AS "span"' in q
    assert 'array_dims(q."grid") AS "grid__dims"' in q
    assert 'q."id"' in q
    assert q.endswith("FROM (SELECT * FROM t) q")


# --------------------------------------------------------------------- cli --
def test_cli_export_fixture_mode(spark, sf_dir, tmp_path):
    from pg2parquet_spark.cli import main

    out = str(tmp_path / "cli_out.parquet")
    rc = main([
        "export", "-o", out, "--input-dir", sf_dir,
        "-q", "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 7",
        "--compression", "snappy", "--single-file", "--quiet",
    ])
    assert rc == 0
    assert spark.read.parquet(out).count() == 7


def test_cli_rejects_query_and_table():
    from pg2parquet_spark.cli import build_parser

    with pytest.raises(SystemExit):
        build_parser().parse_args(["export", "-o", "x", "-q", "a", "-t", "b"])
