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


# ---------------------------------------------------------- file sources --
def test_csv_json_source_roundtrip(spark, sf_dir, tmp_path):
    """CSV and JSON fixtures register as views and answer the same query as
    the parquet original."""
    from pg2parquet_spark.sources.files import read_table, register_file_views

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    src = tmp_path / "src"
    nation.coalesce(1).write.option("header", "true").csv(str(src / "nation.csv"))
    nation.coalesce(1).write.json(str(src / "supplier_j.json"))

    names = register_file_views(spark, str(src))
    assert names == ["nation", "supplier_j"]
    got = spark.sql("SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey")
    want = nation.select("n_nationkey", "n_name").orderBy("n_nationkey")
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in want.collect()]
    assert read_table(spark, str(src / "supplier_j.json")).count() == nation.count()


def test_partitioned_export_prunes(spark, sf_dir, tmp_path):
    """partition_by writes hive layout; a filtered read back prunes to one
    partition directory and values survive."""
    import os

    from pg2parquet_spark.export import export
    from pg2parquet_spark.options import ExportOptions

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = str(tmp_path / "byflag")
    export(li, out, ExportOptions(partition_by=("l_returnflag",)))
    subdirs = {d for d in os.listdir(out) if d.startswith("l_returnflag=")}
    assert subdirs == {
        f"l_returnflag={r[0]}" for r in li.select("l_returnflag").distinct().collect()
    }
    back = spark.read.parquet(out).filter("l_returnflag = 'R'")
    assert back.count() == li.filter("l_returnflag = 'R'").count()
    # the partition filter must prune at planning time, not post-scan
    assert "PartitionFilters: [isnotnull(l_returnflag" in back._jdf.queryExecution().toString() or \
           "l_returnflag" in str(back._jdf.queryExecution().executedPlan())


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key join WITHOUT an exchange — the
    co-located-storage pattern for repeatedly-joined fact tables at scale."""
    from pg2parquet_spark.export import export_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        export_bucketed(li.select("l_orderkey", "l_quantity"), "b_li", ["l_orderkey"], 8)
        export_bucketed(
            orders.select("o_orderkey", "o_totalprice"), "b_orders", ["o_orderkey"], 8
        )
        joined = spark.table("b_li").join(
            spark.table("b_orders"),
            spark.table("b_li").l_orderkey == spark.table("b_orders").o_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join should not shuffle:\n{plan}"
        assert joined.count() == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_li")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_export_csv_format(spark, sf_dir, tmp_path):
    from pg2parquet_spark.export import export
    from pg2parquet_spark.options import ExportOptions

    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    out = str(tmp_path / "region_csv")
    export(region, out, ExportOptions(output_format="csv", single_file=True))
    back = (
        spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    )
    assert sorted(r.r_name for r in back.collect()) == sorted(
        r.r_name for r in region.collect()
    )


# ------------------------------------------------------------ skew + sort --
def test_salted_join_matches_plain_join(spark, sf_dir):
    from pg2parquet_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ).withColumnRenamed("l_orderkey", "k")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "k")
    got = salted_join(li, orders, "k", n_salts=7)
    want = li.join(orders, "k")
    key = lambda r: (r["k"], r["l_linenumber"])
    assert sorted([r.asDict() for r in got.collect()], key=lambda d: (d["k"], d["l_linenumber"])) == \
           sorted([r.asDict() for r in want.collect()], key=lambda d: (d["k"], d["l_linenumber"]))


def test_two_phase_agg_matches_plain(spark, sf_dir):
    from pyspark.sql import functions as F

    from pg2parquet_spark.operators.skew import two_phase_agg

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", F.col("l_quantity").cast("decimal(12,2)").alias("q")
    )
    got = {
        r.l_returnflag: r.sum_q
        for r in two_phase_agg(li, "l_returnflag", "q", n_salts=5).collect()
    }
    want = {
        r.l_returnflag: r.s
        for r in li.groupBy("l_returnflag").agg(F.sum("q").alias("s")).collect()
    }
    assert got == want


def test_sorted_multifile_export_global_order(spark, sf_dir, tmp_path):
    """sort_by without single_file: range-partitioned write → many files,
    globally ordered (file N's max key <= file N+1's min key)."""
    import glob

    import pyarrow.parquet as pq

    from pg2parquet_spark.export import export
    from pg2parquet_spark.options import ExportOptions

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(8)
    out = str(tmp_path / "sorted_many")
    # sf0.001 fits one AQE-coalesced partition; disable coalescing so the
    # range partitioner keeps several — at real scale the files are many
    # because the data is, no conf needed
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        export(li, out, ExportOptions(sort_by=("l_orderkey",), compression="snappy"))
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) > 1, "expected a multi-file range-partitioned write"
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["l_orderkey"])
        keys = t.column(0).to_pylist()
        assert keys == sorted(keys), f"file {f} not internally sorted"
        ranges.append((keys[0], keys[-1]))
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"files overlap: {hi1} > {lo2}"


def test_audit_conversions(spark):
    """A37 analog: the audit reports NULLed conversions with a sample value."""
    from pyspark.sql import functions as F

    from pg2parquet_spark.audit import audit_conversions

    df = spark.createDataFrame(
        [("1", "x"), ("2", "9999999999"), (None, "3"), ("oops", "4")],
        ["a", "b"],
    )
    report = audit_conversions(
        df,
        {
            "a_int": (F.col("a"), F.col("a").try_cast("int")),
            "b_short": (F.col("b"), F.col("b").try_cast("smallint")),
        },
    )
    rows = {r.column: r for r in report.collect()}
    assert rows["a_int"].n_rows == 4
    assert rows["a_int"].n_source_nonnull == 3
    assert rows["a_int"].n_nulled == 1
    assert rows["a_int"].sample_bad == "oops"
    assert rows["b_short"].n_nulled == 2
    assert rows["b_short"].sample_bad in {"x", "9999999999"}


def test_compact_small_files(spark, sf_dir, tmp_path):
    from pg2parquet_spark.export import compact, export
    from pg2parquet_spark.options import ExportOptions

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = str(tmp_path / "fragmented")
    export(li.repartition(24), out, ExportOptions(compression="snappy"))
    assert len(glob.glob(f"{out}/*.parquet")) == 24
    n = compact(spark, out, target_file_mb=512)
    assert n == 1  # sf0.001 lineitem ≪ 512 MB
    assert spark.read.parquet(out).count() == li.count()


def test_parquet_info_and_write_stats(spark, sf_dir, tmp_path):
    """A36/A38 tooling: the info dump names schema+row groups; stats count
    rows/bytes/files like the reference's summary meter."""
    import time

    from pg2parquet_spark.parquetinfo import parquet_info, write_stats

    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    out = str(tmp_path / "info.parquet")
    export(region, out, ExportOptions(compression="snappy", single_file=True))
    info = parquet_info(out)
    assert "r_name" in info and "row group 0" in info and "rows=5" in info
    stats = write_stats(out, time.time() - 1.0)
    assert stats.rows == 5 and stats.files == 1 and stats.row_groups == 1
    assert "5 rows" in str(stats)


def test_salted_left_join_keeps_unmatched(spark):
    """Left salted join must keep unmatched large-side rows exactly once."""
    from pg2parquet_spark.operators.skew import salted_join

    large = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], "k int, v string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    got = sorted(
        (r.k, r.v, r.w) for r in salted_join(large, small, "k", n_salts=4, how="left").collect()
    )
    assert got == [(1, "a", "x"), (2, "b", "y"), (99, "zz", None)]
