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


def test_exotic_rewrite_chains_into_typemap_parsers(spark):
    """End-to-end JDBC exotic path without a live PG (SURVEY §7.3 step 4):
    rewrite_query_for_exotics ships every exotic column as ::text; this
    fixture is shaped exactly like the JDBC result of that rewritten query,
    and each text column must rebuild its struct through the typemap parsers
    — all five exotic kinds (enum, range, composite, vector+sparsevec,
    multidim array)."""
    from pyspark.sql import functions as F

    from pg2parquet_spark.typemap.arrays import flatten_with_dims
    from pg2parquet_spark.typemap.composites import parse_composite_fast
    from pg2parquet_spark.typemap.enums import enum_to_int
    from pg2parquet_spark.typemap.pgvector import parse_sparsevec, parse_vector
    from pg2parquet_spark.typemap.ranges import parse_range

    cols = ["id", "mood", "span", "addr", "emb", "semb", "grid"]
    exotics = {
        "mood": "enum",
        "span": "range",
        "addr": "composite",
        "emb": "vector",
        "semb": "sparsevec",
        "grid": "multidim_array",
    }
    q = rewrite_query_for_exotics("SELECT * FROM t", cols, exotics)
    # the rewritten query's output column list == the fixture's columns
    for c in cols:
        assert f'"{c}"' in q
    assert '"grid__dims"' in q

    jdbc_shaped = spark.createDataFrame(
        [
            (1, "happy", "[2,5)", "(main st,42)", "[1,2.5]", "{1:0.5,3:2}/4",
             "{{1,2},{3,4}}", "[0:1][1:2]"),
            (2, "sad", "empty", None, "[]", "{}/4", None, None),
        ],
        "id long, mood string, span string, addr string, emb string, "
        "semb string, grid string, grid__dims string",
    )
    # PG array text '{{1,2},{3,4}}' → nested arrays; lower bounds from dims
    nested = F.from_json(
        F.translate("grid", "{}", "[]"), "array<array<bigint>>"
    )
    lb = F.when(
        F.col("grid__dims").isNotNull(),
        F.transform(
            F.regexp_extract_all("grid__dims", F.lit(r"\[(-?\d+):"), 1),
            lambda x: x.cast("int"),
        ),
    )
    parsed = jdbc_shaped.select(
        "id",
        enum_to_int(F.col("mood"), ["happy", "sad"]).alias("mood"),
        parse_range(F.col("span"), lambda c: c.cast("int")).alias("span"),
        parse_composite_fast(
            F.col("addr"), ["street", "num"], [lambda c: c, lambda c: c.cast("int")]
        ).alias("addr"),
        parse_vector(F.col("emb")).alias("emb"),
        parse_sparsevec(F.col("semb")).alias("semb"),
        flatten_with_dims(nested, 2, "dims-lb", lower_bound=lb).alias("grid"),
    )
    r1, r2 = parsed.orderBy("id").collect()
    assert r1.mood == 1 and r2.mood == 2
    assert r1.span.asDict() == {
        "lower": 2, "upper": 5, "lower_inclusive": True,
        "upper_inclusive": False, "is_empty": False,
    }
    assert r2.span.is_empty is True
    assert r1.addr.street == "main st" and r1.addr.num == 42
    assert r2.addr is None  # NULL composite ≠ struct of NULLs
    assert r1.emb == [1.0, 2.5]
    assert r2.emb == []  # '[]' ≠ NULL
    assert r1.semb.entries == {1: 0.5, 3: 2.0} and r1.semb.dim == 4
    assert r2.semb.entries == {} and r2.semb.dim == 4
    assert r1.grid.data == [1, 2, 3, 4]
    assert r1.grid.dims == [2, 2]
    assert r1.grid.lower_bound == [0, 1]  # server-side array_dims preserved
    assert r2.grid is None


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


def test_export_audited_identifies_error_row(spark, tmp_path):
    """A37 (ref cli/src/postgresutils.rs:4-51): a failing export names the
    offending column AND the first identifiable key of the offending row."""
    from pyspark.sql import functions as F

    from pg2parquet_spark.export import ConversionError, export_audited

    df = spark.createDataFrame(
        [(1, "10.5"), (2, "not-a-number"), (3, "3.25")], ["id", "raw"]
    )
    conversions = {"price": (F.col("raw"), F.col("raw").try_cast("double"))}
    with pytest.raises(ConversionError) as exc:
        export_audited(df, str(tmp_path / "out"), conversions)
    msg = str(exc.value)
    assert "'price'" in msg and "'not-a-number'" in msg and "id=2" in msg
    assert not (tmp_path / "out").exists()  # aborted before writing

    # capture mode: write anyway, return the bad-row report
    report = export_audited(
        df, str(tmp_path / "out2"), conversions, fail_on_nulled=False
    )
    rows = report.collect()
    assert len(rows) == 1 and rows[0].row_id == 2 and rows[0].bad_value == "not-a-number"
    back = spark.read.parquet(str(tmp_path / "out2"))
    assert back.filter(F.col("price").isNull()).count() == 1


def test_float16_mode_emits_flba2(spark, tmp_path):
    """A35: float16_handling='float16' + named columns → the parquet files
    carry the FLOAT16 logical type (FLBA-2), scalar and halfvec-list alike.
    MULTI-file on purpose: the narrowing pass ships the file list to
    executors (one Spark task per file — `_rewrite_one_float16` RAISES if it
    ever runs driver-side via its TaskContext guard), so a 3-file dataset
    proves the distributed path rewrites every file, not just the first."""
    df = spark.createDataFrame(
        [(1, 1.5, [0.5, 2.25]), (2, -3.0, [1.0]), (3, 0.25, [4.0])],
        "id long, val float, emb array<float>",
    ).repartition(3)
    out = str(tmp_path / "f16")
    export(
        df,
        out,
        ExportOptions(
            float16_handling="float16",
            float16_columns=("val", "emb"),
            compression="zstd",
        ),
        quiet=True,
    )
    files = glob.glob(f"{out}/*.parquet")
    # multi-file: every file must get the rewrite (AQE may coalesce 3→2)
    assert len(files) >= 2
    for f in files:
        schema = str(pq.ParquetFile(f).schema)
        assert schema.count("fixed_len_byte_array(2)") == 2
        assert "(Float16)" in schema
    back = pq.read_table(out).sort_by("id")
    # f16-representable values survive the round trip exactly
    assert [float(x.as_py()) for x in back["val"]] == [1.5, -3.0, 0.25]


def test_float16_mode_requires_columns():
    """The float16 flag must never be silently ignored."""
    with pytest.raises(ValueError, match="float16_columns"):
        ExportOptions(float16_handling="float16")


def test_progress_reporter_emits_during_write(spark, sf_dir, tmp_path):
    """A36: the live meter reports MiB written + MiB/s while export() runs
    (ref cli/src/parquet_writer.rs:100-151); quiet=True suppresses it."""
    from pg2parquet_spark.progress import ProgressReporter

    lines: list[str] = []
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = str(tmp_path / "metered")
    with ProgressReporter(spark, out, interval_s=0.05, sink=lines.append):
        export(li, out, ExportOptions(compression="snappy"), quiet=True)
    assert lines, "reporter emitted nothing"
    assert all("MiB written" in l and "MiB/s" in l for l in lines)
    assert "done" in lines[-1]  # final summary line
    # the final tick sees the committed bytes
    assert any(not l.split("MiB written")[0].rstrip().endswith(" 0.0") for l in lines)


def test_export_default_meter_on_stderr(spark, sf_dir, tmp_path, capsys):
    li = spark.read.parquet(f"{sf_dir}/region.parquet")
    export(li, str(tmp_path / "loud"))  # default: meter on
    assert "[export]" in capsys.readouterr().err
    export(li, str(tmp_path / "silent"), quiet=True)
    assert "[export]" not in capsys.readouterr().err


def test_first_identifiable_column_skips_binary(spark):
    from pg2parquet_spark.audit import first_identifiable_column

    df = spark.createDataFrame([(b"\x00", 7, "x")], "blob binary, k long, s string")
    assert first_identifiable_column(df) == "k"


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


def test_compact_via_filesystem_uri(spark, sf_dir, tmp_path):
    """compact() resolves the FileSystem from the path's own scheme — an
    explicit file:// URI must work identically (the HDFS/S3 code path)."""
    from pg2parquet_spark.export import compact, export
    from pg2parquet_spark.options import ExportOptions

    ords = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = f"file://{tmp_path}/fragmented_uri"
    export(ords.repartition(8), out, ExportOptions(compression="snappy"))
    n = compact(spark, out, target_file_mb=512)
    assert n == 1
    assert spark.read.parquet(out).count() == ords.count()
    assert not (tmp_path / "fragmented_uri._compact_tmp").exists()


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


def test_progress_probe_is_incremental(spark, tmp_path):
    """The byte probe must cache committed-file sizes: a second tick over an
    unchanged dataset re-sizes ZERO files, and the listing count tracks
    directories, not files — the per-tick cost that matters on an object
    store where the old getContentSummary shape was a full recursive walk
    of everything written so far."""
    from pg2parquet_spark.progress import ProgressReporter

    df = spark.range(1000).withColumnRenamed("id", "v").repartition(6)
    out = str(tmp_path / "probe")
    df.write.mode("overwrite").parquet(out)

    rep = ProgressReporter(spark, out)
    total1 = rep._bytes_written()
    first = dict(rep.last_probe)
    total2 = rep._bytes_written()
    second = dict(rep.last_probe)

    assert total1 == total2 > 0
    assert first["files_new"] > 0
    assert second["files_new"] == 0  # every committed size served from cache
    assert second["files_cached"] == first["files_new"] + first["files_cached"]
    assert second["dirs_listed"] == 1  # flat dataset: one LIST RPC per tick


def test_compact_partitioned_preserves_layout(spark, tmp_path):
    """Partition-wise compaction: per-leaf file counts drop, the key=value
    layout survives, and the data reads back identically. Flat compact()
    must keep rejecting the partitioned root."""
    from pg2parquet_spark.export import compact, compact_partitioned

    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 3).alias("p"), (F.col("id") * 2).alias("v")
    )
    out = str(tmp_path / "part_ds")
    df.repartition(8).write.partitionBy("p").parquet(out)

    with pytest.raises(ValueError, match="hive-partitioned"):
        compact(spark, out, target_file_mb=512)

    before = spark.read.parquet(out)
    rows_before = sorted((r.id, r.p, r.v) for r in before.collect())
    per_leaf_before = len(glob.glob(f"{out}/p=0/*.parquet"))
    assert per_leaf_before > 1  # 8 input partitions → multiple files per leaf

    result = compact_partitioned(spark, out, target_file_mb=512)
    assert len(result) == 3 and all(n == 1 for n in result.values())
    assert sorted(os.path.basename(p) for p in result) == ["p=0", "p=1", "p=2"]
    assert len(glob.glob(f"{out}/p=0/*.parquet")) == 1
    after = spark.read.parquet(out)
    assert sorted((r.id, r.p, r.v) for r in after.collect()) == rows_before


def test_float16_rewrite_leaves_no_tmp_files(spark, tmp_path):
    """The crash-safe tmp+rename swap must clean up after itself: a finished
    narrowing pass leaves only .parquet files (a stale .f16tmp would be read
    by directory-scanning readers as a corrupt footer)."""
    df = spark.createDataFrame([(1, 1.5), (2, 0.25)], "id long, val float")
    out = str(tmp_path / "f16_clean")
    export(
        df,
        out,
        ExportOptions(float16_handling="float16", float16_columns=("val",)),
        quiet=True,
    )
    assert glob.glob(f"{out}/*.f16tmp") == []
    assert len(glob.glob(f"{out}/*.parquet")) >= 1


def test_compact_partitioned_concurrent(spark, tmp_path):
    """max_concurrency > 1 runs independent leaves through a thread pool and
    must produce byte-identical results to the sequential path: same leaf
    set, same per-leaf file counts, same data."""
    from pg2parquet_spark.export import compact_partitioned

    df = spark.range(4000).select(
        F.col("id"), (F.col("id") % 5).alias("p"), (F.col("id") * 3).alias("v")
    )
    out = str(tmp_path / "part_conc")
    df.repartition(8).write.partitionBy("p").parquet(out)
    rows_before = sorted((r.id, r.p, r.v) for r in spark.read.parquet(out).collect())
    assert len(glob.glob(f"{out}/p=0/*.parquet")) > 1

    result = compact_partitioned(spark, out, target_file_mb=512, max_concurrency=4)
    assert len(result) == 5 and all(n == 1 for n in result.values())
    assert sorted(os.path.basename(p) for p in result) == [f"p={i}" for i in range(5)]
    for i in range(5):
        assert len(glob.glob(f"{out}/p={i}/*.parquet")) == 1
        assert glob.glob(f"{out}/p={i}._compact_*") == []
    after = sorted((r.id, r.p, r.v) for r in spark.read.parquet(out).collect())
    assert after == rows_before


def test_sweep_reaps_dead_pid_bucket_tables(spark):
    """Bucket tables named for a dead pid are dropped THROUGH the catalog
    (DROP TABLE removes metastore entry + data dir together — an rmtree-only
    sweep leaves dangling catalog entries that break spark.table forever);
    the live process's own tables survive regardless of age."""
    import subprocess

    from pg2parquet_spark.operators.layout import _sweep_stale_bucket_tables

    p = subprocess.Popen(["true"])
    p.wait()
    dead = f"b_orders_{p.pid}"
    mine = f"b_customer_{os.getpid()}"
    for name in (dead, mine):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.range(10).selectExpr("id AS o_custkey").write.mode(
            "overwrite"
        ).bucketBy(2, "o_custkey").saveAsTable(name)
    try:
        _sweep_stale_bucket_tables(spark)
        names = {t.name for t in spark.catalog.listTables()}
        assert dead not in names, "dead-pid table must be dropped"
        assert mine in names, "own table must survive"
        wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
        assert not os.path.isdir(os.path.join(wh, dead))
        spark.table(mine).count()  # catalog entry still usable
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {mine}")
        spark.sql(f"DROP TABLE IF EXISTS {dead}")


def test_float16_remote_uri_reconstruction_and_rename_swap(monkeypatch, tmp_path):
    """r4 ADVICE follow-up, now a TEST instead of string reasoning: the
    float16 task rewrite must resolve its filesystem from the export root's
    ORIGINAL URI — never from_uri(listing-path), which would misparse the
    scheme-less bucket-relative paths remote stores list (s3://bucket/exp
    lists 'bucket/exp/part.parquet'). Emulated remote: a SubTreeFileSystem
    whose in-bucket paths do NOT exist relative to the local cwd (any code
    path falling back to local resolution dies on a missing path),
    reachable only through the _fs_from_root_uri seam, spied to assert it
    is handed exactly the root URI. Also pins crash safety: a stale
    .f16tmp left by a killed speculative task is overwritten, and the
    rename-aside swap leaves no tmp file behind."""
    import pyarrow as pa
    from pyarrow import fs as pafs
    from pyspark import TaskContext

    from pg2parquet_spark import export as ex

    root_uri = "s3://bucket/exp"
    (tmp_path / "bucket" / "exp").mkdir(parents=True)
    part = tmp_path / "bucket" / "exp" / "part-0.parquet"
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "v": pa.array([1.5, -0.25], pa.float32()),
            }
        ),
        str(part),
    )
    # stale tmp from a previously killed task — the retry must overwrite it
    (tmp_path / "bucket" / "exp" / "part-0.parquet.f16tmp").write_bytes(b"garbage")

    calls = []

    def spy(uri):
        calls.append(uri)
        assert uri == root_uri, f"fs resolved from {uri!r}, not the export root URI"
        return pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())

    monkeypatch.setattr(ex, "_fs_from_root_uri", spy)
    monkeypatch.setattr(TaskContext, "get", lambda: object())

    done = ex._rewrite_one_float16(
        "bucket/exp/part-0.parquet", root_uri, frozenset({"v"}), "zstd"
    )
    assert done == "bucket/exp/part-0.parquet"
    assert calls == [root_uri]
    schema = str(pq.ParquetFile(str(part)).schema)
    assert "fixed_len_byte_array(2)" in schema and "(Float16)" in schema
    assert not (tmp_path / "bucket" / "exp" / "part-0.parquet.f16tmp").exists()
    back = pq.read_table(str(part))
    assert [float(x.as_py()) for x in back["v"]] == [1.5, -0.25]


def test_memo_tmpdir_failed_populate_not_committed():
    """r7 ADVICE: the old protocol recorded the dir as created BEFORE the
    caller populated it, so a partial population failure left every later
    invocation silently consuming the half-built fixture. Now the memo
    entry commits only after populate() returns: a raising populate leaves
    the key unmemoized and the next call rebuilds on a fresh dir."""
    import pytest as _pytest

    from pg2parquet_spark.tmpdirs import memo_tmpdir

    calls = []

    def boom(path):
        calls.append(path)
        raise OSError("simulated partial build")

    with _pytest.raises(OSError):
        memo_tmpdir("memo_fail_test", "k1", populate=boom)
    built = []
    path, created = memo_tmpdir("memo_fail_test", "k1", populate=built.append)
    assert created and built == [path]  # rebuilt, not reused half-built
    assert path != calls[0]
    path2, created2 = memo_tmpdir("memo_fail_test", "k1", populate=built.append)
    assert path2 == path and not created2 and len(built) == 1


@pytest.mark.slowtier
def test_fixture_queries_reuse_tmpdirs_across_invocations(spark):
    """r6 review item: the ten fixture-writing queries used to mkdtemp per
    invocation — every selfcheck/scaleprobe/plan sweep leaked temp dirs.
    They now memoize their fixture dir per (kind, sf_dir)
    (pg2parquet_spark.tmpdirs): invoking each query twice must create ZERO
    new temp directories on the second pass."""
    import tempfile

    from pg2parquet_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    names = [
        "stream_events_hourly",      # _events_stream symlink dir
        "stream_dedup_exact",        # docs_stream symlink dir
        "stream_ivf_assign",         # emb_stream symlink dir
        "stream_late_data",          # 3-batch landing dir (+ reaped staging)
        "stream_foreachbatch_partials",  # memoized sink dir, cleared per run
        "layout_partition_prune",
        "layout_zorder_cluster",
        "sink_roundtrip",
        "source_csv_roundtrip",
        "source_json_roundtrip",
        "source_orc_roundtrip",
    ]
    reg = load_all()
    for n in names:
        reg[n].fn(spark, sf)  # first pass populates the memoized fixtures
    tmp = tempfile.gettempdir()
    before = set(os.listdir(tmp))
    for n in names:
        reg[n].fn(spark, sf)  # second pass must reuse every fixture dir
    new = set(os.listdir(tmp)) - before
    # Spark's own scratch (blockmgr/spark-*/hive) may appear; OUR prefixes
    # must not
    ours = {
        d
        for d in new
        if d.startswith(
            (
                "events_stream_", "docs_stream_", "events_late_",
                "fb_partials_", "pg2parquet_part_", "pg2parquet_zorder_",
                "pg2parquet_sink_", "pg2parquet_src_",
            )
        )
    }
    assert not ours, sorted(ours)
