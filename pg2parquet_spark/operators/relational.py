"""Relational operator surface (SURVEY.md §2.B).

The reference delegates ALL relational algebra to the PostgreSQL server
(`/root/reference/cli/src/main.rs:53-58` ships an opaque SQL string); its
contract is "any PostgreSQL SELECT". Here that surface is Spark SQL /
DataFrame + Catalyst: scans with pushdown, broadcast/sort-merge joins,
partial+final hash aggregation, window functions, rollup/grouping sets,
set ops, sorts and top-k — each expressed declaratively so Catalyst picks
the physical strategy (AQE re-plans at runtime).

Scale notes (100 TB design intent), per query below:
- fact-fact joins shuffle on their join key; dimension joins broadcast
  (region/nation always; customer/supplier/part up to spark's
  autoBroadcastJoinThreshold — AQE converts to broadcast at runtime when the
  built side turns out small);
- aggregations are partial (map-side combine) before the shuffle — that's
  Spark's default HashAggregate pair, nothing to hand-roll;
- top-k is `orderBy().limit(k)` which Spark executes as TakeOrderedAndProject
  (per-partition heap + driver merge, no full sort/shuffle);
- windows shuffle once on partitionBy keys; running totals reuse that
  partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pg2parquet_spark.registry import register
from pg2parquet_spark.tables import table


def dec(c: Column | str, prec: int = 15, scale: int = 2) -> Column:
    """Exact decimal view of a money-ish double column (corpus values are
    exact 2-decimal, so this cast is lossless → deterministic aggregation)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({prec},{scale})")


# --------------------------------------------------------------------------
# q01 — TPC-H Q1-style pricing summary: filter + groupBy + 8 aggregates.
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_price,
       CAST(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="Pricing summary report: scan-filter-aggregate with exact decimal sums.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    qty = dec("l_quantity", 12, 2)
    price = dec("l_extendedprice", 15, 2)
    disc = dec("l_discount", 4, 2)
    tax = dec("l_tax", 4, 2)
    one = F.lit(1)
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
            (F.sum(price).cast("double") / cnt).alias("avg_price"),
            (F.sum(disc).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q03 — shipping-priority: 3-way join + aggregate + top-10.
# --------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-06-30 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="Join customer×orders×lineitem, aggregate revenue, deterministic top-10.",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-06-30 00:00:00")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-06-30 00:00:00")
    revenue = dec("l_extendedprice", 15, 2) * (F.lit(1) - dec("l_discount", 4, 2))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # no static broadcast hint: customer grows with SF — AQE converts
        # this to broadcast at runtime whenever the filtered side is small
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q05 — local-supplier volume: 6-way join, broadcast dims, group by geo.
# --------------------------------------------------------------------------
@register(
    "q05_local_supplier_volume",
    oracle="""
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY r_name, n_name
""",
    doc="TPC-H Q5-style multiway join; nation/region broadcast, fact joins shuffle on keys.",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00") & (F.col("o_orderdate") < "1999-01-01 00:00:00")
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    revenue = dec("l_extendedprice", 15, 2) * (F.lit(1) - dec("l_discount", 4, 2))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        # supplier grows with SF → no static hint (AQE decides); nation and
        # region are bounded (25 / 5 rows) → always-safe broadcast
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Window functions.
# --------------------------------------------------------------------------
@register(
    "q_window_topk_per_customer",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
    doc="Top-3 orders per customer via row_number window (single shuffle on o_custkey).",
)
def q_window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
""",
    doc="Per-customer running total — exact decimal cumulative sum over an ordered frame.",
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice", 15, 2)).over(w).cast("double").alias("running_spend"),
    )


@register(
    "q_window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       LAG(o_orderkey)  OVER w AS prev_orderkey,
       LEAD(o_orderkey) OVER w AS next_orderkey,
       RANK()       OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_rank,
       DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_dense_rank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    doc="lag/lead/rank/dense_rank over per-customer order history.",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = W.partitionBy("o_custkey").orderBy("o_orderpriority")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.rank().over(wp).alias("prio_rank"),
        F.dense_rank().over(wp).alias("prio_dense_rank"),
    )


# --------------------------------------------------------------------------
# Sorts / top-k.
# --------------------------------------------------------------------------
@register(
    "q_topk_global",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    doc="Global top-20 — Spark plans TakeOrderedAndProject (per-partition heap, no full sort).",
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Aggregation variants.
# --------------------------------------------------------------------------
@register(
    "q_distinct_agg",
    oracle="""
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers,
       CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_bal,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal
FROM customer
GROUP BY c_mktsegment
""",
    doc="count distinct + min/max per group (Spark expands distinct into a two-phase agg).",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    bal = dec("c_acctbal", 12, 2)
    return cust.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
        F.min(bal).cast("double").alias("min_bal"),
        F.max(bal).cast("double").alias("max_bal"),
    )


@register(
    "q_rollup_lineitem",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    doc="ROLLUP hierarchy totals; grouping nulls coalesced to 'ALL' for a stable shape.",
)
def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", 12, 2)).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@register(
    "q_cube_orders",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    doc="CUBE over status×priority.",
)
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", 15, 2)).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "total_price",
        )
    )


# --------------------------------------------------------------------------
# Set operations.
# --------------------------------------------------------------------------
@register(
    "q_set_ops",
    oracle="""
SELECT 'both' AS tag, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'customer_only' AS tag, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT s_nationkey FROM supplier
)
""",
    doc="INTERSECT / EXCEPT / UNION ALL over nation keys.",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_nk = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp_nk = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = cust_nk.intersect(supp_nk).select(F.lit("both").alias("tag"), "nationkey")
    only = cust_nk.subtract(supp_nk).select(F.lit("customer_only").alias("tag"), "nationkey")
    return both.unionAll(only)


# --------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS).
# --------------------------------------------------------------------------
@register(
    "q_semi_join",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
""",
    doc="left_semi join = EXISTS; counts customers with ≥1 urgent order.",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q_anti_join",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
GROUP BY c_mktsegment
""",
    doc="left_anti join = NOT EXISTS; customers with no pending orders.",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    pending = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        cust.join(pending, cust.c_custkey == pending.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q_outer_join",
    oracle="""
SELECT n_name, COALESCE(cnt, 0) AS n_suppliers
FROM nation
LEFT JOIN (SELECT s_nationkey, COUNT(*) AS cnt FROM supplier GROUP BY s_nationkey) s
  ON n_nationkey = s_nationkey
""",
    doc="left outer join with pre-aggregated build side (aggregate-below-join keeps the shuffle small).",
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    supp_cnt = (
        table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return nation.join(
        supp_cnt, nation.n_nationkey == supp_cnt.s_nationkey, "left"
    ).select("n_name", F.coalesce("cnt", F.lit(0)).alias("n_suppliers"))


# --------------------------------------------------------------------------
# CASE aggregation (TPC-H Q12-style) + date bucketing.
# --------------------------------------------------------------------------
@register(
    "q_case_priority_by_month",
    oracle="""
SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS ship_ym,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
""",
    doc="Conditional aggregation bucketed by ship month.",
)
def q_case_priority_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00") & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("int").alias("ship_ym")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Scalar function surface (string/math/conditional — §2.B "scalar functions").
# --------------------------------------------------------------------------
@register(
    "q_scalar_functions",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       SUBSTR(p_name, 1, 5) AS name_prefix,
       LENGTH(p_name) AS name_len,
       p_brand || '#' || p_type AS brand_type,
       ABS(p_size - 25) AS size_dist,
       p_size % 7 AS size_mod,
       CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS price_r1,
       CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class
FROM part
""",
    doc="Scalar function projection (JVM-side, whole-stage-codegen; no UDFs).",
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.round(dec("p_retailprice", 12, 2), 1).cast("double").alias("price_r1"),
        F.when(F.col("p_size") >= 25, "large").otherwise("small").alias("size_class"),
    )


# --------------------------------------------------------------------------
# Pivot (oracle uses FILTER aggregates — same result shape).
# --------------------------------------------------------------------------
@register(
    "q_pivot_status",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_p
FROM orders
GROUP BY o_orderpriority
""",
    doc="pivot on order status → one count column per status.",
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("cnt_p"),
    )


# --------------------------------------------------------------------------
# Events: time bucketing + sessionization (batch analogues of streaming ops).
# --------------------------------------------------------------------------
@register(
    "q_events_hourly",
    oracle="""
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling-hour aggregation over the event stream table.",
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(dec("value", 18, 2)).cast("double").alias("total_value"),
    )


@register(
    "q_events_sessionize",
    oracle="""
WITH eus AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, ts FROM events
), flagged AS (
  SELECT user_id, event_id,
         CASE WHEN LAG(us) OVER w IS NULL
              OR us - LAG(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM eus
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM flagged GROUP BY user_id
""",
    doc="Gap-based sessionization: lag + flag-sum (the batch twin of session_window). "
    "Gap compared in epoch microseconds so both engines see identical integers.",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_session = F.when(
        prev_us.isNull() | (us - prev_us > 1800 * 1000 * 1000), 1
    ).otherwise(0)
    return (
        ev.select("user_id", "event_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


# --------------------------------------------------------------------------
# Flagship (used by __spark_entry__.entry): q03 at whatever sf_dir is given.
# --------------------------------------------------------------------------
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q03_shipping_priority(spark, sf_dir)


# --------------------------------------------------------------------------
# SQL-surface extras: the reference's contract is "any PostgreSQL SELECT";
# these exercise the SQL API forms Catalyst must handle beyond the
# DataFrame-built plans above.
# --------------------------------------------------------------------------
@register(
    "q_expression_query",
    oracle="""
SELECT c_custkey * 2 AS doubled_id, UPPER(c_name) AS upper_name
FROM customer
""",
    doc="Expression projection parity with the reference's own CLI test "
    "(py-tests/test_cli.py:170: SELECT id*2, UPPER(message)).",
)
def q_expression_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        (F.col("c_custkey") * 2).alias("doubled_id"),
        F.upper("c_name").alias("upper_name"),
    )


@register(
    "q_grouping_sets",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    doc="Explicit GROUPING SETS via the SQL API (rollup/cube cousins above use DataFrame form).",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.tables import register_views

    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q_scalar_subquery",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
""",
    doc="Correlated scalar subquery (Catalyst decorrelates it into an aggregate+join; "
    "MAX is a selection, so doubles stay deterministic).",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "q_in_subquery",
    oracle="""
SELECT p_brand, COUNT(*) AS n_parts
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                    JOIN orders ON l_orderkey = o_orderkey
                    WHERE o_orderpriority = '1-URGENT')
GROUP BY p_brand
""",
    doc="IN-subquery form (rewritten by Catalyst to a left-semi join).",
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.tables import register_views

    register_views(spark, sf_dir, ["part", "lineitem", "orders"])
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                            JOIN orders ON l_orderkey = o_orderkey
                            WHERE o_orderpriority = '1-URGENT')
        GROUP BY p_brand
        """
    )


@register(
    "q_cross_join",
    oracle="""
SELECT r_name, s.o_orderstatus AS orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
""",
    doc="Cartesian product of two tiny inputs (explicit crossJoin).",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region")
    statuses = table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("orderstatus")
    ).distinct()
    return region.crossJoin(statuses).select("r_name", "orderstatus")


@register(
    "q_collect_sorted",
    oracle="""
SELECT n_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
FROM nation JOIN supplier ON s_nationkey = n_nationkey
GROUP BY n_nationkey
""",
    doc="Deterministic string aggregation: collect_list is unordered by contract, so "
    "array_sort before joining (DuckDB: string_agg ORDER BY).",
)
def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    supp = table(spark, sf_dir, "supplier")
    return (
        nation.join(supp, supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_nationkey")
        .agg(F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers"))
    )


@register(
    "q_nulls_ordering",
    oracle="""
SELECT o_orderkey,
       NULLIF(o_orderstatus, 'P') AS status_or_null,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled
FROM orders
ORDER BY NULLIF(o_orderstatus, 'P') NULLS LAST, o_orderkey
LIMIT 50
""",
    doc="NULL semantics surface: NULLIF/COALESCE + ORDER BY ... NULLS LAST (the "
    "reference's tests always sort NULLS LAST, wrappers.py:117-118).",
)
def q_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        orders.select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            F.coalesce(status_or_null, F.lit("PENDING")).alias("status_filled"),
        )
        .orderBy(F.col("status_or_null").asc_nulls_last(), F.col("o_orderkey"))
        .limit(50)
    )


# --------------------------------------------------------------------------
# TPC-H analog wave 2 (adapted to the corpus columns; see TESTDATA.md):
# q06 forecast revenue, q04 priority-check EXISTS, q10 returned items,
# q12 conditional aggregation, q14 promo share, q19 disjunctive predicates,
# q22 anti-join against a scalar aggregate.
# --------------------------------------------------------------------------
@register(
    "q06_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 analog: pure scan-filter-aggregate; every predicate reaches the "
    "parquet scan (PushedFilters), decimal comparisons keep the boundary exact.",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc = dec("l_discount", 4, 2)
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01 00:00:00")
            & (F.col("l_shipdate") < "1998-01-01 00:00:00")
            & disc.between("0.05", "0.07")
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice", 15, 2) * disc).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q04_priority_check",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 analog: correlated EXISTS with a non-equi conjunct (shipped >60 "
    "days after ordering) → Spark left-semi join on the order key; the range "
    "conjunct rides along as a join residual, so it's still a shuffled equi-join.",
)
def q04_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1996-07-01 00:00:00")
    )
    li = table(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 analog: who returned the most revenue — 4-way join, aggregate, "
    "deterministic top-20 (TakeOrderedAndProject: per-partition heap, no full sort).",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1996-07-01 00:00:00")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice", 15, 2) * (F.lit(1) - dec("l_discount", 4, 2))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_lines",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
""",
    doc="TPC-H Q12 analog (corpus has no ship mode → l_linestatus): conditional "
    "aggregation over a fact-fact equi-join.",
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle="""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
                     ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
       * 100.0 AS promo_share_pct,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END) AS BIGINT) AS promo_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
""",
    doc="TPC-H Q14 analog: promo revenue share. Both sums are exact decimals; the "
    "single double division/multiply at the end is order-fixed in both engines.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01 00:00:00")
        & (F.col("l_shipdate") < "1997-04-01 00:00:00")
    )
    part = table(spark, sf_dir, "part")
    disc_price = dec("l_extendedprice", 15, 2) * (F.lit(1) - dec("l_discount", 4, 2))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0))
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .agg(
            (
                F.sum(promo).cast("double") / F.sum(disc_price).cast("double") * 100.0
            ).alias("promo_share_pct"),
            F.sum(F.when(F.col("p_type") == "PROMO", 1).otherwise(0))
            .cast("bigint")
            .alias("promo_lines"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
    doc="TPC-H Q19 analog: OR-of-ANDs across both join sides. Catalyst extracts the "
    "common p_brand IN (...) / quantity range conjuncts and pushes them below the "
    "join; the residual disjunction evaluates post-join.",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & sz.between(1, 35) & q.between(20, 40))
    )
    revenue = dec("l_extendedprice", 15, 2) * (F.lit(1) - dec("l_discount", 4, 2))
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .filter(cond)
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_dormant_customers",
    oracle="""
WITH pos AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS total,
         COUNT(*) AS cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM customer, pos
WHERE CAST(c_acctbal AS DECIMAL(12,2)) * pos.cnt > pos.total
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '1998-01-01')
GROUP BY c_nationkey
""",
    doc="TPC-H Q22 analog: customers with above-average balance and no RECENT "
    "orders (none on/after 1998-01-01). The above-average test is `bal * count "
    "> sum` — pure decimal integer arithmetic, no division, so the threshold "
    "is bit-exact in both engines. NOT EXISTS → left-anti join on the "
    "date-filtered orders; the scalar aggregate broadcasts. Dormancy is "
    "date-bounded rather than canonical Q22's no-orders-ever because the "
    "sf0.01 gate corpus has ZERO order-less customers — the original "
    "predicate was structurally empty at the driver's gate SF (r9 VERDICT); "
    "the cutoff moves 3 customers at sf0.01 / 30 at sf0.1 while keeping the "
    "anti-join + broadcast-scalar shape.",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("date")
    )
    pos = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(dec("c_acctbal", 12, 2)).cast("decimal(20,2)").alias("total"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(dec("c_acctbal", 12, 2) * F.col("cnt") > F.col("total"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Scalar-function families round 2: JSON, range window frames, datetime.
# --------------------------------------------------------------------------
@register(
    "q_json_props",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n_events,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY 1
""",
    doc="JSON path extraction over the events.props column (get_json_object → "
    "JVM-side JsonPath, no UDF; the reference ships json as opaque text and "
    "delegates extraction to PG's ->> operator).",
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.filter(k.isNotNull())
        .groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
    )


@register(
    "q_window_frames",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)))
            OVER (PARTITION BY o_custkey ORDER BY day_num
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_31d,
       NTILE(4) OVER (PARTITION BY o_custkey ORDER BY day_num, o_orderkey) AS recency_quartile
FROM (SELECT o_orderkey, o_custkey, o_totalprice,
             datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS day_num
      FROM orders)
""",
    doc="RANGE window frame (30-day sliding spend — a value-range frame, not a "
    "row-count frame) + NTILE quartiles. One shuffle on o_custkey serves both "
    "window functions.",
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    day_num = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz"))
    base = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", day_num.alias("day_num")
    )
    w_range = (
        W.partitionBy("o_custkey").orderBy("day_num").rangeBetween(-30, W.currentRow)
    )
    w_tile = W.partitionBy("o_custkey").orderBy("day_num", "o_orderkey")
    return base.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice", 15, 2)).over(w_range).cast("double").alias("spend_31d"),
        F.ntile(4).over(w_tile).alias("recency_quartile"),
    )


@register(
    "q_datetime_functions",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(quarter(o_orderdate) AS BIGINT) AS q,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       CAST(day(o_orderdate) AS BIGINT) AS d,
       CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
       CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date,
       CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_epoch_start
FROM orders
WHERE o_orderkey % 17 = 0
""",
    doc="Datetime function tour: component extraction, truncation, last_day, "
    "interval arithmetic, day difference — all codegen expressions.",
)
def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 17 == 0)
    od = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(od).cast("bigint").alias("y"),
        F.quarter(od).cast("bigint").alias("q"),
        F.month(od).cast("bigint").alias("m"),
        F.dayofmonth(od).cast("bigint").alias("d"),
        F.date_trunc("month", od).cast("date").cast("string").alias("month_start"),
        F.last_day(od.cast("date")).cast("string").alias("month_end"),
        (od + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.datediff(od, F.lit("1995-01-01").cast("timestamp_ntz"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
    )


@register(
    "q_lateral_explode",
    oracle="""
SELECT doc_id, t.token, len(t.token) AS token_len
FROM (SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
      FROM documents WHERE doc_id % 25 = 0) d,
     LATERAL (SELECT UNNEST(toks) AS token) t
WHERE len(t.token) >= 6
""",
    doc="Table-function / LATERAL surface: one row per token via explode — the "
    "generator runs inside the scan stage (no shuffle); PG spells it "
    "unnest()/LATERAL, Spark explode().",
)
def q_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    return (
        docs.select("doc_id", F.explode(F.split(norm, " ")).alias("token"))
        .filter(F.length("token") >= 6)
        .select("doc_id", "token", F.length("token").alias("token_len"))
    )


@register(
    "q_percentiles",
    oracle="""
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.95) AS p95,
       CAST(MAX(o_totalprice) AS DOUBLE) AS p100
FROM orders
GROUP BY o_orderpriority
""",
    doc="Exact percentiles (linear interpolation — Spark `percentile`, DuckDB "
    "quantile_cont; the interpolation arithmetic is order-independent, so "
    "results are bit-identical). At 100 TB you'd switch to approx_percentile "
    "(t-digest sketch, mergeable map-side) — same query shape.",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        F.max("o_totalprice").cast("double").alias("p100"),
    )


@register(
    "q_rollup_reuse",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         COUNT(*) AS n, SUM(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
)
SELECT CAST(date_trunc('day', h) AS TIMESTAMP) AS day, event_type,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM hourly
GROUP BY 1, 2
""",
    doc="Hypertable/continuous-aggregate pattern: the daily answer is computed "
    "FROM the hourly rollup, not from raw events — proving the aggregate is "
    "mergeable (counts and integer cents re-aggregate losslessly). At scale the "
    "hourly level is a materialized table maintained incrementally by the "
    "streaming twin (stream_events_hourly); every coarser window reads it "
    "instead of the raw 100 TB.",
)
def q_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents"))
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", "h").cast("timestamp_ntz").alias("day"), "event_type"
        )
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H analog wave 3: multi-join pair analysis, conditional shares,
# distributions, scalar-subquery max, correlated thresholds, and the
# semi+anti combination.
# --------------------------------------------------------------------------
@register(
    "q07_nation_trade",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
""",
    doc="TPC-H Q7 analog: bilateral trade volume — six-way join with a nation-pair "
    "disjunction; both nation joins broadcast (bounded dim).",
)
def q07_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = dec("l_extendedprice", 15, 2) * (F.lit(1) - dec("l_discount", 4, 2))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "q08_market_share",
    oracle="""
WITH t AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume,
         n_name
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
)
SELECT o_year,
       CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
       CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN 1 ELSE 0 END) AS BIGINT) AS brazil_lines
FROM t GROUP BY o_year
""",
    doc="TPC-H Q8 analog: one nation's share of yearly volume — conditional decimal "
    "sums, single double division at the end.",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    volume = dec("l_extendedprice", 15, 2) * (F.lit(1) - dec("l_discount", 4, 2))
    is_brazil = F.col("n_name") == "NATION_3"
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(F.when(is_brazil, volume).otherwise(F.lit(0))).cast("double")
                / F.sum(volume).cast("double")
            ).alias("mkt_share"),
            F.sum(F.when(is_brazil, 1).otherwise(0)).cast("bigint").alias("brazil_lines"),
        )
    )


@register(
    "q13_order_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    doc="TPC-H Q13 analog: customer order-count distribution — a left join "
    "(customers with zero orders count as 0) feeding a second aggregation; "
    "both aggs are integer-only.",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
""",
    doc="TPC-H Q15 analog: supplier(s) with the maximum quarterly revenue — the "
    "max threshold is an exact DECIMAL comparison (scalar subquery broadcast), "
    "so ties and equality are deterministic.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-04-01 00:00:00")
    )
    supp = table(spark, sf_dir, "supplier")
    revenue = dec("l_extendedprice", 15, 2) * (F.lit(1) - dec("l_discount", 4, 2))
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue).alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("mx"))
    return (
        supp.join(rev, supp.s_suppkey == rev.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_rev") == F.col("mx"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH pa AS (
  SELECT l_partkey AS pk,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_sum,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem JOIN pa ON l_partkey = pk
WHERE CAST(l_quantity AS DECIMAL(12,2)) * cnt * 5 < qty_sum
""",
    doc="TPC-H Q17 analog: revenue from below-20%%-of-average-quantity lines. The "
    "threshold is `qty * cnt * 5 < sum` — pure decimal integer arithmetic, no "
    "division, so the boundary is bit-exact (same trick as q22).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(dec("l_quantity", 12, 2)).alias("qty_sum"),
        F.count(F.lit(1)).alias("cnt"),
    )
    li2 = table(spark, sf_dir, "lineitem")
    return (
        li2.join(pa, li2.l_partkey == pa.pk)
        .filter(dec("l_quantity", 12, 2) * F.col("cnt") * 5 < F.col("qty_sum"))
        .agg(
            (F.sum(dec("l_extendedprice", 15, 2)).cast("double") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey AS ok
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 200
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(tq AS DOUBLE) AS total_qty
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS tq
  FROM orders
  JOIN big ON o_orderkey = big.ok
  JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY o_custkey, o_orderkey, o_orderdate
) o
JOIN customer ON c_custkey = o_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 25
""",
    doc="TPC-H Q18 analog: large-volume orders — a HAVING-filtered semi source "
    "pre-shrinks the fact before the customer join; exact-decimal quantity sums "
    "make the top-25 boundary deterministic.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum(dec("l_quantity", 12, 2)).alias("s"))
        .filter(F.col("s") > 200)
        .select("ok")
    )
    per_order = (
        orders.join(big, orders.o_orderkey == big.ok)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum(dec("l_quantity", 12, 2)).alias("tq"))
    )
    return (
        per_order.join(cust, cust.c_custkey == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.col("tq").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "q21_waiting_supplier",
    oracle="""
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
),
multi AS (
  SELECT l_orderkey FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
  GROUP BY l_orderkey HAVING COUNT(*) > 1
)
SELECT s_name, COUNT(*) AS numwait
FROM late
JOIN multi ON late.l_orderkey = multi.l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
""",
    doc="TPC-H Q21 analog (adapted to available columns): suppliers whose lines "
    "shipped >90 days late on multi-supplier orders — distinct-pair semi source "
    "joined to a HAVING-filtered order set; counts only, fully deterministic.",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    late = (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    multi = (
        li.select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("l_orderkey")
    )
    return (
        late.join(multi, "l_orderkey")
        .join(supp, supp.s_suppkey == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# TPC-H analog wave 4 — the five queries whose canonical form needs the
# `partsupp` table (absent from the corpus), each adapted to the available
# columns while keeping the query SHAPE the original exercises: correlated
# min (q02), multi-dim profit rollup (q09), fraction-of-total threshold
# (q11), distinct-count with exclusion (q16), nested semi thresholds (q20).
# Adaptation note per query in its docstring.
# --------------------------------------------------------------------------
@register(
    "q02_min_cost_supplier",
    oracle="""
WITH offers AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         MIN(CAST(l_extendedprice AS DECIMAL(15,2))) AS best
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
best_per_part AS (
  SELECT pk, MIN(best) AS part_best FROM offers GROUP BY pk
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(part_best AS DOUBLE) AS best_price
FROM offers
JOIN best_per_part ON offers.pk = best_per_part.pk AND offers.best = part_best
JOIN part     ON p_partkey = offers.pk
JOIN supplier ON s_suppkey = offers.sk
JOIN nation   ON n_nationkey = s_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE p_size BETWEEN 10 AND 20 AND p_type = 'SMALL' AND r_name = 'EUROPE'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    doc="TPC-H Q2 analog (no partsupp: the offer catalog is derived as the "
    "min extended price each supplier ever charged for a part). Correlated-min "
    "pattern: per-part minimum joined back by exact DECIMAL equality; "
    "region/nation broadcast; top-100 via TakeOrderedAndProject. The size "
    "predicate is a band (10..20), not canonical Q2's single size: at the "
    "driver's sf0.01 gate the single-size + EUROPE conjunction selected a "
    "set whose global-min suppliers never landed in EUROPE (0 rows — every "
    "green only proved both engines agree on emptiness, r9 VERDICT). The "
    "band keeps the correlated-min shape and moves 14 rows at sf0.01 / "
    "154 at sf0.1.",
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "SMALL")
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    offers = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(dec("l_extendedprice", 15, 2)).alias("best"))
    best_per_part = (
        offers.groupBy("pk")
        .agg(F.min("best").alias("part_best"))
        .select(F.col("pk").alias("bpk"), "part_best")
    )
    return (
        offers.join(
            best_per_part,
            (offers.pk == F.col("bpk")) & (offers.best == F.col("part_best")),
        )
        .drop("bpk")
        .join(part, F.col("p_partkey") == offers.pk)
        .join(supp, F.col("s_suppkey") == F.col("sk"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("part_best").cast("double").alias("best_price"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q09_product_type_profit",
    oracle="""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
                - CAST(p_retailprice AS DECIMAL(15,2)) * CAST(l_quantity AS DECIMAL(12,2)) * 0.1) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
""",
    doc="TPC-H Q9 analog (no partsupp.ps_supplycost: cost proxied as 10%% of "
    "retail price × quantity, exact decimal arithmetic). Profit by supplier "
    "nation × order year for parts named '%%red%%' — the part filter prunes "
    "before the fact join; nation broadcast.",
)
def q09_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    profit = dec("l_extendedprice", 15, 2) * (F.lit(1) - dec("l_discount", 4, 2)) - dec(
        "p_retailprice", 15, 2
    ) * dec("l_quantity", 12, 2) * F.lit(0.1).cast("decimal(2,1)")
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
WITH val AS (
  SELECT l_partkey AS pk,
         SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS v
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT pk AS l_partkey, CAST(v AS DOUBLE) AS part_value
FROM val
WHERE v * 5000 > (SELECT SUM(v) FROM val)
""",
    doc="TPC-H Q11 analog (shipment value instead of partsupp stock value). "
    "Fraction-of-total threshold kept exact: `v * 5000 > total` is pure decimal "
    "integer arithmetic — no double division at the boundary, so membership is "
    "bit-stable across engines. Scalar total broadcast to every partition.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    val = (
        li.join(supp, supp.s_suppkey == li.l_suppkey)
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("l_partkey"))
        .agg(F.sum(dec("l_extendedprice", 15, 2)).alias("v"))
    )
    total = val.agg(F.sum("v").alias("tot"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("v") * 5000 > F.col("tot"))
        .select("l_partkey", F.col("v").cast("double").alias("part_value"))
    )


@register(
    "q16_supplier_cnt",
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#17'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    doc="TPC-H Q16 analog (suppliers observed shipping the part stand in for "
    "partsupp; the 'customer complaints' exclusion becomes negative-balance "
    "suppliers). Distinct-count after an anti-join exclusion list (broadcast "
    "NOT IN); part predicate prunes before the join.",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#17")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, part.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q20_part_promotion",
    oracle="""
WITH per_ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
per_part AS (SELECT pk, SUM(sq) AS tot FROM per_ps GROUP BY pk),
dominant AS (
  SELECT DISTINCT sk FROM per_ps
  JOIN per_part ON per_ps.pk = per_part.pk
  JOIN part ON p_partkey = per_ps.pk
  WHERE p_name LIKE '%red%' AND sq * 2 > tot
)
SELECT s_name, s_suppkey, n_name
FROM supplier
JOIN dominant ON s_suppkey = sk
JOIN nation ON n_nationkey = s_nationkey
ORDER BY s_suppkey
""",
    doc="TPC-H Q20 analog (availqty threshold becomes 'supplier shipped the "
    "majority of that part's 1997 volume'). Nested semi pattern: per-(part,supp) "
    "sums vs per-part totals with an exact `sq*2 > tot` decimal boundary, "
    "distinct suppliers, then a dimension join. No partsupp needed.",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    per_ps = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(dec("l_quantity", 12, 2)).alias("sq"))
    per_part = per_ps.groupBy("pk").agg(F.sum("sq").alias("tot"))
    dominant = (
        per_ps.join(per_part, "pk")
        .join(part, part.p_partkey == F.col("pk"))
        .filter(F.col("sq") * 2 > F.col("tot"))
        .select("sk")
        .distinct()
    )
    return (
        supp.join(dominant, supp.s_suppkey == F.col("sk"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "s_suppkey", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "q_recursive_cte",
    oracle="""
WITH RECURSIVE months(m_idx) AS (
  SELECT 0
  UNION ALL
  SELECT m_idx + 1 FROM months WHERE m_idx < 47
),
rev AS (
  SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS m_idx,
         SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS revenue,
         COUNT(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1999-01-01'
  GROUP BY 1
)
SELECT months.m_idx,
       CAST(1995 + months.m_idx // 12 AS INT) AS y,
       CAST(months.m_idx % 12 + 1 AS INT) AS m,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(CAST(COALESCE(revenue, 0) AS DECIMAL(15,2)) AS DOUBLE) AS revenue
FROM months LEFT JOIN rev ON months.m_idx = rev.m_idx
""",
    doc="Recursive CTE surface (Spark 4 WITH RECURSIVE): generate a dense "
    "48-month spine recursively, then left-join exact-decimal monthly revenue "
    "so gap months appear as zero rows. The recursion is driver-bounded "
    "(48 iterations over a one-column spine — no distributed recursion; the "
    "heavy side stays one groupBy on the fact table).",
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
WITH RECURSIVE months(m_idx) AS (
  SELECT 0
  UNION ALL
  SELECT m_idx + 1 FROM months WHERE m_idx < 47
),
rev AS (
  SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS m_idx,
         SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS revenue,
         COUNT(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1999-01-01'
  GROUP BY 1
)
SELECT months.m_idx,
       CAST(1995 + months.m_idx DIV 12 AS INT) AS y,
       CAST(months.m_idx % 12 + 1 AS INT) AS m,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(CAST(COALESCE(revenue, 0) AS DECIMAL(15,2)) AS DOUBLE) AS revenue
FROM months LEFT JOIN rev ON months.m_idx = rev.m_idx
"""
    )


@register(
    "q_events_funnel",
    oracle="""
SELECT 1 AS funnel, COUNT(*) AS n_users,
       CAST(SUM(viewed) AS BIGINT) AS n_viewed,
       CAST(SUM(clicked_after_view) AS BIGINT) AS n_clicked_after_view,
       CAST(SUM(purchased_after_click) AS BIGINT) AS n_purchased_after_click
FROM (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS viewed,
         MAX(CASE WHEN event_type = 'click' AND seen_view = 1 THEN 1 ELSE 0 END) AS clicked_after_view,
         MAX(CASE WHEN event_type = 'purchase' AND seen_click_after_view = 1 THEN 1 ELSE 0 END) AS purchased_after_click
  FROM (
    SELECT user_id, event_type,
           seen_view,
           MAX(CASE WHEN event_type = 'click' AND seen_view = 1 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seen_click_after_view
    FROM (
      SELECT user_id, event_type, ts, event_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seen_view
      FROM events
    )
  ) GROUP BY user_id
)
""",
    doc="Event funnel (view -> click-after-view -> purchase-after-click) in "
    "ONE pass: cumulative running-max flags over a per-user time window "
    "chain the stages, then one per-user aggregate counts conversions. A "
    "single shuffle on user_id — the naive per-stage self-join shape scans "
    "and shuffles the events table once per funnel stage. Ordering ties "
    "break on event_id so replays are deterministic.",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.tables import table as _table

    ev = _table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seen_view = F.max(
        F.when(F.col("event_type") == "view", 1).otherwise(0)
    ).over(w)
    flagged = ev.select("user_id", "event_type", "ts", "event_id", seen_view.alias("seen_view"))
    seen_cav = F.max(
        F.when((F.col("event_type") == "click") & (F.col("seen_view") == 1), 1).otherwise(0)
    ).over(w)
    staged = flagged.select("user_id", "event_type", "seen_view", seen_cav.alias("seen_click_after_view"))
    per_user = staged.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("viewed"),
        F.max(
            F.when((F.col("event_type") == "click") & (F.col("seen_view") == 1), 1).otherwise(0)
        ).alias("clicked_after_view"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("seen_click_after_view") == 1),
                1,
            ).otherwise(0)
        ).alias("purchased_after_click"),
    )
    return per_user.agg(
        F.lit(1).alias("funnel"),
        F.count(F.lit(1)).alias("n_users"),
        F.sum("viewed").cast("bigint").alias("n_viewed"),
        F.sum("clicked_after_view").cast("bigint").alias("n_clicked_after_view"),
        F.sum("purchased_after_click").cast("bigint").alias("n_purchased_after_click"),
    )


@register(
    "q_events_retention",
    oracle="""
WITH activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
),
cohort AS (
  SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
)
SELECT CAST(c.cohort_day AS VARCHAR) AS cohort_day,
       CAST(a.day - c.cohort_day AS BIGINT) AS age_days,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM activity a JOIN cohort c ON a.user_id = c.user_id
GROUP BY 1, 2
""",
    doc="Cohort retention over the event stream: users bucketed by their "
    "first active day, then distinct active users per (cohort, age-in-days) "
    "— the standard product-analytics retention triangle. Plan: activity "
    "dedupes to (user, day) with map-side combine; the cohort table derives "
    "from activity by a user_id re-aggregation (never a second scan of "
    "events); the join is keyed on user_id (users are data-sized at scale — "
    "no broadcast), and the final distinct-count shuffles on (cohort, age). "
    "Every shuffle is keyed and cardinality-bounded by users x days.",
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day")).cast("bigint").alias("age_days"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )


@register(
    "q_window_rank_family",
    oracle="""
WITH ranked AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         NTILE(4) OVER w AS quartile,
         PERCENT_RANK() OVER w AS pct_rank,
         CUME_DIST() OVER w AS cume,
         RANK() OVER w AS rnk,
         DENSE_RANK() OVER w AS drnk
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
)
SELECT c_custkey, c_nationkey,
       CAST(quartile AS BIGINT) AS quartile,
       pct_rank, cume,
       CAST(rnk AS BIGINT) AS rnk,
       CAST(drnk AS BIGINT) AS drnk
FROM ranked WHERE c_nationkey < 5
""",
    doc="The rank-family window functions in one pass: NTILE, PERCENT_RANK, "
    "CUME_DIST, RANK, DENSE_RANK over a single (nation, acctbal DESC) "
    "window — one partitioning, one sort, five functions (Spark evaluates "
    "them in a single Window node; a per-function window would re-sort "
    "five times). percent_rank and cume_dist are single divisions of exact "
    "integer ranks, so both engines agree bit-for-bit. The tie-break on "
    "c_custkey makes every rank deterministic.",
)
def q_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.select(
            "c_custkey",
            "c_nationkey",
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
        )
        .filter(F.col("c_nationkey") < 5)
    )


@register(
    "q_unpivot_metrics",
    oracle="""
WITH wide AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) / COUNT(*) AS DOUBLE) AS avg_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_qty', sum_qty FROM wide
UNION ALL
SELECT l_returnflag, 'avg_disc', avg_disc FROM wide
""",
    doc="UNPIVOT/melt — the inverse of q_pivot_status: a wide per-flag "
    "aggregate turned into (flag, metric, value) long form via stack(), "
    "the shape metric stores and chart layers consume. Spark's stack() is "
    "a Generate over the already-aggregated (tiny) frame — the melt adds "
    "zero shuffles beyond the one aggregation. avg_disc is the single "
    "division SUM(DECIMAL)/COUNT in both engines - AVG over raw doubles "
    "would be accumulation-order-sensitive.",
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        (
            F.sum(F.col("l_discount").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_disc"),
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(3, 'n_rows', n_rows, 'sum_qty', sum_qty, 'avg_disc', avg_disc) "
        "AS (metric, value)",
    )


@register(
    "q_events_resample_ffill",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 1000000 AS avg_v
  FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY 1),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM span
),
j AS (
  SELECT g.event_type, g.h,
         COALESCE(hourly.n_events, CAST(0 AS BIGINT)) AS n_events,
         hourly.avg_v
  FROM grid g LEFT JOIN hourly ON g.event_type = hourly.event_type AND g.h = hourly.h
)
SELECT event_type, h, n_events,
       LAST_VALUE(avg_v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value_ffill
FROM j
""",
    doc="Time-series resample + gap fill + forward fill — the missing-data "
    "treatment every metrics pipeline needs: aggregate events to an hourly "
    "grid per type, materialize EVERY hour in each type's [min,max] span via "
    "sequence()+explode (gaps appear as rows), zero-fill the counts, and "
    "forward-fill the hourly mean with last(ignorenulls) over an "
    "event_type-partitioned window. Scale shape: the grid is generated from "
    "a k-row span table (k = #types), so its size is span-hours x types — "
    "bounded by wall-clock time, never by event volume; the ffill window "
    "partitions on event_type over that bounded grid. The hourly mean uses "
    "the floor(value*1e6) exact-integer trick so both engines agree "
    "bit-for-bit regardless of accumulation order.",
)
def q_events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (
            F.sum(F.floor(F.col("value") * F.lit(1000000.0))).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000.0)
        ).alias("avg_v"),
    )
    span = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    j = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        "avg_v",
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "event_type",
        "h",
        "n_events",
        F.last("avg_v", ignorenulls=True).over(w).alias("avg_value_ffill"),
    )


@register(
    "q_global_rank_histogram",
    oracle="""
SELECT doc_id, n_chars,
       CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS global_rank
FROM documents
""",
    doc="Exact GLOBAL total-order rank WITHOUT a global sort — the "
    "distributed-ranking pattern a 100 TB curriculum/export ordering needs. "
    "A naive ROW_NUMBER() OVER (ORDER BY ...) moves the whole corpus to one "
    "partition; instead: (1) histogram the bounded-cardinality sort key "
    "(n_chars — distinct values bounded by the max document length, "
    "independent of corpus size), (2) cumulative offsets over that bounded "
    "histogram (the only unpartitioned window, data-independent size), "
    "(3) broadcast the offsets back and add a row_number within each "
    "n_chars partition (bounded partitions, tie-broken on doc_id). "
    "rank = offset_below + local_rank reproduces the global ORDER BY "
    "(n_chars, doc_id) rank exactly; the oracle IS the naive global window.",
)
def q_global_rank_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    hist = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    # bounded window: runs over the n_chars histogram (<= max doc length
    # rows), never over the documents themselves
    wh = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, W.currentRow)
    offsets = hist.select(
        "n_chars", (F.sum("cnt").over(wh) - F.col("cnt")).alias("offset_below")
    )
    wl = W.partitionBy("n_chars").orderBy("doc_id")
    return (
        docs.join(F.broadcast(offsets), "n_chars")
        .select(
            "doc_id",
            "n_chars",
            (F.col("offset_below") + F.row_number().over(wl)).cast("bigint").alias(
                "global_rank"
            ),
        )
    )


@register(
    "q_events_sliding_windows",
    oracle="""
WITH e AS (
  SELECT epoch_us(ts) AS us, user_id FROM events WHERE event_type = 'click'
),
x AS (
  SELECT make_timestamp(((us // 300000000) - j) * 300000000) AS win_start, user_id
  FROM e, (SELECT unnest(range(0, 3)) AS j)
)
SELECT win_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM x GROUP BY win_start
""",
    doc="SLIDING event-time windows (15 min window, 5 min slide) — the "
    "overlapping-window aggregation Spark's window() generator implements "
    "natively: each event lands in exactly window/slide = 3 windows, "
    "count + distinct users per window. The oracle derives the same 3 "
    "epoch-aligned window starts arithmetically (us div 300e6 minus "
    "0,1,2), so the gate pins Spark's window-assignment semantics, not "
    "just the counts. One shuffle on win_start; the 3x fan-out happens "
    "map-side in the Expand/Generate stage, exactly how it distributes.",
)
def q_events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    win = ev.select(
        F.window("ts", "15 minutes", "5 minutes").alias("w"), "user_id"
    )
    return (
        win.groupBy(F.col("w.start").alias("win_start"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )


@register(
    "q_gaps_islands",
    oracle="""
WITH daily AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS dd
  FROM events
),
tagged AS (
  SELECT user_id, dd,
         dd - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dd) AS grp
  FROM daily
)
SELECT user_id,
       CAST(MIN(dd) AS BIGINT) AS start_dd,
       CAST(COUNT(*) AS BIGINT) AS island_len
FROM tagged GROUP BY user_id, grp
HAVING COUNT(*) >= 3
""",
    doc="GAPS-AND-ISLANDS — maximal runs of consecutive active days per "
    "user, the classic streak/outage/coverage shape: distinct (user, day) "
    "→ the day-minus-row_number constant-per-run trick → groupBy (user, "
    "grp), keep streaks >= 3 days. Days are integers (datediff from a "
    "fixed epoch) so both engines agree exactly. One shuffle on user_id "
    "that the window AND the island groupBy both reuse; partitions are "
    "per-user day counts — bounded by wall-clock days, never event volume.",
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id",
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("dd"),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("dd")
    tagged = daily.withColumn("grp", F.col("dd") - F.row_number().over(w))
    return (
        tagged.groupBy("user_id", "grp")
        .agg(
            F.min("dd").cast("bigint").alias("start_dd"),
            F.count(F.lit(1)).cast("bigint").alias("island_len"),
        )
        .filter(F.col("island_len") >= 3)
        .select("user_id", "start_dd", "island_len")
    )


@register(
    "q_scd2_dim_join",
    oracle="""
WITH dim AS (
  SELECT n_nationkey, v,
         CAST(v * 800 + (n_nationkey * 37) % 400 AS BIGINT) AS valid_from_dd
  FROM nation, (SELECT unnest(range(0, 3)) AS v)
),
o AS (
  SELECT o_orderkey, c_nationkey,
         datediff('day', DATE '1992-01-01', o_orderdate) AS dd
  FROM orders JOIN customer ON o_custkey = c_custkey
),
pick AS (
  SELECT o_orderkey, c_nationkey, v,
         ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY valid_from_dd DESC, v DESC) AS rn
  FROM o JOIN dim ON c_nationkey = n_nationkey AND valid_from_dd <= dd
)
SELECT c_nationkey AS nationkey, CAST(v AS BIGINT) AS dim_version,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM pick WHERE rn = 1
GROUP BY c_nationkey, v
""",
    doc="SCD2 (slowly-changing-dimension) AS-OF JOIN — each order joins the "
    "dimension VERSION that was valid on its order date: a 3-version "
    "nation dimension (valid_from synthesized deterministically), "
    "orders×customer resolve the nation, then join versions with "
    "valid_from <= order_date and keep the latest via a row_number argmax "
    "per order. Facts dated before their dimension's first version have no "
    "valid row and are dropped (inner-join semantics — the standard SCD2 "
    "contract; a LEFT variant would surface them as NULL-version rows). "
    "Scale shape: the versioned dimension is dimension-sized "
    "(broadcasts; version count is a small constant), the fact side "
    "shuffles once on the join key, and the argmax window partitions on "
    "o_orderkey — ≤3 rows per partition by construction. Date arithmetic "
    "in integer days from a fixed epoch keeps both engines exact.",
)
def q_scd2_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    dim = nation.select(
        "n_nationkey", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("v")
    ).select(
        "n_nationkey",
        "v",
        (F.col("v") * 800 + (F.col("n_nationkey") * 37) % 400)
        .cast("bigint")
        .alias("valid_from_dd"),
    )
    o = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "o_orderkey",
        "c_nationkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).alias("dd"),
    )
    pick = (
        o.join(
            F.broadcast(dim),
            (F.col("c_nationkey") == F.col("n_nationkey"))
            & (F.col("valid_from_dd") <= F.col("dd")),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("o_orderkey").orderBy(
                    F.col("valid_from_dd").desc(), F.col("v").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        pick.groupBy("c_nationkey", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("v").cast("bigint").alias("dim_version"),
            "n_orders",
        )
    )


@register(
    "q_running_distinct",
    oracle="""
WITH first_seen AS (
  SELECT user_id,
         MIN(datediff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))) AS dd
  FROM events GROUP BY user_id
),
per_day AS (
  SELECT dd, CAST(COUNT(*) AS BIGINT) AS new_users FROM first_seen GROUP BY dd
)
SELECT CAST(dd AS BIGINT) AS dd, new_users,
       CAST(SUM(new_users) OVER (ORDER BY dd
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_distinct_users
FROM per_day
""",
    doc="Cumulative DISTINCT users to date — the growth-curve metric naive "
    "SQL writes as COUNT(DISTINCT) OVER (ORDER BY day), which re-scans "
    "every prefix (quadratic) and single-partitions the corpus. The "
    "scalable identity: distinct-to-date(d) = users whose FIRST day <= d. "
    "One groupBy(user) for first-seen, one bounded groupBy(day), then a "
    "running sum over the DAY table — the only unpartitioned window runs "
    "over rows bounded by wall-clock days, never by event volume.",
)
def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    first_seen = ev.select(
        "user_id",
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit("2024-01-01").cast("date"),
        ).alias("dd"),
    ).groupBy("user_id").agg(F.min("dd").alias("dd"))
    per_day = first_seen.groupBy("dd").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    # bounded window: runs over the per-day table (wall-clock rows)
    w = W.orderBy("dd").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per_day.select(
        F.col("dd").cast("bigint").alias("dd"),
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_distinct_users"),
    )


@register(
    "q_set_ops_all",
    oracle="""
WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_orderkey % 2 = 0),
b AS (SELECT l_suppkey FROM lineitem WHERE l_orderkey % 2 = 1)
SELECT 'inter_all' AS tag, l_suppkey, CAST(COUNT(*) AS BIGINT) AS n
FROM ((SELECT * FROM a) INTERSECT ALL (SELECT * FROM b)) GROUP BY l_suppkey
UNION ALL
SELECT 'except_all', l_suppkey, CAST(COUNT(*) AS BIGINT)
FROM ((SELECT * FROM a) EXCEPT ALL (SELECT * FROM b)) GROUP BY l_suppkey
""",
    doc="MULTISET set operations — INTERSECT ALL / EXCEPT ALL keep "
    "per-element multiplicities (min / truncated difference of counts), "
    "the semantics the DISTINCT forms in q_set_ops erase. Spark plans "
    "intersectAll/exceptAll as a count-pairing aggregate + generate — one "
    "shuffle on the value, no join of the raw multisets. Grouped to "
    "(key, count) on both engines so the gate compares multiplicities "
    "directly.",
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0).select("l_suppkey")
    b = li.filter(F.col("l_orderkey") % 2 == 1).select("l_suppkey")

    def counted(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("l_suppkey").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        ).select(F.lit(tag).alias("tag"), "l_suppkey", "n")

    return counted(a.intersectAll(b), "inter_all").unionAll(
        counted(a.exceptAll(b), "except_all")
    )


@register(
    "q_null_safe_join",
    oracle="""
WITH a AS (
  SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_custkey % 50 END AS k
  FROM customer
),
b AS (
  SELECT CASE WHEN s_suppkey % 7 = 0 THEN NULL ELSE s_suppkey % 50 END AS k
  FROM supplier
)
SELECT a.k AS k, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY a.k
""",
    doc="NULL-SAFE equality join (Spark <=> / SQL IS NOT DISTINCT FROM): "
    "NULL keys match each other instead of vanishing — the semantics "
    "needed when joining on nullable dimensions (unknown-source buckets, "
    "optional attributes). Still a hash join: the null-safe operator is a "
    "valid equi-join key for Spark's hash partitioning, so the plan is "
    "SortMergeJoin/ShuffledHashJoin on the key, never a nested loop. The "
    "NULL bucket is also the natural skew point at scale — exactly what "
    "AQE skew-join or operators/skew.py salting handles.",
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    a = cust.select(
        F.when(F.col("c_custkey") % 11 == 0, None)
        .otherwise(F.col("c_custkey") % 50)
        .alias("k")
    )
    b = supp.select(
        F.when(F.col("s_suppkey") % 7 == 0, None)
        .otherwise(F.col("s_suppkey") % 50)
        .alias("ka")
    )
    return (
        a.join(b, F.col("k").eqNullSafe(F.col("ka")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


# --------------------------------------------------- numeric histogram --
_HIST_BUCKETS = 16


@register(
    "q_histogram_numeric",
    oracle=f"""
WITH cents AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
),
bounds AS (
  SELECT MIN(c) AS lo, MAX(c) AS hi,
         (MAX(c) - MIN(c)) // {_HIST_BUCKETS} + 1 AS w
  FROM cents
)
SELECT CAST((c - b.lo) // b.w AS BIGINT) AS bucket,
       CAST(b.lo + ((c - b.lo) // b.w) * b.w AS BIGINT) AS lo_cents,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(c) AS BIGINT) AS sum_cents
FROM cents, bounds b
GROUP BY 1, 2
""",
    doc=f"Equi-width NUMERIC HISTOGRAM of l_extendedprice in {_HIST_BUCKETS} "
    "buckets with data-derived bounds — the column-profiling primitive "
    "behind range-partition planning and data-quality dashboards. All "
    "arithmetic is exact integer cents (round once, then BIGINT min/max/"
    "width/bucket — bit-identical cross-engine where float bucket edges "
    "would not be). Two passes by construction (bounds, then bucketing — "
    "the same reason MAD needs two), the 1-row bounds broadcast onto the "
    "scan, one bounded groupBy on the bucket id.",
)
def q_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c")
    )
    bounds = li.agg(
        F.min("c").alias("lo"),
        F.max("c").alias("hi"),
        F.expr(f"(MAX(c) - MIN(c)) div {_HIST_BUCKETS} + 1").alias("w"),
    )
    bucket = F.expr("(c - lo) div w")
    return (
        li.crossJoin(F.broadcast(bounds))
        .groupBy(
            bucket.cast("bigint").alias("bucket"),
            F.expr("lo + ((c - lo) div w) * w").cast("bigint").alias("lo_cents"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("c").cast("bigint").alias("sum_cents"),
        )
    )


# -------------------------------------------------- last-touch attribution --
_ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback


@register(
    "q_events_attribution",
    oracle=f"""
WITH u AS (
  SELECT event_id, user_id, ts, event_type, epoch_us(ts) AS us
  FROM events WHERE event_type IN ('click', 'purchase')
),
t AS (
  SELECT *, CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER
           (PARTITION BY user_id
            ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nclicks
  FROM u
),
clicks AS (SELECT user_id, nclicks AS seq, event_id AS c_id, us AS c_us
           FROM t WHERE event_type = 'click'),
purch AS (SELECT user_id, event_id, us, nclicks FROM t WHERE event_type = 'purchase')
SELECT p.event_id AS purchase_event_id, p.user_id,
       CASE WHEN p.us - c.c_us <= {_ATTR_WINDOW_US} THEN c.c_id END AS click_event_id,
       CASE WHEN p.us - c.c_us <= {_ATTR_WINDOW_US} THEN (p.us - c.c_us) // 1000000 END AS gap_seconds,
       COALESCE(p.us - c.c_us <= {_ATTR_WINDOW_US}, FALSE) AS attributed
FROM purch p LEFT JOIN clicks c ON c.user_id = p.user_id AND c.seq = p.nclicks
""",
    doc="Last-touch marketing attribution: each purchase attributes to the "
    f"user's most recent click ≤ 7 days before it (ties at the same "
    "microsecond count the click — clicks sort first). The scale-shaped "
    "trick: a running conditional COUNT over ONE user-keyed window numbers "
    "the clicks AND hands every purchase its latest-click ordinal in the "
    "same pass — no per-purchase subquery, no as-of range join; attribution "
    "is then a (user, ordinal) equi-join. Gap math in epoch microseconds "
    "(exact integers); rows = purchases, bounded.",
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    u = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(
            "ts",
            F.when(F.col("event_type") == "click", 0).otherwise(1),
            "event_id",
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    t = u.withColumn(
        "nclicks",
        F.count(F.when(F.col("event_type") == "click", 1)).over(w).cast("bigint"),
    )
    clicks = t.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("nclicks").alias("seq"),
        F.col("event_id").alias("c_id"),
        F.col("us").alias("c_us"),
    )
    purch = t.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "us", "nclicks"
    )
    joined = purch.join(
        clicks,
        (F.col("c_user") == F.col("user_id")) & (F.col("seq") == F.col("nclicks")),
        "left",
    )
    in_window = F.col("us") - F.col("c_us") <= _ATTR_WINDOW_US
    return joined.select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.when(in_window, F.col("c_id")).alias("click_event_id"),
        F.when(in_window, F.expr(f"(us - c_us) div 1000000")).alias("gap_seconds"),
        F.coalesce(in_window, F.lit(False)).alias("attributed"),
    )


# ------------------------------------------- behavior transition matrix --
@register(
    "q_events_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
cnt AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) AS p
FROM cnt
""",
    doc="First-order behavior model: the event-type transition matrix over "
    "per-user event sequences (LAG over one user-keyed window — the same "
    "exchange the sessionizer uses), then a bounded |types|² aggregation; "
    "row-normalized probability is ONE exact division of BIGINT counts. "
    "The user-journey summary a growth/behavior pipeline derives nightly; "
    "at 100 TB the only corpus-sized work is the single user-keyed window "
    "pass.",
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    cnt = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wr = W.partitionBy("prev_type")
    return cnt.select(
        "prev_type",
        "next_type",
        "n",
        F.sum("n").over(wr).cast("bigint").alias("row_total"),
        (F.col("n").cast("double") / F.sum("n").over(wr)).alias("p"),
    )
