"""Count-Min sketch over a token stream — a mergeable frequency sketch as a
pure DataFrame plan.

The reference has no sketches (it delegates aggregation to PG); this is
beyond-reference surface for the 100 TB pipeline: a CM sketch summarizes an
unbounded token stream in depth×width integer cells, is mergeable across
partitions/days (cell-wise +), and answers "how often did token t appear?"
with an overestimate bounded by ε·N. Hashing is md5-based and deterministic,
so DuckDB reproduces the sketch bit-for-bit — the estimate join IS the
oracle-gated query.

Plan shape: one explode → groupBy (depth, bucket) — a single shuffle whose
key space is depth×width (bounded, skew-free by construction). The probe
joins the bounded sketch (broadcast) against the probe tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg2parquet_spark.operators.text import normalize_text
from pg2parquet_spark.registry import register
from pg2parquet_spark.tables import table

DEPTH = 4
WIDTH = 256

# deterministic probe set: the planted stopwords + a frequent English token
PROBE_TOKENS = ("the", "of", "and", "data", "zz0")


def _bucket_sql(tok: str, d: int) -> str:
    # first 8 hex chars of md5(d|token) → int → mod WIDTH (same in both engines)
    return (
        f"CAST(from_hex(substr(md5('{d}|' || {tok}), 1, 8)) AS INT) % {WIDTH}"
        if False
        else f"CAST(CAST('0x' || substr(md5('{d}|' || {tok}), 1, 8) AS BIGINT) % {WIDTH} AS INT)"
    )


@register(
    "sketch_countmin_tokens",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
cells AS (
  {" UNION ALL ".join(f"SELECT {d} AS depth, {_bucket_sql('tok', d)} AS bucket, COUNT(*) AS c FROM toks GROUP BY 2" for d in range(DEPTH))}
),
probes AS (
  {" UNION ALL ".join(f"SELECT '{t}' AS token" for t in PROBE_TOKENS)}
),
probe_cells AS (
  {" UNION ALL ".join(f"SELECT token, {d} AS depth, {_bucket_sql('token', d)} AS bucket FROM probes" for d in range(DEPTH))}
),
est AS (
  SELECT token, MIN(COALESCE(c, 0)) AS cm_estimate
  FROM probe_cells LEFT JOIN cells USING (depth, bucket)
  GROUP BY token
),
truth AS (
  SELECT tok AS token, COUNT(*) AS true_count FROM toks GROUP BY 1
)
SELECT est.token, CAST(cm_estimate AS BIGINT) AS cm_estimate,
       CAST(COALESCE(true_count, 0) AS BIGINT) AS true_count
FROM est LEFT JOIN truth USING (token)
""",
    doc=f"Count-Min sketch ({DEPTH}×{WIDTH}, md5 row-hashes): build the sketch in one "
    "explode+groupBy whose key space is bounded (depth×width — skew-free by "
    "construction), then answer point frequency queries as min-over-rows, "
    "reported next to the true counts (CM guarantees estimate >= truth). "
    "Mergeable across partitions/time by cell-wise addition — the streaming/"
    "backfill-friendly summary for 100 TB token streams.",
)
def sketch_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.tables import spread_scan

    # widen: the corpus is one single-row-group file → a 1-task scan would
    # single-thread the tokenize+hash stage (cf. multimodal._widen);
    # spread_scan adds no exchange once the scan fills the cluster (r12)
    docs = spread_scan(table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok")
    )

    def bucket(col: str, d: int) -> F.Column:
        hex8 = F.substring(F.md5(F.concat(F.lit(f"{d}|"), F.col(col))), 1, 8)
        return (F.conv(hex8, 16, 10).cast("bigint") % WIDTH).cast("int")

    # ONE tokenize pass: each token emits its DEPTH (depth, bucket) cells
    # map-side, then a single (depth, bucket) shuffle builds the whole
    # sketch. The previous per-depth groupBy union re-ran the tokenize
    # subtree DEPTH times (4 extra corpus scans at 100 TB).
    pairs = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"), bucket("tok", d).alias("bucket")
                    )
                    for d in range(DEPTH)
                ]
            )
        ).alias("p")
    )
    cells = pairs.groupBy(
        F.col("p.depth").alias("depth"), F.col("p.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))

    probes = spark.createDataFrame([(t,) for t in PROBE_TOKENS], "token string")
    probe_cells = None
    for d in range(DEPTH):
        pc = probes.select("token", F.lit(d).alias("depth"), bucket("token", d).alias("bucket"))
        probe_cells = pc if probe_cells is None else probe_cells.unionAll(pc)

    est = (
        probe_cells.join(F.broadcast(cells), ["depth", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cm_estimate"))
    )
    truth = toks.groupBy(F.col("tok").alias("token")).agg(
        F.count(F.lit(1)).alias("true_count")
    )
    return est.join(truth, "token", "left").select(
        "token",
        F.col("cm_estimate").cast("bigint").alias("cm_estimate"),
        F.coalesce(F.col("true_count"), F.lit(0)).cast("bigint").alias("true_count"),
    )


# ------------------------------------------------------------------- HLL ---

HLL_M = 64          # registers (p=6)
HLL_CAP = 40        # rank cap: keeps 2^(CAP-rank) terms inside BIGINT
# alpha_m * m^2 * 2^CAP, rounded once in Python so BOTH engines divide the
# SAME exact integer (no float-literal folding differences).
HLL_NUM = round(0.709 * HLL_M * HLL_M * 2**HLL_CAP)

# leading-zero bits of the 64-bit word substr(md5, 9, 16): 4 per leading '0'
# hex char plus 0-3 from the first non-zero hex digit.
_EXTRA_CASE = (
    "CASE substr(ltrimmed, 1, 1) WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
    "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 ELSE 0 END"
)


@register(
    "sketch_hll_distinct",
    oracle=f"""
WITH toks AS (
  SELECT DISTINCT unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
hashed AS (
  SELECT CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {HLL_M} AS INT) AS bucket,
         substr(md5(tok), 9, 16) AS w_hex
  FROM toks
),
ranks AS (
  SELECT bucket,
         LEAST({HLL_CAP}, 4 * (16 - length(ltrimmed)) + {_EXTRA_CASE} + 1) AS rank
  FROM (SELECT bucket, trim(LEADING '0' FROM w_hex) AS ltrimmed FROM hashed) t
),
regs AS (
  SELECT bucket, MAX(rank) AS rmax FROM ranks GROUP BY bucket
),
harm AS (
  SELECT SUM(CAST(1 AS BIGINT) << ({HLL_CAP} - rmax)) AS filled, COUNT(*) AS nb FROM regs
)
SELECT CAST({HLL_M} AS INT) AS m,
       CAST(({HLL_NUM} * CAST(1000 AS BIGINT)) // (filled + ({HLL_M} - nb) * (CAST(1 AS BIGINT) << {HLL_CAP})) AS BIGINT) AS hll_est_x1000,
       (SELECT COUNT(*) FROM toks) AS exact_distinct
FROM harm
""",
    doc=f"HyperLogLog distinct-count sketch (m={HLL_M} registers, md5 hashes): "
    "bucket = hash mod m, register = max leading-zero rank. The harmonic mean "
    "is computed in EXACT integer arithmetic (sum of 2^(cap-rank) as BIGINT, "
    "then one integer division) so Spark and DuckDB agree bit-for-bit — the "
    "float estimate formula is order-nondeterministic, the scaled-integer one "
    "is not. Registers are mergeable by cell-wise MAX across partitions/days; "
    "the shuffle key space is m (bounded, skew-free) — the 100 TB-safe way to "
    "count distincts without a giant exact GROUP BY. NOTE: this is the RAW "
    "estimator, deliberately omitting the small-range linear-counting "
    "correction (which needs a float log) so Spark and DuckDB agree "
    "bit-for-bit in integer arithmetic; below ~2.5m distinct values the raw "
    "estimate is biased — production use at low fill should add the "
    "linear-counting branch and drop the cross-engine-exactness constraint.",
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok")
    ).distinct()

    h = F.md5(F.col("tok"))
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % HLL_M).cast("int")
    w_hex = F.substring(h, 9, 16)
    hashed = toks.select(bucket.alias("bucket"), w_hex.alias("w_hex"))

    ranks = hashed.select(
        "bucket", F.expr("trim(LEADING '0' FROM w_hex)").alias("ltrimmed")
    ).select(
        "bucket",
        F.least(
            F.lit(HLL_CAP),
            F.lit(4) * (F.lit(16) - F.length("ltrimmed")) + F.expr(_EXTRA_CASE) + F.lit(1),
        ).alias("rank"),
    )
    # carry the per-bucket row count through the register agg so the exact
    # distinct total (= rows of `ranks`, toks is already distinct) falls out
    # of the SAME single pipeline — the expensive token-dedup shuffle runs
    # once, with no second consumer of `toks` and no persist needed
    regs = ranks.groupBy("bucket").agg(
        F.max("rank").alias("rmax"), F.count(F.lit(1)).alias("cnt")
    )
    harm = regs.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_CAP} - rmax)")).alias("filled"),
        F.count(F.lit(1)).alias("nb"),
        F.sum("cnt").alias("exact_distinct"),
    )
    return harm.select(
        F.lit(HLL_M).cast("int").alias("m"),
        F.expr(
            f"({HLL_NUM} * CAST(1000 AS BIGINT)) div "
            f"(filled + ({HLL_M} - nb) * shiftleft(CAST(1 AS BIGINT), {HLL_CAP}))"
        ).cast("bigint").alias("hll_est_x1000"),
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
    )


# Linear-counting table: with m registers and V of them empty, the standard
# small-range correction is m·ln(m/V). V only takes values 0..m, so the whole
# float computation happens ONCE here in Python and ships to BOTH engines as
# the same integer CASE table — cross-engine agreement stays bit-exact
# without either engine evaluating a log.
import math as _math

_LC_X1000 = {v: round(1000 * HLL_M * _math.log(HLL_M / v)) for v in range(1, HLL_M)}
_LC_CASE = (
    "CASE v "
    + " ".join(f"WHEN {v} THEN {est}" for v, est in _LC_X1000.items())
    + " END"
)
# standard HLL switch point: use linear counting when the raw estimate is
# below 2.5·m and at least one register is empty
_LC_THRESHOLD_X1000 = 2500 * HLL_M


@register(
    "sketch_hll_corrected",
    oracle=f"""
WITH toks AS (
  SELECT DISTINCT unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
hashed AS (
  SELECT CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {HLL_M} AS INT) AS bucket,
         substr(md5(tok), 9, 16) AS w_hex
  FROM toks
),
ranks AS (
  SELECT bucket,
         LEAST({HLL_CAP}, 4 * (16 - length(ltrimmed)) + {_EXTRA_CASE} + 1) AS rank
  FROM (SELECT bucket, trim(LEADING '0' FROM w_hex) AS ltrimmed FROM hashed) t
),
regs AS (
  SELECT bucket, MAX(rank) AS rmax FROM ranks GROUP BY bucket
),
harm AS (
  SELECT SUM(CAST(1 AS BIGINT) << ({HLL_CAP} - rmax)) AS filled, COUNT(*) AS nb FROM regs
),
est AS (
  SELECT CAST(({HLL_NUM} * CAST(1000 AS BIGINT)) // (filled + ({HLL_M} - nb) * (CAST(1 AS BIGINT) << {HLL_CAP})) AS BIGINT) AS raw_x1000,
         {HLL_M} - nb AS v
  FROM harm
)
SELECT CAST({HLL_M} AS INT) AS m,
       CAST(v AS BIGINT) AS empty_registers,
       raw_x1000 AS raw_est_x1000,
       CAST(CASE WHEN v > 0 AND raw_x1000 <= {_LC_THRESHOLD_X1000}
                 THEN {_LC_CASE}
                 ELSE raw_x1000 END AS BIGINT) AS hll_est_x1000,
       (SELECT COUNT(*) FROM toks) AS exact_distinct
FROM est
""",
    doc="HyperLogLog WITH the small-range linear-counting correction the raw "
    "query deliberately omits: when the raw estimate is below 2.5·m and V "
    "registers are empty, the estimate switches to m·ln(m/V). V only takes "
    "integer values 0..m, so the log table is precomputed once in Python and "
    "shipped to both engines as one integer CASE expression — the correction "
    "costs no float evaluation in either engine and the cross-engine gate "
    "stays bit-exact. Use this variant below ~2.5m distincts per sketch "
    "(where the raw estimator is biased); use sketch_hll_distinct when raw "
    "register semantics are wanted. Same bounded m-key shuffle shape.",
)
def sketch_hll_corrected(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok")
    ).distinct()

    h = F.md5(F.col("tok"))
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % HLL_M).cast("int")
    w_hex = F.substring(h, 9, 16)
    hashed = toks.select(bucket.alias("bucket"), w_hex.alias("w_hex"))

    ranks = hashed.select(
        "bucket", F.expr("trim(LEADING '0' FROM w_hex)").alias("ltrimmed")
    ).select(
        "bucket",
        F.least(
            F.lit(HLL_CAP),
            F.lit(4) * (F.lit(16) - F.length("ltrimmed")) + F.expr(_EXTRA_CASE) + F.lit(1),
        ).alias("rank"),
    )
    regs = ranks.groupBy("bucket").agg(
        F.max("rank").alias("rmax"), F.count(F.lit(1)).alias("cnt")
    )
    harm = regs.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_CAP} - rmax)")).alias("filled"),
        F.count(F.lit(1)).alias("nb"),
        F.sum("cnt").alias("exact_distinct"),
    )
    est = harm.select(
        F.expr(
            f"({HLL_NUM} * CAST(1000 AS BIGINT)) div "
            f"(filled + ({HLL_M} - nb) * shiftleft(CAST(1 AS BIGINT), {HLL_CAP}))"
        ).cast("bigint").alias("raw_x1000"),
        (F.lit(HLL_M) - F.col("nb")).alias("v"),
        "exact_distinct",
    )
    return est.select(
        F.lit(HLL_M).cast("int").alias("m"),
        F.col("v").cast("bigint").alias("empty_registers"),
        F.col("raw_x1000").alias("raw_est_x1000"),
        F.when(
            (F.col("v") > 0) & (F.col("raw_x1000") <= _LC_THRESHOLD_X1000),
            F.expr(_LC_CASE),
        )
        .otherwise(F.col("raw_x1000"))
        .cast("bigint")
        .alias("hll_est_x1000"),
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
    )


# ----------------------------------------------------------------- Bloom ---

BLOOM_M = 8192   # bits
BLOOM_K = 3      # hash functions


def _bloom_pos_sql(key: str, i: int) -> str:
    return (
        f"CAST(CAST('0x' || substr(md5('{i}|' || CAST({key} AS VARCHAR)), 1, 8) AS BIGINT)"
        f" % {BLOOM_M} AS INT)"
    )


@register(
    "sketch_bloom_membership",
    oracle=f"""
WITH bits AS (
  SELECT DISTINCT pos FROM (
    {" UNION ALL ".join(f"SELECT {_bloom_pos_sql('o_custkey', i)} AS pos FROM orders" for i in range(BLOOM_K))}
  ) t
),
probes AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0
),
probe_bits AS (
  {" UNION ALL ".join(f"SELECT c_custkey, {_bloom_pos_sql('c_custkey', i)} AS pos FROM probes" for i in range(BLOOM_K))}
),
hits AS (
  SELECT c_custkey, COUNT(bits.pos) AS nhit
  FROM probe_bits LEFT JOIN bits USING (pos)
  GROUP BY c_custkey
)
SELECT h.c_custkey,
       nhit = {BLOOM_K} AS bloom_present,
       EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = h.c_custkey) AS truly_present
FROM hits h
""",
    doc=f"Bloom-filter membership (m={BLOOM_M} bits, k={BLOOM_K} md5 hashes): the "
    "bit set is built as DISTINCT positions over the build side (shuffle key "
    "space bounded by m), then broadcast to probe-side lookups — the classic "
    "semi-join pre-filter that skips shuffling the big side at 100 TB. "
    "Output reports bloom_present next to ground truth; the no-false-negative "
    "invariant is oracle-checked row by row.",
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    customer = table(spark, sf_dir, "customer").select("c_custkey")

    def pos(col: F.Column, i: int) -> F.Column:
        hex8 = F.substring(F.md5(F.concat(F.lit(f"{i}|"), col.cast("string"))), 1, 8)
        return (F.conv(hex8, 16, 10).cast("bigint") % BLOOM_M).cast("int")

    bits = None
    for i in range(BLOOM_K):
        b = orders.select(pos(F.col("o_custkey"), i).alias("pos"))
        bits = b if bits is None else bits.unionAll(b)
    bits = bits.distinct()  # ≤ BLOOM_M rows → broadcastable by construction

    probes = customer.filter(F.col("c_custkey") % 10 == 0)
    probe_bits = None
    for i in range(BLOOM_K):
        pb = probes.select("c_custkey", pos(F.col("c_custkey"), i).alias("pos"))
        probe_bits = pb if probe_bits is None else probe_bits.unionAll(pb)

    # count a marker from the bits side — the join key itself survives the
    # left join even on misses, so counting it would always give K
    hits = (
        probe_bits.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("hit")).alias("nhit"))
    )
    truth = orders.select(F.col("o_custkey").alias("c_custkey")).distinct().withColumn(
        "truly_present", F.lit(True)
    )
    return (
        hits.join(truth, "c_custkey", "left")
        .select(
            "c_custkey",
            (F.col("nhit") == BLOOM_K).alias("bloom_present"),
            F.coalesce(F.col("truly_present"), F.lit(False)).alias("truly_present"),
        )
    )


@register(
    "sketch_hll_by_source",
    oracle=f"""
WITH toks AS (
  SELECT DISTINCT source,
         unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
hashed AS (
  SELECT source,
         CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {{HLL_M}} AS INT) AS bucket,
         substr(md5(tok), 9, 16) AS w_hex
  FROM toks
),
ranks AS (
  SELECT source, bucket,
         LEAST({{HLL_CAP}}, 4 * (16 - length(ltrimmed)) + {{_EXTRA_CASE}} + 1) AS rank
  FROM (SELECT source, bucket, trim(LEADING '0' FROM w_hex) AS ltrimmed FROM hashed) t
),
regs AS (
  SELECT source, bucket, MAX(rank) AS rmax, COUNT(*) AS cnt
  FROM ranks GROUP BY source, bucket
),
harm AS (
  SELECT source,
         SUM(CAST(1 AS BIGINT) << ({{HLL_CAP}} - rmax)) AS filled,
         COUNT(*) AS nb,
         CAST(SUM(cnt) AS BIGINT) AS exact_distinct
  FROM regs GROUP BY source
)
SELECT source,
       CAST(({{HLL_NUM}} * CAST(1000 AS BIGINT)) // (filled + ({{HLL_M}} - nb) * (CAST(1 AS BIGINT) << {{HLL_CAP}})) AS BIGINT) AS hll_est_x1000,
       exact_distinct
FROM harm
""".format(HLL_M=HLL_M, HLL_CAP=HLL_CAP, HLL_NUM=HLL_NUM, _EXTRA_CASE=_EXTRA_CASE),
    doc="GROUPED HyperLogLog: one register set per source (the realistic "
    "shape - distinct counts per domain/day/shard in one pass). Register "
    "state is (groups x m) and mergeable by cell-wise MAX, so a 100 TB "
    "corpus rolls up per-partition sketches without ever shuffling raw "
    "values; the same exact-integer harmonic mean as sketch_hll_distinct "
    "keeps both engines bit-identical. The exact per-source distinct rides "
    "the same pipeline for error accounting.",
)
def sketch_hll_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok"),
    ).distinct()
    h = F.md5(F.col("tok"))
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % HLL_M).cast("int")
    hashed = toks.select("source", bucket.alias("bucket"), F.substring(h, 9, 16).alias("w_hex"))
    ranks = hashed.select(
        "source", "bucket", F.expr("trim(LEADING '0' FROM w_hex)").alias("ltrimmed")
    ).select(
        "source",
        "bucket",
        F.least(
            F.lit(HLL_CAP),
            F.lit(4) * (F.lit(16) - F.length("ltrimmed")) + F.expr(_EXTRA_CASE) + F.lit(1),
        ).alias("rank"),
    )
    regs = ranks.groupBy("source", "bucket").agg(
        F.max("rank").alias("rmax"), F.count(F.lit(1)).alias("cnt")
    )
    harm = regs.groupBy("source").agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_CAP} - rmax)")).alias("filled"),
        F.count(F.lit(1)).alias("nb"),
        F.sum("cnt").cast("bigint").alias("exact_distinct"),
    )
    return harm.select(
        "source",
        F.expr(
            f"({HLL_NUM} * CAST(1000 AS BIGINT)) div "
            f"(filled + ({HLL_M} - nb) * shiftleft(CAST(1 AS BIGINT), {HLL_CAP}))"
        ).cast("bigint").alias("hll_est_x1000"),
        "exact_distinct",
    )


# --------------------------------------------------- quantile histogram --
_QH_TARGETS = (50, 90, 99)


@register(
    "sketch_quantile_hist",
    oracle=f"""
WITH b AS (
  SELECT CAST(floor(value * 2) AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
c AS (SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin) AS cum FROM b),
t AS (SELECT unnest([{", ".join(str(q) for q in _QH_TARGETS)}]) AS q,
             (SELECT COUNT(*) FROM events) AS n)
SELECT CAST(q AS BIGINT) AS q,
       CAST(MIN(bin) AS BIGINT) AS est_bin,
       CAST(MIN(bin) AS DOUBLE) / 2 AS est_edge,
       CAST(n AS BIGINT) AS n
FROM t JOIN c ON c.cum * 100 >= q * n
GROUP BY q, n
""",
    doc="Mergeable equi-width histogram quantile sketch (the 4th sketch "
    "family next to Count-Min/HLL/Bloom): fixed 0.5-wide bins over "
    "events.value, per-partition counts merge by ADDITION (the map-side "
    "combine IS the sketch merge), then p50/p90/p99 read off the "
    "cumulative histogram. Quantile selection is pure integer arithmetic "
    "(100*cum >= q*n — no ceil, no float rank), so both engines agree "
    "exactly. The cumulative window runs over the BIN table, whose size is "
    "bounded by the value range / bin width, never by the data — that is "
    "what makes a histogram a sketch. Bin width is the accuracy dial; a "
    "production deployment re-bins the tails (t-digest-style) without "
    "changing the shape.",
)
def sketch_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    bins = (
        ev.select(F.floor(F.col("value") * 2).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # single-partition window: bounded by the BIN count (a few dozen), not
    # by the data — safe at any corpus scale
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = bins.withColumn("cum", F.sum("cnt").over(w))
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    targets = tot.select(
        F.explode(F.array(*[F.lit(q) for q in _QH_TARGETS])).alias("q"), "n"
    )
    # 3-row broadcast side against the bounded bin table: the nested-loop
    # here is bins x 3, not data-sized
    hit = targets.join(
        F.broadcast(cum), F.col("cum") * 100 >= F.col("q") * F.col("n")
    )
    return hit.groupBy("q", "n").agg(F.min("bin").alias("est_bin")).select(
        F.col("q").cast("bigint").alias("q"),
        F.col("est_bin").cast("bigint").alias("est_bin"),
        (F.col("est_bin").cast("double") / 2).alias("est_edge"),
        F.col("n").cast("bigint").alias("n"),
    )


# --------------------------------------------------- KMV (theta-style) -----
KMV_K = 64
_KMV_M = 1 << 48  # hash space: first 12 hex chars of md5


def _kmv_side_sql(event_type: str) -> str:
    """k smallest 48-bit md5 hashes of the distinct user set for one event
    type — the KMV sketch of that set, as SQL."""
    return (
        "SELECT CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS BIGINT) AS h "
        f"FROM (SELECT DISTINCT user_id FROM events WHERE event_type = '{event_type}') "
        f"ORDER BY h LIMIT {KMV_K}"
    )


@register(
    "sketch_kmv_intersection",
    oracle=f"""
WITH ka AS ({_kmv_side_sql('click')}),
kb AS ({_kmv_side_sql('purchase')}),
ku AS (
  SELECT h FROM (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb))
  ORDER BY h LIMIT {KMV_K}
),
stats AS (
  SELECT CAST(MAX(h) AS BIGINT) AS theta,
         CAST(COUNT(*) AS BIGINT) AS k_eff,
         CAST(SUM(CASE WHEN h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
                       THEN 1 ELSE 0 END) AS BIGINT) AS overlap
  FROM ku
)
SELECT CAST({KMV_K} AS BIGINT) AS k, theta, overlap,
       CASE WHEN k_eff < {KMV_K} THEN k_eff
            ELSE CAST(FLOOR((k_eff - 1) * CAST({_KMV_M} AS DOUBLE) / theta) AS BIGINT)
       END AS est_union,
       CASE WHEN k_eff < {KMV_K} THEN overlap
            ELSE CAST(FLOOR(FLOOR((k_eff - 1) * CAST({_KMV_M} AS DOUBLE) / theta) * overlap / {KMV_K}) AS BIGINT)
       END AS est_intersection
FROM stats
""",
    doc="KMV (k-minimum-values / theta-style) sketch SET OPERATIONS — the "
    "4th cardinality capability next to HLL: estimate |A∪B| and |A∩B| for "
    "the click-user and purchase-user sets from two k=64 sketches alone. "
    "Each side keeps only its k smallest 48-bit md5 hashes (Spark: "
    "per-partition heap via TakeOrderedAndProject — no global sort, sketch "
    "size independent of data); sketches MERGE by 'union then re-truncate', "
    "exactly how a 1000-executor rollup would combine per-day sketches. "
    "theta = k-th smallest of the union; est_union = (k-1)·M/theta; "
    "est_inter = est_union · overlap/k (the Jaccard correction); when the "
    "union holds fewer than k distinct hashes the sketch IS the exact set "
    "and exact counts are reported (the standard KMV small-range branch). "
    "All arithmetic is integer or single-division DOUBLE with FLOOR, so "
    "both engines agree bit-for-bit.",
)
def sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")

    def side(event_type: str) -> DataFrame:
        h = F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
        ).cast("bigint")
        return (
            ev.filter(F.col("event_type") == event_type)
            .select("user_id")
            .distinct()
            .select(h.alias("h"))
            .orderBy("h")
            .limit(KMV_K)
        )

    ka, kb = side("click"), side("purchase")
    ku = (
        ka.unionAll(kb)
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
    )
    # the three sketches are <= k rows each: broadcast membership joins
    in_a = ku.join(F.broadcast(ka.withColumnRenamed("h", "ha")), F.col("h") == F.col("ha"), "left_semi")
    in_both = in_a.join(F.broadcast(kb.withColumnRenamed("h", "hb")), F.col("h") == F.col("hb"), "left_semi")
    stats = ku.agg(
        F.max("h").cast("bigint").alias("theta"),
        F.count(F.lit(1)).cast("bigint").alias("k_eff"),
    ).crossJoin(in_both.agg(F.count(F.lit(1)).cast("bigint").alias("overlap")))
    full = F.col("k_eff") >= KMV_K
    est_full = F.floor(
        (F.col("k_eff") - 1) * F.lit(float(_KMV_M)) / F.col("theta")
    ).cast("bigint")
    # undersized sketch (fewer distinct hashes than k): the sketch IS the
    # exact set — report exact counts, the standard KMV small-range branch
    return stats.select(
        F.lit(KMV_K).cast("bigint").alias("k"),
        "theta",
        "overlap",
        F.when(full, est_full).otherwise(F.col("k_eff")).alias("est_union"),
        F.when(
            full,
            F.floor(est_full * F.col("overlap") / F.lit(KMV_K)).cast("bigint"),
        )
        .otherwise(F.col("overlap"))
        .alias("est_intersection"),
    )


# ----------------------------------------------- HLL register-merge rollup --
@register(
    "sketch_hll_rollup_merge",
    oracle=f"""
WITH hashed AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % {HLL_M} AS INT) AS bucket,
         substr(md5(CAST(user_id AS VARCHAR)), 9, 16) AS w_hex
  FROM events
),
ranks AS (
  SELECT day, bucket,
         LEAST({HLL_CAP}, 4 * (16 - length(ltrimmed)) + {_EXTRA_CASE} + 1) AS rank
  FROM (SELECT day, bucket, trim(LEADING '0' FROM w_hex) AS ltrimmed FROM hashed) t
),
day_regs AS (
  SELECT day, bucket, MAX(rank) AS rmax FROM ranks GROUP BY day, bucket
),
merged_regs AS (
  SELECT 'ALL' AS day, bucket, MAX(rmax) AS rmax FROM day_regs GROUP BY bucket
),
all_regs AS (SELECT * FROM day_regs UNION ALL SELECT * FROM merged_regs),
est AS (
  SELECT day,
         SUM(CAST(1 AS BIGINT) << ({HLL_CAP} - rmax)) AS filled,
         COUNT(*) AS nb
  FROM all_regs GROUP BY day
)
SELECT day,
       CAST(({HLL_NUM} * CAST(1000 AS BIGINT)) // (filled + ({HLL_M} - nb) * (CAST(1 AS BIGINT) << {HLL_CAP})) AS BIGINT) AS hll_est_x1000
FROM est
""",
    doc="HLL MERGEABILITY as a query — the property that makes sketches the "
    "100 TB answer to distinct counting: per-day distinct-user registers "
    "(bucket-wise MAX of md5 ranks) estimate each day, and the full-period "
    "'ALL' row is computed by MERGING the daily REGISTERS (cell-wise MAX) "
    "— the raw events are never rescanned for the rollup, exactly how a "
    "production pipeline serves day/week/month/all-time distincts from one "
    "stored register table. Same exact-integer estimator as "
    "sketch_hll_distinct (bit-identical cross-engine). Plan: one map-side "
    "hash pass, one (day, bucket) shuffle (key space = days x "
    f"{HLL_M}, bounded and skew-free), then the merge folds "
    f"{HLL_M}-row groups — the rollup costs O(days x m), independent of "
    "event count.",
)
def sketch_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    h = F.md5(F.col("user_id").cast("string"))
    hashed = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % HLL_M)
        .cast("int")
        .alias("bucket"),
        F.substring(h, 9, 16).alias("w_hex"),
    )
    ranks = hashed.select(
        "day",
        "bucket",
        F.expr("trim(LEADING '0' FROM w_hex)").alias("ltrimmed"),
    ).select(
        "day",
        "bucket",
        F.least(
            F.lit(HLL_CAP),
            F.lit(4) * (F.lit(16) - F.length("ltrimmed")) + F.expr(_EXTRA_CASE) + F.lit(1),
        ).alias("rank"),
    )
    day_regs = ranks.groupBy("day", "bucket").agg(F.max("rank").alias("rmax"))
    merged_regs = day_regs.groupBy("bucket").agg(F.max("rmax").alias("rmax")).select(
        F.lit("ALL").alias("day"), "bucket", "rmax"
    )
    all_regs = day_regs.unionAll(merged_regs)
    est = all_regs.groupBy("day").agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_CAP} - rmax)")).alias("filled"),
        F.count(F.lit(1)).alias("nb"),
    )
    return est.select(
        "day",
        F.expr(
            f"({HLL_NUM} * CAST(1000 AS BIGINT)) div "
            f"(filled + ({HLL_M} - nb) * shiftleft(CAST(1 AS BIGINT), {HLL_CAP}))"
        ).cast("bigint").alias("hll_est_x1000"),
    )
