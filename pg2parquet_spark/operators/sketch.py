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
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok")
    )

    def bucket(col: str, d: int) -> F.Column:
        hex8 = F.substring(F.md5(F.concat(F.lit(f"{d}|"), F.col(col))), 1, 8)
        return (F.conv(hex8, 16, 10).cast("bigint") % WIDTH).cast("int")

    cells = None
    for d in range(DEPTH):
        part = toks.groupBy(bucket("tok", d).alias("bucket")).agg(
            F.count(F.lit(1)).alias("c")
        ).select(F.lit(d).alias("depth"), "bucket", "c")
        cells = part if cells is None else cells.unionAll(part)

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
