"""Corpus-curation operators for training-data pipelines (beyond-reference
surface): benchmark decontamination and sequence packing.

- Decontamination: the step every serious pretraining pipeline runs before
  training — find training documents that share n-gram shingles with an
  evaluation/benchmark set, so eval data can be excluded from the corpus.
  The benchmark side is tiny by construction (benchmarks are thousands of
  documents; corpora are billions), so its distinct shingle set broadcasts
  and the training side is touched exactly once: explode → broadcast
  semi-overlap join → one groupBy(doc_id) shuffle. No all-pairs anything.

- Sequence packing: assign documents to fixed-token-budget training
  sequences. Packing is inherently order-dependent, so the deterministic
  contract is: documents are processed in doc_id order WITHIN a hash
  bucket, and a document's sequence is floor(prev_cum_tokens / SEQ_LEN) —
  token-contiguous filling where a document may straddle a boundary (it
  opens the next sequence). Bucketing makes the window distributed — each
  bucket's prefix sum is independent, so 100 TB packs as N parallel
  windows instead of one global sort — and the bucket count is the
  parallelism dial.

Determinism: counts and integer divisions only; the single ratio column is
one division of two exact ints (identical IEEE result in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pg2parquet_spark.operators.text import normalize_text, word_shingles
from pg2parquet_spark.registry import register
from pg2parquet_spark.tables import table

# benchmark set: every 97th document stands in for the eval benchmark
_BENCH_MOD = 97
# a training doc is flagged when it shares at least this many distinct
# 3-gram shingles with the benchmark set
_CONTAM_MIN_OVERLAP = 3

SEQ_LEN = 512   # token budget per packed training sequence
N_BUCKETS = 16  # independent packing streams (the parallelism dial)


@register(
    "pipeline_decontaminate",
    oracle=rf"""
WITH normed AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm FROM documents
),
shingled AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM (SELECT doc_id, string_split(norm, ' ') AS toks FROM normed)
),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM shingled WHERE doc_id % {_BENCH_MOD} = 0),
train AS (
  SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS s
  FROM shingled WHERE doc_id % {_BENCH_MOD} <> 0
),
overlap AS (
  SELECT doc_id, n_shingles, COUNT(*) AS n_overlap
  FROM train JOIN bench USING (s)
  GROUP BY doc_id, n_shingles
)
SELECT doc_id,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_overlap AS BIGINT) AS n_overlap,
       CAST(n_overlap AS DOUBLE) / n_shingles AS overlap_ratio
FROM overlap WHERE n_overlap >= {_CONTAM_MIN_OVERLAP}
""",
    doc="Benchmark decontamination: training documents sharing >= "
    f"{_CONTAM_MIN_OVERLAP} distinct 3-gram shingles with the benchmark "
    f"subset (doc_id % {_BENCH_MOD} == 0). The benchmark shingle set is "
    "small by construction (benchmarks don't grow with the corpus) and "
    "broadcasts; the training side is exploded once and aggregated in a "
    "single doc_id shuffle — the corpus is never self-joined. At 100 TB "
    "the benchmark set is the same broadcast and the cost stays one pass "
    "over the corpus.",
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.array_distinct(word_shingles(F.col("text"), 3)).alias("sh")
    )
    bench = (
        sh.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    train = sh.filter(F.col("doc_id") % _BENCH_MOD != 0).select(
        "doc_id", F.size("sh").alias("n_shingles"), F.explode("sh").alias("s")
    )
    return (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= _CONTAM_MIN_OVERLAP)
        .select(
            "doc_id",
            F.col("n_shingles").cast("bigint").alias("n_shingles"),
            F.col("n_overlap").cast("bigint").alias("n_overlap"),
            (F.col("n_overlap").cast("double") / F.col("n_shingles")).alias(
                "overlap_ratio"
            ),
        )
    )


@register(
    "pipeline_sequence_pack",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, doc_id % {N_BUCKETS} AS bucket,
         len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, bucket, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
  FROM t
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(cum_prev // {SEQ_LEN} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM packed GROUP BY bucket, seq_id
""",
    doc=f"Sequence packing for training batches: documents fill {SEQ_LEN}-token "
    f"sequences in doc_id order within {N_BUCKETS} independent hash buckets "
    "(seq = floor(prev-cumulative-tokens / budget); a straddling doc opens "
    "the next sequence). The bucket is the window PARTITION key, so the "
    "prefix sum is a distributed window — never a single global sort — and "
    "bucket count scales the parallelism at 100 TB. Output is per-sequence "
    "occupancy stats (docs, tokens, doc-id span).",
)
def pipeline_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % N_BUCKETS).alias("bucket"),
        F.size(F.split(normalize_text(F.col("text")), " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = t.withColumn("cum_prev", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        packed.groupBy(
            F.col("bucket").cast("bigint").alias("bucket"),
            F.expr(f"cum_prev div {SEQ_LEN}").cast("bigint").alias("seq_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


CHUNK_TOKENS = 64   # tokens per training chunk
CHUNK_STRIDE = 56   # overlap = CHUNK_TOKENS - CHUNK_STRIDE


@register(
    "pipeline_chunk_documents",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
ks AS (
  SELECT doc_id, toks, unnest(range(0, (len(toks) - 1) // {CHUNK_STRIDE} + 1)) AS k
  FROM t
)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(toks, k * {CHUNK_STRIDE} + 1,
                 least(k * {CHUNK_STRIDE} + {CHUNK_TOKENS}, len(toks)))) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, k * {CHUNK_STRIDE} + 1,
                 least(k * {CHUNK_STRIDE} + {CHUNK_TOKENS}, len(toks))), ' ')) AS chunk_hash
FROM ks
""",
    doc=f"Document chunking for training/RAG: overlapping {CHUNK_TOKENS}-token "
    f"windows at stride {CHUNK_STRIDE} (8-token overlap), emitted as "
    "(doc_id, chunk_idx, token count, content hash). The window index list "
    "is computed per row and exploded — a pure map with no shuffle, so "
    "chunking 100 TB is embarrassingly parallel and output size is "
    "amplified only by the overlap factor.",
)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = F.split(normalize_text(F.col("text")), " ")
    n = F.size(F.col("toks"))
    ks = F.sequence(F.lit(0), ((n - 1) / F.lit(CHUNK_STRIDE)).cast("int"))
    chunk = F.slice(
        F.col("toks"), F.col("k") * CHUNK_STRIDE + 1, F.lit(CHUNK_TOKENS)
    )
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.explode(ks).alias("k"))
        .select(
            "doc_id",
            F.col("k").cast("bigint").alias("chunk_idx"),
            F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
    )


@register(
    "pipeline_upsert_latest",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, event_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
)
SELECT user_id, event_type, event_id AS last_event_id, ts AS last_ts,
       CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS last_value
FROM ranked WHERE rk = 1
""",
    doc="CDC latest-wins compaction (the MERGE/upsert snapshot step of an "
    "incremental pipeline): collapse an event stream to the newest row per "
    "(user_id, event_type) key, ties broken by event_id so replays are "
    "deterministic. One shuffle on the key; at 100 TB this is the standard "
    "log-to-snapshot compaction and partitions by the same key the "
    "snapshot is stored under.",
)
def pipeline_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("value").cast("decimal(12,2)").cast("double").alias("last_value"),
        )
    )


@register(
    "pipeline_end_to_end",
    oracle=rf"""
WITH base AS (
  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
stats AS (
  SELECT doc_id, w, len(w) AS n, len(list_distinct(w)) AS d FROM base
),
-- quality gate: >=15 tokens and dup-word ratio < 0.64, as EXACT integer
-- arithmetic (25*(n-d) < 16*n) so no float boundary can disagree
quality AS (
  SELECT * FROM stats WHERE n >= 15 AND 25 * (n - d) < 16 * n
),
-- near-exact dedup: first-8-token fingerprint, keep the lowest doc_id
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY md5(array_to_string(list_slice(w, 1, 8), ' '))
      ORDER BY doc_id) AS rk
    FROM quality
  ) WHERE rk = 1
),
-- benchmark shingles come from the FULL corpus (the benchmark is external)
bench AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
  FROM base WHERE doc_id % {_BENCH_MOD} = 0
),
contaminated AS (
  SELECT doc_id FROM (
    SELECT d.doc_id, unnest(list_distinct(list_transform(range(1, len(d.w) - 1),
           i -> d.w[i] || ' ' || d.w[i+1] || ' ' || d.w[i+2]))) AS s
    FROM deduped d
  ) t JOIN bench USING (s)
  GROUP BY doc_id HAVING COUNT(*) >= {_CONTAM_MIN_OVERLAP}
),
survivors AS (
  SELECT * FROM deduped
  WHERE doc_id % {_BENCH_MOD} <> 0
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT CASE WHEN CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS INT) < 80
            THEN 'train' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS sum_tokens,
       CAST(SUM((n - 1) // {CHUNK_STRIDE} + 1) AS BIGINT) AS n_chunks
FROM survivors GROUP BY 1
""",
    doc="The full training-data pipeline as ONE query — quality gate "
    "(integer-exact dup-word ratio), first-8-token fingerprint dedup "
    "(keep-lowest window), benchmark decontamination (broadcast bench "
    "shingles, >= 3 distinct overlaps evicts), hash-stable 80/20 split, "
    "per-split doc/token/chunk totals. Every stage is the registered "
    "operator's shape composed end to end: one fingerprint shuffle, one "
    "doc_id overlap shuffle, a broadcast anti-join, one final agg — the "
    "whole corpus is read ONCE and never self-joined. This is the query a "
    "pretraining ingest actually runs.",
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.split(normalize_text(F.col("text")), " ").alias("w"))
    stats = base.select(
        "doc_id", "w", F.size("w").alias("n"), F.size(F.array_distinct("w")).alias("d")
    )
    quality = stats.filter(
        (F.col("n") >= 15) & (25 * (F.col("n") - F.col("d")) < 16 * F.col("n"))
    )
    fp = F.md5(F.array_join(F.slice("w", 1, 8), " "))
    wnd = Window.partitionBy(fp).orderBy("doc_id")
    deduped = quality.withColumn("rk", F.row_number().over(wnd)).filter(F.col("rk") == 1)

    shingles = F.array_distinct(
        F.transform(
            F.arrays_zip(
                F.slice("w", 1, F.greatest(F.size("w") - 2, F.lit(0))),
                F.slice("w", 2, F.greatest(F.size("w") - 2, F.lit(0))),
                F.slice("w", 3, F.greatest(F.size("w") - 2, F.lit(0))),
            ),
            lambda s: F.concat_ws(" ", s["0"], s["1"], s["2"]),
        )
    )
    bench = (
        base.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode(shingles).alias("s"))
        .distinct()
    )
    # decontamination consumes `deduped` exactly ONCE: explode its shingles,
    # LEFT-join the broadcast bench set (a marker column, so non-matching
    # rows survive), and regroup by doc_id with the token count riding
    # along. The naive shape — derive a contaminated-id set from deduped,
    # then anti-join deduped against it — consumes the subtree twice, and
    # Spark recomputes the whole scan+window per consumer (verified: no
    # ReusedExchange in that plan). At 100 TB that is two corpus passes.
    marked = (
        deduped.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .select("doc_id", "n", F.explode(shingles).alias("s"))
        .join(F.broadcast(bench.withColumn("hit", F.lit(1))), "s", "left")
    )
    survivors = (
        marked.groupBy("doc_id", "n")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"))
        .filter(F.col("n_overlap") < _CONTAM_MIN_OVERLAP)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    ).cast("int")
    return (
        survivors.select(
            F.when(bucket < 80, "train").otherwise("test").alias("split"),
            "n",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("bigint").alias("sum_tokens"),
            F.sum(F.expr(f"(n - 1) div {CHUNK_STRIDE} + 1")).cast("bigint").alias("n_chunks"),
        )
    )


# ------------------------------------------------------ semantic dedup --
# SemDeDup (Abbas et al. 2023): cluster the embedding space coarsely, then
# within each cluster drop every vector that has a sufficiently-similar
# lower-id neighbor, keeping one representative per semantic neighborhood.
SEMDEDUP_COS = 0.35
_SEM_PLANES = 6       # 64 cells on the fixture corpus; the cluster-count dial
_SEM_PLANE_OFFSET = 700  # fresh deterministic hyperplane set (disjoint from
                         # the near-dup LSH tables at offsets 0..300)


def _sem_cell_sql(emb: str, zero_based: bool) -> str:
    from pg2parquet_spark.operators.similarity import EMB_DIM, plane_dot_sql

    bits = [
        f"(CASE WHEN {plane_dot_sql(emb, j + _SEM_PLANE_OFFSET, EMB_DIM, zero_based)} > 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(_SEM_PLANES)
    ]
    return "(" + " + ".join(bits) + ")"


def _sem_oracle() -> str:
    from pg2parquet_spark.operators.similarity import EMB_DIM, dot_sql

    return f"""
WITH cells AS (
  SELECT vec_id, embedding, {_sem_cell_sql('embedding', False)} AS cell FROM embeddings
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {dot_sql('a.embedding', 'b.embedding', EMB_DIM, False)} >= {SEMDEDUP_COS}
)
SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM cells c LEFT JOIN dropped d ON c.vec_id = d.vec_id
"""


@register(
    "pipeline_semantic_dedup",
    oracle=_sem_oracle(),
    doc=f"SemDeDup-style semantic dedup (Abbas et al. 2023): coarse-cluster "
    f"the embedding space ({_SEM_PLANES}-bit sign-LSH cells standing in for "
    "the paper's k-means — deterministic, so the oracle can mirror it), "
    "then within each cell drop every vector with a lower-id neighbor at "
    f"cosine >= {SEMDEDUP_COS}, keeping one representative per semantic "
    "neighborhood. Output is the full keep/drop labeling. Plan: cell "
    "assignment is map-side; ONE shuffle groups each cell; the drop test "
    "is an in-cell exists() over collected members — no self-join, no "
    "BNLJ. Work is quadratic per CELL (SemDeDup's own contract); the "
    "plane count is the cluster-size dial, and a 100 TB deployment swaps "
    "the cells for k-means centroid ids + a size cap, keeping the shape.",
)
def pipeline_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    cells = emb.selectExpr(
        "vec_id", "embedding", f"{_sem_cell_sql('embedding', True)} AS cell"
    )
    grouped = cells.groupBy("cell").agg(
        F.expr("collect_list(struct(vec_id, embedding)) AS m")
    )
    # exists() re-derives the pairwise dot with the same left-fold order as
    # the oracle's unrolled sum (0.0 + t1 == t1, so the folds agree
    # bit-for-bit); NOT exists(lower-id neighbor >= threshold) == kept
    marked = grouped.selectExpr(
        "cell",
        "explode(transform(m, x -> named_struct("
        "'vec_id', x.vec_id, "
        "'kept', NOT exists(m, y -> y.vec_id < x.vec_id AND "
        "aggregate(zip_with(x.embedding, y.embedding, "
        "(p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) >= {SEMDEDUP_COS})))) AS s",
    )
    return marked.selectExpr(
        "s.vec_id AS vec_id",
        "CAST(cell AS BIGINT) AS cell",
        "CAST(s.kept AS BIGINT) AS kept",
    )


# ------------------------------------------------------- split leakage --
@register(
    "pipeline_split_leakage",
    oracle=r"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, upper(text) || '  ' FROM documents WHERE doc_id % 5 = 0
),
tagged AS (
  SELECT doc_id,
         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_hash,
         CASE WHEN CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS INT) < 80
              THEN 1 ELSE 0 END AS is_train
  FROM aug
)
SELECT content_hash,
       CAST(SUM(is_train) AS BIGINT) AS n_train,
       CAST(SUM(1 - is_train) AS BIGINT) AS n_test,
       MIN(CASE WHEN is_train = 1 THEN doc_id END) AS example_train_id,
       MIN(CASE WHEN is_train = 0 THEN doc_id END) AS example_test_id
FROM tagged
GROUP BY content_hash
HAVING SUM(is_train) > 0 AND SUM(1 - is_train) > 0
""",
    doc="Train/test leakage audit: content fingerprints (md5 of normalized "
    "text) that land in BOTH sides of the hash-stable 80/20 split — the "
    "check a pipeline runs AFTER splitting to prove dedup happened before "
    "it (an id-keyed split distributes duplicate content across splits, "
    "which inflates eval; Lee et al. 2022 measure exactly this). Runs on "
    "the exact-dup-augmented corpus so true leaks exist. Plan: fingerprint "
    "and split tag are map-side; ONE shuffle on the content hash; the "
    "HAVING filter is evaluated in the same aggregation. Leak rows are "
    "rare by construction, so the output is audit-sized at any corpus "
    "scale.",
)
def pipeline_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.operators.text import normalize_text

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  ")).alias("text"),
    )
    aug = docs.unionAll(dups)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    ).cast("int")
    tagged = aug.select(
        "doc_id",
        F.md5(normalize_text(F.col("text"))).alias("content_hash"),
        F.when(bucket < 80, 1).otherwise(0).alias("is_train"),
    )
    agg = tagged.groupBy("content_hash").agg(
        F.sum("is_train").cast("bigint").alias("n_train"),
        F.sum(1 - F.col("is_train")).cast("bigint").alias("n_test"),
        F.min(F.when(F.col("is_train") == 1, F.col("doc_id"))).alias("example_train_id"),
        F.min(F.when(F.col("is_train") == 0, F.col("doc_id"))).alias("example_test_id"),
    )
    return agg.filter((F.col("n_train") > 0) & (F.col("n_test") > 0))


# --------------------------------------------------- incremental dedup --
@register(
    "pipeline_incremental_dedup",
    oracle=r"""
WITH oldh AS (
  SELECT doc_id AS old_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h
  FROM documents
),
batch AS (
  SELECT doc_id + 3000000 AS new_id,
         CASE WHEN doc_id % 22 = 0 THEN upper(text) || '  '
              ELSE text || ' brand new tail' END AS text
  FROM documents WHERE doc_id % 11 = 0
),
bh AS (
  SELECT new_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h FROM batch
),
m AS (
  SELECT new_id, MIN(old_id) AS matched_old
  FROM oldh JOIN bh USING (h) GROUP BY new_id
)
SELECT b.new_id,
       CAST(CASE WHEN m.new_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup,
       m.matched_old
FROM bh b LEFT JOIN m ON b.new_id = m.new_id
""",
    doc="Incremental-ingest dedup: a new batch (deterministic fixture — every "
    "11th doc, half exact-dup mutations, half genuinely-new tails) checked "
    "against the EXISTING corpus by content hash. The shape is the point: "
    "ingest batches are small relative to the corpus, so the batch hash set "
    "BROADCASTS and the corpus side is a map-only probe scan — the corpus "
    "is never reshuffled, re-sorted, or self-joined to admit new data "
    "(at 100 TB the corpus side reads a materialized hash column with the "
    "batch filter pushed toward the scan). Match resolution keeps the "
    "minimum old doc_id so the output is deterministic.",
)
def pipeline_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.operators.text import normalize_text

    docs = table(spark, sf_dir, "documents")
    old_h = docs.select(
        F.col("doc_id").alias("old_id"), F.md5(normalize_text(F.col("text"))).alias("h")
    )
    batch = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 3000000).alias("new_id"),
        F.when(
            F.col("doc_id") % 22 == 0, F.concat(F.upper("text"), F.lit("  "))
        ).otherwise(F.concat(F.col("text"), F.lit(" brand new tail"))).alias("text"),
    )
    batch_h = batch.select("new_id", F.md5(normalize_text(F.col("text"))).alias("h"))
    matches = (
        old_h.join(F.broadcast(batch_h), "h")
        .groupBy("new_id")
        .agg(F.min("old_id").alias("matched_old"))
    )
    return batch_h.join(F.broadcast(matches), "new_id", "left").select(
        "new_id",
        F.col("matched_old").isNotNull().cast("bigint").alias("is_dup"),
        "matched_old",
    )


# ------------------------------------------- content-defined chunking --
_CDC_MOD = 16  # expected chunk length in tokens (the rolling-hash dial)


@register(
    "pipeline_cdc_chunking",
    oracle=rf"""
WITH base AS (
  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
cut AS (
  SELECT doc_id, len(w) AS n,
         list_concat(list_concat([CAST(0 AS BIGINT)],
           list_filter(range(1, len(w)),
             i -> CAST('0x' || substr(md5(w[i]), 1, 8) AS BIGINT) % {_CDC_MOD} = 0)),
           [CAST(len(w) AS BIGINT)]) AS edges
  FROM base
),
sized AS (
  SELECT doc_id, n,
         list_transform(range(1, len(edges)), i -> edges[i + 1] - edges[i]) AS sizes
  FROM cut
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       CAST(len(sizes) AS BIGINT) AS n_chunks,
       CAST(list_max(sizes) AS BIGINT) AS max_chunk,
       CAST(n AS DOUBLE) / len(sizes) AS avg_chunk
FROM sized
""",
    doc=f"Content-defined chunking (LBFS/rsync lineage): a chunk boundary "
    "falls AFTER any token whose hash is 0 mod "
    f"{_CDC_MOD}, so boundaries depend only on local content — insert one "
    "token and only the surrounding chunk's boundaries move, where "
    "fixed-stride chunking (pipeline_chunk_documents) shifts every "
    "subsequent chunk. That re-sync property is why dedup storage uses CDC "
    "blocks. Expected chunk length = the modulus. Plan: boundaries, edge "
    "deltas, and stats are ALL array expressions in the scan stage — a "
    "pure map with zero shuffles, embarrassingly parallel at any scale.",
)
def pipeline_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.operators.text import tokens

    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("w"))
    cut = base.selectExpr(
        "doc_id",
        "size(w) AS n",
        "concat(array(0), "
        "filter(sequence(1, size(w) - 1), "
        f"i -> conv(substring(md5(element_at(w, i)), 1, 8), 16, 10) % {_CDC_MOD} = 0), "
        "array(size(w))) AS edges",
    )
    sized = cut.selectExpr(
        "doc_id", "n",
        "transform(sequence(1, size(edges) - 1), "
        "i -> element_at(edges, i + 1) - element_at(edges, i)) AS sizes",
    )
    return sized.selectExpr(
        "doc_id",
        "CAST(n AS BIGINT) AS n_tokens",
        "CAST(size(sizes) AS BIGINT) AS n_chunks",
        "CAST(array_max(sizes) AS BIGINT) AS max_chunk",
        "CAST(n AS DOUBLE) / size(sizes) AS avg_chunk",
    )


# ------------------------------------------------------- mix rebalance --
_MIX_M = 10000  # hash-fraction resolution for the stochastic-rounding bucket


@register(
    "pipeline_mix_rebalance",
    oracle=rf"""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_s) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS k FROM counts
),
perdoc AS (
  SELECT d.source, c.n_s, t.total, t.k,
         (t.total // (t.k * c.n_s))
         + CASE WHEN (CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 9, 4) AS BIGINT) % {_MIX_M})
                     * (t.k * c.n_s) < {_MIX_M} * (t.total % (t.k * c.n_s))
                THEN 1 ELSE 0 END AS repeats
  FROM documents d JOIN counts c USING (source) CROSS JOIN tot t
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_in,
       CAST(SUM(repeats) AS BIGINT) AS n_out,
       CAST(SUM(repeats) AS DOUBLE) / MAX(total) AS achieved_share_x_k
FROM perdoc GROUP BY source
""",
    doc="Materialize the uniform-target source rebalance that "
    "pipeline_source_mix only computes weights for: every document repeats "
    "floor(w) times plus one stochastic-rounding extra decided by an "
    "md5-hash bucket — ALL in integer arithmetic (bucket*k*n_s < M*r "
    "replaces a float fractional-part comparison), so the materialized "
    "count is deterministic under retries and identical in both engines, "
    "and E[n_out per source] = total/k exactly. The repeat column feeds "
    "explode(sequence(1, repeats)) to emit the physical corpus; this "
    "query reports the per-source in/out audit. Plan: one source groupBy "
    "broadcast back (source cardinality is tiny), per-doc repeats map-"
    "side, one final source fold.",
)
def pipeline_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_s"))
    tot = counts.agg(
        F.sum("n_s").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 9, 4), 16, 10)
        .cast("bigint") % _MIX_M
    )
    perdoc = (
        docs.select("doc_id", "source")
        .join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(tot))
        .withColumn("den", F.col("k") * F.col("n_s"))
        .withColumn(
            "repeats",
            (F.col("total") / F.col("den")).cast("bigint")
            + F.when(
                bucket * F.col("den") < _MIX_M * (F.col("total") % F.col("den")), 1
            ).otherwise(0),
        )
    )
    return perdoc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in"),
        F.sum("repeats").cast("bigint").alias("n_out"),
        (F.sum("repeats").cast("double") / F.max("total")).alias("achieved_share_x_k"),
    )


_FUNNEL_STAGES = [
    ("len_ge_100", "n_chars >= 100"),
    ("has_space", "text LIKE '% %'"),
    ("lang_known", "lang IS NOT NULL AND lang <> ''"),
    ("not_tiny_vocab", "length(text) - length(replace(text, ' ', '')) >= 10"),
]


def _funnel_oracle() -> str:
    """Generate the funnel oracle FROM ``_FUNNEL_STAGES`` (r4 ADVICE): the
    Spark side already derives its predicates from the stage list, so the
    oracle must too — otherwise editing the list drifts the two silently
    until the gate fails. The stage predicates are engine-portable SQL."""
    n = len(_FUNNEL_STAGES)
    acc: list[str] = []
    flags = []
    for i, (_name, pred) in enumerate(_FUNNEL_STAGES, start=1):
        acc.append(f"({pred})")
        flags.append(f"CASE WHEN {' AND '.join(acc)} THEN 1 ELSE 0 END AS p{i}")
    wide = ", ".join(
        ["CAST(COUNT(*) AS BIGINT) AS n0"]
        + [f"CAST(SUM(p{i}) AS BIGINT) AS n{i}" for i in range(1, n + 1)]
    )
    unions = "\n  ".join(
        ["SELECT 0 AS stage_idx, 'input' AS stage, n0 AS surviving FROM wide"]
        + [
            f"UNION ALL SELECT {i}, '{name}', n{i} FROM wide"
            for i, (name, _pred) in enumerate(_FUNNEL_STAGES, start=1)
        ]
    )
    return f"""
WITH flags AS (
  SELECT {", ".join(flags)}
  FROM documents
),
wide AS (
  SELECT {wide} FROM flags
)
SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage, surviving FROM (
  {unions}
)
"""


@register(
    "pipeline_filter_funnel",
    oracle=_funnel_oracle(),
    doc="Quality-filter FUNNEL REPORT — the observability every curation "
    "pipeline needs before committing to a filter chain: how many documents "
    "survive each successive quality predicate. ONE corpus scan computes "
    "all cumulative-stage survivor counts as conditional sums (map-side "
    "combined to a 1-row aggregate — no per-stage re-scan, no shuffle of "
    "document data), then a stack() melt emits the (stage, surviving) "
    "long form. Adding a stage at 100 TB costs one more CASE column, not "
    "one more pass over the corpus.",
)
def pipeline_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    conds = []
    acc = None
    for _, pred in _FUNNEL_STAGES:
        c = F.expr(pred)
        acc = c if acc is None else (acc & c)
        conds.append(acc)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n0")] + [
        F.sum(F.when(c, 1).otherwise(0)).cast("bigint").alias(f"n{i + 1}")
        for i, c in enumerate(conds)
    ]
    wide = docs.agg(*aggs)
    stack_args = ", ".join(
        ["0L, 'input', n0"]
        + [
            f"{i + 1}L, '{name}', n{i + 1}"
            for i, (name, _) in enumerate(_FUNNEL_STAGES)
        ]
    )
    return wide.selectExpr(
        f"stack({len(_FUNNEL_STAGES) + 1}, {stack_args}) AS (stage_idx, stage, surviving)"
    )


@register(
    "pipeline_gdpr_cascade",
    oracle="""
WITH req AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
aff_orders AS (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM req)
)
SELECT entity, n_affected FROM (
  SELECT 'customer' AS entity, CAST(COUNT(*) AS BIGINT) AS n_affected FROM req
  UNION ALL
  SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM aff_orders
  UNION ALL
  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM aff_orders)
)
""",
    doc="Right-to-erasure CASCADE AUDIT — before a deletion batch runs, "
    "report exactly how many rows each table loses: deletion-request keys "
    "→ semi-join orders on custkey → semi-join lineitem on the affected "
    "orderkeys, counts only (the delete itself is the same plan with an "
    "anti-join writer). Scale shape: the request set is always small "
    "relative to the corpus (it broadcasts; AQE confirms at runtime), "
    "orders is touched once, lineitem once — each semi-join shuffles on "
    "its own natural key and the counts are map-side combined 1-row "
    "aggregates.",
)
def pipeline_gdpr_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    req = cust.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    aff_orders = orders.join(
        F.broadcast(req), orders["o_custkey"] == req["c_custkey"], "left_semi"
    ).select("o_orderkey")
    aff_li = li.join(
        aff_orders, li["l_orderkey"] == aff_orders["o_orderkey"], "left_semi"
    )
    one = lambda df, name: df.agg(  # noqa: E731
        F.count(F.lit(1)).cast("bigint").alias("n_affected")
    ).select(F.lit(name).alias("entity"), "n_affected")
    return one(req, "customer").unionAll(one(aff_orders, "orders")).unionAll(
        one(aff_li, "lineitem")
    )


_WS_M = 1 << 20  # weighted-sampling hash space


@register(
    "pipeline_weighted_sample",
    oracle=f"""
WITH w AS (
  SELECT doc_id, source,
         LEAST(CAST({_WS_M} AS BIGINT), n_chars * {_WS_M} // 400) AS w_m,
         CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|ws'), 1, 5) AS BIGINT) AS BIGINT) AS bucket
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_in,
       CAST(SUM(CASE WHEN bucket < w_m THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(w_m) AS BIGINT) AS weight_mass
FROM w GROUP BY source
""",
    doc="QUALITY-WEIGHTED sampling — the data-selection primitive behind "
    "quality-pruned pretraining mixes (keep each document with probability "
    "proportional to its quality weight): weight w∈[0,1] (here "
    "min(1, n_chars/400)) is mapped to an integer threshold w·2^20, and a "
    "document survives iff its deterministic md5 bucket falls below it. "
    "Pure map + one bounded groupBy(source) — no RNG, so the sample is "
    "reproducible across runs/retries/engines (the property that matters "
    "when a 100 TB job restarts mid-way), and weight_mass/2^20 is the "
    "expected kept-count the actual n_kept can be audited against.",
)
def pipeline_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w_m = F.least(
        F.lit(_WS_M).cast("bigint"),
        F.expr(f"n_chars * {_WS_M} div 400"),
    )
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|ws"))), 1, 5),
        16,
        10,
    ).cast("bigint")
    w = docs.select(
        "source", w_m.alias("w_m"), bucket.alias("bucket")
    )
    return w.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in"),
        F.sum(F.when(F.col("bucket") < F.col("w_m"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum("w_m").cast("bigint").alias("weight_mass"),
    )


@register(
    "pipeline_mix_temperature",
    oracle="""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs,
         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1024) AS BIGINT) AS w_q
  FROM counts
),
tot AS (SELECT CAST(SUM(w_q) AS BIGINT) AS sum_w FROM w)
SELECT source, n_docs, w_q,
       CAST(w_q * 1048576 // sum_w AS BIGINT) AS share_ppm
FROM w, tot
""",
    doc="TEMPERATURE-SCALED source mixing (α=0.5) — the standard "
    "low-resource upweighting for multi-source/multilingual pretraining "
    "mixes: sampling weight ∝ n^α flattens the source distribution "
    "(α=1 is proportional, α=0 uniform). Determinism without float "
    "accumulation: sqrt of an exact integer is CORRECTLY-ROUNDED IEEE in "
    "both engines, quantized once to 2^-10, then the normalized share is "
    "pure integer division against the exact integer weight sum. Shape: "
    "one bounded groupBy(source) + a 1-row total — the per-document "
    "sampling this feeds is `pipeline_weighted_sample` with these shares "
    "as weights.",
)
def pipeline_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    w = counts.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1024)
        .cast("bigint")
        .alias("w_q"),
    )
    tot = w.agg(F.sum("w_q").cast("bigint").alias("sum_w"))
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "w_q",
        F.expr("CAST(w_q * 1048576 div sum_w AS BIGINT)").alias("share_ppm"),
    )


# ------------------------------------------- cross-source overlap matrix --
@register(
    "pipeline_source_overlap",
    oracle=r"""
WITH normed0 AS (
  SELECT source, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
sh AS (
  SELECT DISTINCT source,
         unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
  FROM (SELECT source, string_split(norm, ' ') AS toks FROM normed0)
),
ns AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
pairs AS (
  SELECT a.source AS sa, b.source AS sb, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT sa AS source_a, sb AS source_b,
       CAST(shared AS BIGINT) AS n_shared,
       CAST(shared AS DOUBLE) / (na.n + nb.n - shared) AS jaccard
FROM pairs
JOIN ns na ON na.source = sa
JOIN ns nb ON nb.source = sb
""",
    doc="Cross-source CONTAMINATION MATRIX — the pre-mixing audit every "
    "multi-source training corpus needs: for each source pair, how many "
    "distinct 3-token shingles they share and the Jaccard of their shingle "
    "vocabularies. Sources with anomalously high overlap are mirrors/"
    "scrapes of each other and double-count in the mix. Plan: ONE corpus "
    "shuffle — groupBy(shingle).collect_set(source) dedups (source, "
    "shingle) in-aggregate and the per-shingle source set is bounded by "
    "source cardinality, so pair emission is an in-row array expression "
    "(same shape as the capped minhash buckets, with an intrinsic bound); "
    "per-source vocabulary sizes fold from the same grouped table and "
    "broadcast back onto the tiny pair list. No shingle self-join: the "
    "join shape would shuffle the corpus twice and recompute the shingle "
    "pipeline per side.",
)
def pipeline_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        "source",
        F.explode(F.array_distinct(word_shingles(F.col("text"), 3))).alias("s"),
    )
    grouped = sh.groupBy("s").agg(F.sort_array(F.collect_set("source")).alias("srcs"))
    ns = (
        grouped.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    pair_expr = (
        "explode(flatten(transform(srcs, (x, i) -> "
        "transform(slice(srcs, i + 2, size(srcs)), y -> struct(x AS sa, y AS sb))))) AS p"
    )
    pairs = (
        grouped.filter(F.size("srcs") > 1)
        .selectExpr(pair_expr)
        .groupBy(F.col("p.sa").alias("sa"), F.col("p.sb").alias("sb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
    )
    na = ns.select(F.col("source").alias("sa"), F.col("n").alias("na"))
    nb = ns.select(F.col("source").alias("sb"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(na), "sa")
        .join(F.broadcast(nb), "sb")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.col("shared").alias("n_shared"),
            (
                F.col("shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared"))
            ).alias("jaccard"),
        )
    )


# --------------------------------------------- quality-priority dedup --
@register(
    "pipeline_dedup_keep_best",
    oracle=r"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, upper(text) || '  ' FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 2000000, text || ' zz0 zz1 zz2 zz3 zz4' FROM documents WHERE doc_id % 7 = 0
),
normed AS (
  SELECT doc_id, len(text) AS rawlen,
         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h
  FROM aug
),
ranked AS (
  SELECT doc_id, rawlen, h,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY rawlen DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY h) AS n_copies
  FROM normed
)
SELECT h AS content_hash,
       CAST(n_copies AS BIGINT) AS n_copies,
       CAST(doc_id AS BIGINT) AS kept_doc,
       CAST(rawlen AS BIGINT) AS kept_rawlen
FROM ranked WHERE rn = 1 AND n_copies > 1
""",
    doc="Exact dedup with QUALITY-PRIORITY representative selection: within "
    "each duplicate group keep the copy scoring highest on a quality "
    "signal (stand-in: raw pre-normalization length — favors the least-"
    "mangled capture; swap any scalar score expression in), tie-broken by "
    "doc_id. dedup_exact keeps min-id; real curation keeps BEST — the "
    "selection is one deterministic ORDER BY swap, not a new plan shape: "
    "one content-hash shuffle, row_number + count over the same window "
    "partition (one exchange, one sort), groups of one drop out.",
)
def pipeline_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.operators.dedup import augmented_documents

    aug = augmented_documents(spark, sf_dir, widen=False)
    normed = aug.select(
        "doc_id",
        F.length("text").alias("rawlen"),
        F.md5(normalize_text(F.col("text"))).alias("h"),
    )
    w = Window.partitionBy("h")
    ranked = normed.select(
        "doc_id",
        "rawlen",
        "h",
        F.row_number().over(w.orderBy(F.desc("rawlen"), F.asc("doc_id"))).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_copies"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("n_copies") > 1)).select(
        F.col("h").alias("content_hash"),
        F.col("n_copies").cast("bigint").alias("n_copies"),
        F.col("doc_id").cast("bigint").alias("kept_doc"),
        F.col("rawlen").cast("bigint").alias("kept_rawlen"),
    )


# ----------------------------------------------- per-source quality quota --
_QUOTA_K = 10  # best docs kept per source


@register(
    "pipeline_quota_sample",
    oracle=f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
),
kept AS (SELECT * FROM ranked WHERE rn <= {_QUOTA_K})
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MIN(n_chars) AS BIGINT) AS worst_kept_chars,
       CAST(MAX(n_chars) AS BIGINT) AS best_kept_chars,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS kept_ids_hash
FROM kept GROUP BY source
""",
    doc=f"Per-source QUALITY QUOTA: keep the best {_QUOTA_K} documents of "
    "each source by a quality signal (stand-in: n_chars; any scalar score "
    "drops in), deterministic tie-break by doc_id — the budgeted flavor "
    "of curation where each source gets a fixed slot count regardless of "
    "its raw volume (caps boilerplate-heavy sources, guarantees minority "
    "sources their slots). ONE source-key shuffle: row_number and the "
    "post-filter fold share the window's hashpartitioning. The output "
    "pins the kept SET (md5 of the sorted id list), not just counts. At "
    "100 TB per-source top-k goes through the same window (skew dealt a "
    "two-phase per-bucket prefilter: any doc below its bucket's k-th "
    "score can be dropped map-side first).",
)
def pipeline_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    kept = docs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _QUOTA_K
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.min("n_chars").cast("bigint").alias("worst_kept_chars"),
        F.max("n_chars").cast("bigint").alias("best_kept_chars"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
            )
        ).alias("kept_ids_hash"),
    )


# ------------------------------------------------------ k-anonymity audit --
_KANON_K = 5
_KANON_CHARS_BUCKET = 100  # n_chars coarsened to this bucket width


@register(
    "pipeline_k_anonymity",
    oracle=f"""
WITH cells AS (
  SELECT lang, source, (n_chars // {_KANON_CHARS_BUCKET}) AS len_bucket, COUNT(*) AS k
  FROM documents GROUP BY 1, 2, 3
)
SELECT CAST(SUM(CASE WHEN k < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_unsafe_cells,
       CAST(SUM(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END) AS BIGINT) AS n_unsafe_docs,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(MIN(k) AS BIGINT) AS min_k
FROM cells
""",
    doc=f"K-ANONYMITY audit over the quasi-identifier tuple (lang, source, "
    f"length/{_KANON_CHARS_BUCKET} bucket): cells with fewer than "
    f"{_KANON_K} documents re-identify their members and must be "
    "suppressed or generalized before release — the check privacy review "
    "runs on any published training corpus. One bounded groupBy on the "
    "coarsened QI tuple (cell cardinality << corpus), then a 1-row fold; "
    "the doc table is scanned once with pruned columns.",
)
def pipeline_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("lang", "source", "n_chars")
    cells = docs.groupBy(
        "lang", "source", F.expr(f"n_chars div {_KANON_CHARS_BUCKET}").alias("len_bucket")
    ).agg(F.count(F.lit(1)).alias("k"))
    unsafe = F.col("k") < _KANON_K
    return cells.agg(
        F.sum(F.when(unsafe, 1).otherwise(0)).cast("bigint").alias("n_unsafe_cells"),
        F.sum(F.when(unsafe, F.col("k")).otherwise(0)).cast("bigint").alias("n_unsafe_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.min("k").cast("bigint").alias("min_k"),
    )


# -------------------------------------------- contrastive pair generation --
_CPAIR_MIN_LANES = 4  # positive = minhash candidate with >= 4/8 matching lanes


def _cpair_oracle() -> str:
    from pg2parquet_spark.operators.dedup import (
        AUG_SQL,
        NORMED_SQL,
        SHINGLED_SQL,
        STOPF_SQL,
        _bands_sql,
        _eval_match_sum,
        _sig_sql,
    )

    return f"""
WITH {AUG_SQL.strip()}, {NORMED_SQL.strip()}, {SHINGLED_SQL.strip()}, {STOPF_SQL.strip()},
{_sig_sql()},
{_bands_sql()},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id
),
pos AS (
  SELECT doc_a, doc_b FROM cand
  JOIN sigs sa ON sa.doc_id = doc_a JOIN sigs sb ON sb.doc_id = doc_b
  WHERE {_eval_match_sum('sa', 'sb')} >= {_CPAIR_MIN_LANES}
),
pos_sym AS (SELECT doc_a, doc_b FROM pos UNION SELECT doc_b, doc_a FROM pos),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
anchors AS (SELECT DISTINCT doc_a FROM pos),
negc AS (
  SELECT a.doc_a, (a.doc_a * 7 + 13) % n.n_docs AS doc_b
  FROM anchors a CROSS JOIN n
),
neg AS (
  SELECT nc.doc_a, nc.doc_b FROM negc nc
  WHERE nc.doc_a <> nc.doc_b
    AND NOT EXISTS (SELECT 1 FROM pos_sym p
                    WHERE p.doc_a = nc.doc_a AND p.doc_b = nc.doc_b)
),
lab AS (
  SELECT 1 AS label, doc_a, doc_b FROM pos
  UNION ALL
  SELECT 0 AS label, doc_a, doc_b FROM neg
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT doc_a) AS BIGINT) AS n_anchors
FROM lab GROUP BY label
"""


@register(
    "pipeline_contrastive_pairs",
    oracle=_cpair_oracle(),
    doc="TRAINING-PAIR generation for contrastive/embedding objectives: "
    "positives are the capped MinHash near-dup candidates with >= "
    f"{_CPAIR_MIN_LANES}/8 matching lanes (the same decision the dedup "
    "eval uses); each positive anchor also gets one DETERMINISTIC random "
    "negative — doc id (anchor*7+13) mod corpus size (ids are dense by "
    "fixture construction) — with self-pairs and accidental near-dups "
    "anti-joined away so no negative is secretly a positive. Determinism "
    "makes the pair set restart-reproducible, the property that keeps "
    "training-data regeneration hermetic. Output is the per-label audit "
    "(pair and anchor counts). Plan: positives reuse the capped band "
    "pipeline; negatives are a map over the bounded anchor set with one "
    "1-row corpus-count crossJoin and a broadcast-sized anti-join.",
)
def pipeline_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.operators.dedup import dedup_minhash_lsh

    pos = (
        dedup_minhash_lsh(spark, sf_dir)
        .filter(F.col("matching_hashes") >= _CPAIR_MIN_LANES)
        .select("doc_a", "doc_b")
    )
    pos_sym = pos.union(
        pos.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).distinct()
    n = table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    anchors = pos.select("doc_a").distinct()
    negc = (
        anchors.crossJoin(F.broadcast(n))
        .select("doc_a", ((F.col("doc_a") * 7 + 13) % F.col("n_docs")).alias("doc_b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    neg = negc.join(pos_sym, ["doc_a", "doc_b"], "left_anti")
    lab = pos.withColumn("label", F.lit(1)).unionByName(
        neg.withColumn("label", F.lit(0))
    )
    return lab.groupBy(F.col("label").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("doc_a").cast("bigint").alias("n_anchors"),
    )


# --------------------------------------------------- epoch shuffle order --
_EPOCHS = 3
_EPOCH_HEAD = 100  # order fingerprint over the first K docs per epoch


@register(
    "pipeline_epoch_shuffle",
    oracle=f"""
WITH ep AS (
  SELECT e.epoch, d.doc_id,
         md5(CAST(e.epoch AS VARCHAR) || '|' || CAST(d.doc_id AS VARCHAR)) AS h
  FROM documents d, (SELECT unnest(range(0, {_EPOCHS})) AS epoch) e
),
ranked AS (
  SELECT epoch, doc_id, h,
         ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS rn
  FROM ep
)
SELECT CAST(epoch AS BIGINT) AS epoch,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn)
           FILTER (WHERE rn <= {_EPOCH_HEAD})) AS head_order_hash
FROM ranked GROUP BY epoch
""",
    doc=f"DETERMINISTIC EPOCH SHUFFLE — the training-loader property that "
    "makes a run reproducible and resumable without materializing "
    "shuffled copies: epoch e's order is sort-by-md5(e|doc_id), so any "
    "worker can recompute its shard's order from (epoch, ids) alone, "
    "every epoch permutes differently, and a restart mid-epoch resumes "
    f"at an exact position. Output fingerprints the first {_EPOCH_HEAD} "
    "positions per epoch (md5 of the ordered id list) plus the per-epoch "
    "doc count. Plan: epochs explode map-side (×"
    f"{_EPOCHS}), ONE shuffle on epoch for the per-epoch window; at 100 "
    "TB the same hash ordering is a prefix of a range-partitioned sort "
    "per epoch — still no materialized shuffle copies.",
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id")
    ep = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(_EPOCHS - 1))).alias("epoch")
    ).withColumn(
        "h",
        F.md5(
            F.concat(
                F.col("epoch").cast("string"), F.lit("|"), F.col("doc_id").cast("string")
            )
        ),
    )
    w = Window.partitionBy("epoch").orderBy("h", "doc_id")
    ranked = ep.withColumn("rn", F.row_number().over(w))
    head = F.when(F.col("rn") <= _EPOCH_HEAD, F.struct("rn", "doc_id"))
    return ranked.groupBy(F.col("epoch").cast("bigint").alias("epoch")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(head)), lambda s: s["doc_id"].cast("string")
                ),
            )
        ).alias("head_order_hash"),
    )
