"""Corpus-quality and vocabulary operators for training-data pipelines
(beyond-reference surface, same layer as text.py / curation.py).

- Repetition signals (Gopher-style filters): per-document top-token
  fraction, duplicate-word fraction, duplicate-bigram fraction. Repetitive
  machine-generated text is the classic pretraining-corpus failure mode;
  these three ratios are the published filter inputs.
- Vocabulary build: global token counts, top-K — the wordcount shape with
  map-side partial aggregation, the canonical "would survive 100 TB" agg.
- TF-IDF: per-document top terms scored tf x N / df. df is computed from
  the already-distinct (doc, token) pairs, so the corpus is exploded once.
- Source mixture: per-source corpus shares and uniform-target upsampling
  weights — the data-mixing step before training.
- Embedding quantization: symmetric per-vector int8 — 4x memory reduction
  for ANN serving; pure map, zero shuffles.

Determinism contract (oracle-hash safety): every ratio is ONE division of
two exact integers, and quantization is a fixed expression tree over the
same float32 inputs — identical IEEE evaluation in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pg2parquet_spark.operators.text import tokens, word_shingles
from pg2parquet_spark.registry import register
from pg2parquet_spark.tables import table

VOCAB_TOP_K = 100
TFIDF_TOP_K = 3


@register(
    "text_repetition_stats",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS t
  FROM documents
),
tf AS (SELECT doc_id, t, COUNT(*) AS cnt FROM toks GROUP BY doc_id, t),
uni AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_distinct, CAST(MAX(cnt) AS BIGINT) AS top_cnt
  FROM tf GROUP BY doc_id
),
grams AS (
  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
bi AS (
  SELECT doc_id,
         len(w) - 1 AS n_bigrams,
         len(list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS n_distinct_bigrams
  FROM grams WHERE len(w) >= 2
)
SELECT u.doc_id, u.n_tokens, u.n_distinct, u.top_cnt,
       CAST(u.top_cnt AS DOUBLE) / u.n_tokens AS top_token_ratio,
       CAST(u.n_tokens - u.n_distinct AS DOUBLE) / u.n_tokens AS dup_word_ratio,
       CASE WHEN COALESCE(b.n_bigrams, 0) = 0 THEN 0.0
            ELSE CAST(b.n_bigrams - b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams
       END AS dup_bigram_ratio
FROM uni u LEFT JOIN bi b USING (doc_id)
""",
    doc="Gopher-style repetition filters: per-doc top-token fraction, "
    "duplicate-word fraction, duplicate-bigram fraction. The only explode is "
    "the unigram one, keyed by (doc_id, token) so it distributes with the "
    "corpus; bigram dedup stays inside array expressions (map-only). The "
    "doc_id-aggregated sides join on their own shuffle partitioning — no "
    "extra exchange at 100 TB.",
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    uni = tf.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").cast("bigint").alias("top_cnt"),
    )
    sh = word_shingles(F.col("text"), 2)
    bi = docs.select(
        "doc_id",
        F.size(sh).alias("n_bigrams"),
        F.size(F.array_distinct(sh)).alias("n_distinct_bigrams"),
    ).filter(F.col("n_bigrams") >= 1)
    n_bi = F.coalesce(F.col("n_bigrams"), F.lit(0))
    return uni.join(bi, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "top_cnt",
        (F.col("top_cnt").cast("double") / F.col("n_tokens")).alias("top_token_ratio"),
        (
            (F.col("n_tokens") - F.col("n_distinct")).cast("double")
            / F.col("n_tokens")
        ).alias("dup_word_ratio"),
        F.when(n_bi == 0, F.lit(0.0))
        .otherwise(
            (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double")
            / F.col("n_bigrams")
        )
        .alias("dup_bigram_ratio"),
    )


@register(
    "text_vocab_topk",
    oracle=rf"""
WITH toks AS (
  SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS t
  FROM documents
)
SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks GROUP BY t
ORDER BY cnt DESC, token
LIMIT {VOCAB_TOP_K}
""",
    doc=f"Vocabulary build: global token counts, top {VOCAB_TOP_K} by count "
    "(ties broken by token so the cut is deterministic). Map-side partial "
    "aggregation makes the shuffle carry vocabulary-sized data, not "
    "corpus-sized; the top-K is per-partition take-ordered + driver merge, "
    "never a global sort.",
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(VOCAB_TOP_K)
    )


@register(
    "text_tfidf_topk",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS t
  FROM documents
),
tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY doc_id, t),
df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
scored AS (
  SELECT tf.doc_id, tf.t AS token,
         CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
         CAST(tf.tf * (SELECT COUNT(*) FROM documents) AS DOUBLE) / df.df AS score
  FROM tf JOIN df USING (t)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rk
  FROM scored
)
SELECT doc_id, token, tf, df, score FROM ranked WHERE rk <= {TFIDF_TOP_K}
""",
    doc=f"TF-IDF top-{TFIDF_TOP_K} terms per document, score = tf x N / df "
    "(exact-integer product, one IEEE division — no log, so both engines "
    "agree bit-for-bit). The corpus explodes ONCE into (doc, token) counts; "
    "df aggregates those already-distinct pairs (vocabulary-sized, map-side "
    "combined) and joins back broadcast. The broadcast is a PARAMETER of "
    "tfidf_topk (default on — natural-language vocabularies grow "
    "sublinearly per Heaps' law): open vocabularies (URLs, ids) pass "
    "vocab_broadcast=False for an AQE-chosen shuffle join, or None to "
    "auto-gate on approx_count_distinct. Ties rank by token so the top-K "
    "cut is deterministic.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_topk(table(spark, sf_dir, "documents"))


# Above this many distinct tokens (≈ a few hundred MiB of broadcast rows)
# the vocabulary is treated as OPEN and never broadcast — an executor-OOM
# guard for id/URL-shaped token streams.
TFIDF_VOCAB_BROADCAST_LIMIT = 5_000_000


def tfidf_topk(
    docs: DataFrame,
    k: int = TFIDF_TOP_K,
    vocab_broadcast: bool | None = True,
    vocab_broadcast_limit: int = TFIDF_VOCAB_BROADCAST_LIMIT,
) -> DataFrame:
    """TF-IDF top-``k`` terms per document over a ``(doc_id, text)`` frame.

    ``vocab_broadcast`` is the join-strategy dial for the df (document
    frequency) side:

    - ``True`` (default): hint ``F.broadcast(df)``. Right for
      natural-language vocabularies, which grow sublinearly (Heaps' law)
      and stay broadcast-sized even at corpus scale.
    - ``False``: no hint — AQE picks the shuffle join. Right for OPEN
      vocabularies (URLs, ids, hashes) where df is corpus-sized and a
      forced broadcast is an executor-OOM.
    - ``None`` (auto): spend one cheap ``approx_count_distinct`` pass to
      measure the vocabulary, then broadcast only if it is under
      ``vocab_broadcast_limit``. Costs an extra corpus scan, so callers
      that know their token shape should pass True/False directly.
    """
    # The tf subtree has two consumers (df aggregation + the scored join), so
    # the corpus explodes twice. The one-pass alternative — df as
    # count().over(Window.partitionBy(t)) — measured only ~13% faster here
    # and buffers each token's whole (doc, t) group in one task, which at
    # corpus scale turns every stopword into a straggler/spill partition.
    # The two-pass broadcast shape keeps per-task state bounded; keep it.
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    if vocab_broadcast is None:
        n_vocab = docs.select(
            F.explode(tokens(F.col("text"))).alias("t")
        ).agg(F.approx_count_distinct("t")).first()[0]
        vocab_broadcast = n_vocab <= vocab_broadcast_limit
    df_side = F.broadcast(df_) if vocab_broadcast else df_
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_side, "t")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            F.col("t").alias("token"),
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


@register(
    "pipeline_source_mix",
    oracle=r"""
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
       CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS doc_share,
       CAST(SUM(n_docs) OVER () AS DOUBLE) / (COUNT(*) OVER () * n_docs) AS uniform_weight
FROM per_src
""",
    doc="Data-mixing table: per-source document/token counts, corpus share, "
    "and the upsampling weight that equalizes sources (uniform target). One "
    "map-side-combined groupBy; the window runs over the handful of "
    "aggregated source rows, not the corpus.",
)
def pipeline_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy()
    return per_src.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "n_tokens",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w)).alias("doc_share"),
        (
            F.sum("n_docs").over(w).cast("double")
            / (F.count(F.lit(1)).over(w) * F.col("n_docs"))
        ).alias("uniform_weight"),
    )


@register(
    "ml_embedding_quantize",
    oracle=r"""
WITH base AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(x))) AS m
  FROM embeddings
),
quant AS (
  SELECT vec_id, CAST(m AS DOUBLE) AS max_abs,
         CASE WHEN m = 0 THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding,
                   x -> CAST(floor(x * 127.0 / m + 0.5) AS INTEGER))
         END AS q
  FROM base
)
SELECT vec_id, max_abs,
       array_to_string(q, ',') AS q_csv,
       CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1
FROM quant
""",
    doc="Symmetric per-vector int8 quantization (the 4x memory dial for ANN "
    "serving): scale = max|x|, q = floor(x*127/scale + 0.5). floor(+0.5) "
    "rounds identically in both engines (round() half-away/half-even "
    "disagreements are why it's avoided); the expression tree over the same "
    "float32 inputs is IEEE-identical. Pure map, zero shuffles — "
    "embarrassingly parallel at any scale. The quantized vector is emitted "
    "as a comma-joined string (q_csv) rather than a raw array<int>: scalar "
    "columns keep the result sortable/hashable for any downstream "
    "canonicalizer while losing no information (int formatting is identical "
    "in both engines).",
)
def ml_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    max_abs = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x)))
    q = F.when(
        max_abs == 0, F.transform(F.col("embedding"), lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x * F.lit(127.0) / max_abs + F.lit(0.5)).cast("int"),
        )
    )
    return emb.select(
        "vec_id",
        max_abs.cast("double").alias("max_abs"),
        F.array_join(F.transform(q, lambda x: x.cast("string")), ",").alias("q_csv"),
        F.aggregate(
            q, F.lit(0).cast("bigint"), lambda acc, x: acc + F.abs(x)
        ).alias("q_l1"),
    )


# ------------------------------------------------------------------- BM25 --
# Fixed query-term set: retrieval scoring is "given a query, rank the
# corpus"; the benchmark query is pinned so the oracle is deterministic.
BM25_QUERY = ("vector", "hash", "stream")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20


def _bm25_term_sql(i: int, t: str) -> str:
    """One query term's BM25 contribution — IDENTICAL text for Spark SQL and
    DuckDB, so both engines evaluate the same IEEE double expression in the
    same operand order (+,-,*,/ are correctly rounded, so same order =
    bit-identical; there is deliberately no log/exp, which libm implements
    differently per engine — the idf here is the raw Robertson odds ratio
    (N - df + 0.5)/(df + 0.5), the inside of the standard log-idf)."""
    idf = f"((CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5))"
    denom = f"(CAST(tf{i} AS DOUBLE) + {BM25_K1} * (0.25 + ({BM25_B} * CAST(dl AS DOUBLE)) / avgdl))"
    return f"({idf} * ((CAST(tf{i} AS DOUBLE) * 2.2) / {denom}))"


_BM25_SCORE_SQL = " + ".join(_bm25_term_sql(i, t) for i, t in enumerate(BM25_QUERY))


@register(
    "text_bm25_topk",
    oracle=rf"""
WITH base AS (
  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
stats AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
         {", ".join(f"CAST(len(list_filter(w, x -> x = '{t}')) AS BIGINT) AS tf{i}" for i, t in enumerate(BM25_QUERY))}
  FROM base
),
gstats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
         {", ".join(f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}" for i in range(len(BM25_QUERY)))}
  FROM stats
),
scored AS (
  SELECT doc_id, dl, {", ".join(f"tf{i}" for i in range(len(BM25_QUERY)))},
         {_BM25_SCORE_SQL} AS score
  FROM (SELECT s.*, g.*, CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
        FROM stats s CROSS JOIN gstats g)
  WHERE {" + ".join(f"tf{i}" for i in range(len(BM25_QUERY)))} > 0
)
SELECT doc_id, dl, {", ".join(f"tf{i} AS tf_{t}" for i, t in enumerate(BM25_QUERY))}, score
FROM scored ORDER BY score DESC, doc_id LIMIT {BM25_TOP_K}
""",
    doc=f"Okapi BM25 top-{BM25_TOP_K} (k1={BM25_K1}, b={BM25_B}) for the "
    f"pinned query {BM25_QUERY} — the retrieval-scoring operator of the "
    "pipeline layer. Plan: ZERO explodes and zero per-token shuffles — tf "
    "per query term is size(filter(tokens, = t)) map-side in the scan "
    "stage; df/avgdl/N are ONE bounded scalar-agg row broadcast back; "
    "top-K is TakeOrdered, never a global sort. The only per-corpus work "
    "is the one token pass, so the shape is identical at 100 TB (df/avgdl "
    "would come from corpus metadata instead of the agg). The idf is the "
    "log-free Robertson odds ratio so both engines agree bit-for-bit "
    "(libm log is not correctly rounded; +,-,*,/ are).",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    nq = len(BM25_QUERY)
    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("w"))
    stats = base.selectExpr(
        "doc_id",
        "CAST(size(w) AS BIGINT) AS dl",
        *[
            f"CAST(size(filter(w, x -> x = '{t}')) AS BIGINT) AS tf{i}"
            for i, t in enumerate(BM25_QUERY)
        ],
    )
    glob = stats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).cast("bigint").alias(f"df{i}")
            for i in range(nq)
        ],
    )
    scored = (
        stats.crossJoin(F.broadcast(glob))
        .withColumn("avgdl", F.expr("CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)"))
        .filter(F.expr(" + ".join(f"tf{i}" for i in range(nq))) > 0)
        .selectExpr(
            "doc_id",
            "dl",
            *[f"tf{i}" for i in range(nq)],
            f"{_BM25_SCORE_SQL} AS score",
        )
    )
    return (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOP_K)
        .selectExpr(
            "doc_id", "dl",
            *[f"tf{i} AS tf_{t}" for i, t in enumerate(BM25_QUERY)],
            "score",
        )
    )


# -------------------------------------------------- bigram-LM quality score --
@register(
    "text_bigram_lm_score",
    oracle=r"""
WITH base AS (
  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
pairs AS (
  SELECT doc_id, s.a AS a, s.ab AS ab
  FROM (SELECT doc_id, unnest(list_transform(range(1, len(w)),
               i -> {'a': w[i], 'ab': w[i] || ' ' || w[i+1]})) AS s
        FROM base WHERE len(w) >= 2)
),
cab AS (SELECT a, ab, CAST(COUNT(*) AS BIGINT) AS c_ab FROM pairs GROUP BY a, ab),
cctx AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_ctx FROM cab GROUP BY a)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(length(bin(x.c_ctx)) - length(bin(c.c_ab))) AS BIGINT) AS bits_total,
       CAST(SUM(length(bin(x.c_ctx)) - length(bin(c.c_ab))) AS DOUBLE) / COUNT(*) AS avg_bits
FROM pairs p JOIN cab c USING (a, ab) JOIN cctx x USING (a)
GROUP BY p.doc_id
""",
    doc="Corpus-bigram-LM cross-entropy surrogate per document — the "
    "perplexity-filter quality signal of CCNet-style curation (Wenzek et "
    "al. 2020), trained on the corpus itself. Per bigram (a,b) the cost is "
    "ilog2(c(a)) - ilog2(c(a,b)) bits, with ilog2(x) = length(bin(x)) - 1 "
    "— an INTEGER surrogate for -log2 p(b|a), chosen because integer sums "
    "are order-free (a float -log2 sum would depend on accumulation order "
    "and libm's log is not correctly rounded across engines); the one "
    "division per doc is the only float op. Plan: the corpus explodes "
    "twice (count-training + scoring; at 100 TB counts come from a "
    "materialized LM table or a sample, scoring stays one pass); context "
    "counts derive from the bigram counts by re-aggregation, never a third "
    "pass; both count tables are vocabulary-sized, map-side combined, and "
    "broadcast back (same Heaps'-law dial as tfidf_topk).",
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("w")).filter(
        F.size("w") >= 2
    )
    pairs = base.selectExpr(
        "doc_id",
        "explode(transform(sequence(1, size(w) - 1), "
        "i -> named_struct('a', w[i - 1], 'ab', concat(w[i - 1], ' ', w[i])))) AS s",
    ).selectExpr("doc_id", "s.a AS a", "s.ab AS ab")
    cab = pairs.groupBy("a", "ab").agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    cctx = cab.groupBy("a").agg(F.sum("c_ab").cast("bigint").alias("c_ctx"))
    scored = (
        pairs.join(F.broadcast(cab), ["a", "ab"])
        .join(F.broadcast(cctx), "a")
        .selectExpr("doc_id", "length(bin(c_ctx)) - length(bin(c_ab)) AS bits")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("bits").cast("bigint").alias("bits_total"),
        (F.sum("bits").cast("double") / F.count(F.lit(1))).alias("avg_bits"),
    )


# ------------------------------------------------- label centroid stats --
@register(
    "ml_label_centroid_stats",
    oracle=r"""
WITH base AS (
  SELECT vec_id, label, embedding,
         list_max(list_transform(embedding, x -> abs(x))) AS m
  FROM embeddings
),
quant AS (
  SELECT vec_id, label,
         CASE WHEN m = 0 THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding,
                   x -> CAST(floor(x * 127.0 / m + 0.5) AS INTEGER))
         END AS q
  FROM base
),
pos AS (
  SELECT label, unnest(range(1, len(q) + 1)) - 1 AS pos, unnest(q) AS v FROM quant
),
dimagg AS (
  SELECT label, pos, CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(abs(v)) AS BIGINT) AS sa, CAST(COUNT(*) AS BIGINT) AS c
  FROM pos GROUP BY label, pos
)
SELECT label,
       CAST(MAX(c) AS BIGINT) AS n_vectors,
       array_to_string(list(s ORDER BY pos), ',') AS sum_csv,
       CAST(SUM(sa) AS BIGINT) AS q_l1_total,
       CAST(SUM(sa) AS DOUBLE) / MAX(c) AS avg_l1
FROM dimagg GROUP BY label
""",
    doc="Per-label centroid + mass stats over int8-QUANTIZED embeddings "
    "(same floor(x*127/max+0.5) map as ml_embedding_quantize): per label, "
    "the element-wise SUM vector (as csv — exact integers, so the centroid "
    "sum is accumulation-order-free where a float mean would not be), the "
    "vector count, total and mean quantized L1 mass. The per-class "
    "centroid/mass profile is the standard embedding-space dataset audit "
    "(class balance, collapsed classes, outlier mass). Plan: quantization "
    "is map-side; posexplode keys the shuffle by (label, dim) so the "
    "element-wise sums distribute across dim x label, not one task per "
    "label; the final per-label fold is label-cardinality-sized. No "
    "collect, no float accumulation.",
)
def ml_label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    max_abs = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x)))
    q = F.when(
        max_abs == 0, F.transform(F.col("embedding"), lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x * F.lit(127.0) / max_abs + F.lit(0.5)).cast("int"),
        )
    )
    pos = emb.select("label", q.alias("q")).select(
        "label", F.posexplode("q").alias("pos", "v")
    )
    dimagg = pos.groupBy("label", "pos").agg(
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.abs("v")).cast("bigint").alias("sa"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    return dimagg.groupBy("label").agg(
        F.max("c").cast("bigint").alias("n_vectors"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda t: t["s"].cast("string"),
            ),
            ",",
        ).alias("sum_csv"),
        F.sum("sa").cast("bigint").alias("q_l1_total"),
        (F.sum("sa").cast("double") / F.max("c")).alias("avg_l1"),
    )


# ------------------------------------------------------- n-gram novelty --
@register(
    "text_ngram_novelty",
    oracle=r"""
WITH base AS (
  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
g3 AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gs
  FROM base
),
docg AS (SELECT doc_id, unnest(gs) AS g FROM g3),
firstseen AS (SELECT g, MIN(doc_id) AS first_doc FROM docg GROUP BY g)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS novelty
FROM docg d JOIN firstseen f ON d.g = f.g
GROUP BY d.doc_id
""",
    doc="Per-document n-gram NOVELTY: the fraction of a doc's distinct "
    "3-grams whose first corpus occurrence (by doc_id order) is this doc — "
    "the novelty curve of corpus-growth analyses (how much genuinely new "
    "text each increment of the corpus contributes; near-zero novelty "
    "flags scraped re-crawls). The asymmetric complement of "
    "dedup_substring_ngrams' symmetric sharing. Plan: per-doc grams dedupe "
    "map-side; one groupBy on the gram finds the min owner; the first-seen "
    "table joins back on its own gram partitioning and one doc_id groupBy "
    "folds the counts — every shuffle keyed, nothing broadcast-unbounded.",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.tables import spread_scan

    docs = spread_scan(table(spark, sf_dir, "documents"))
    g3 = docs.select(
        "doc_id", F.array_distinct(word_shingles(F.col("text"), 3)).alias("gs")
    )
    docg = g3.select("doc_id", F.explode("gs").alias("g"))
    firstseen = docg.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        docg.join(firstseen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
            .cast("bigint")
            .alias("n_novel"),
            (
                F.sum((F.col("first_doc") == F.col("doc_id")).cast("int")).cast("double")
                / F.count(F.lit(1))
            ).alias("novelty"),
        )
    )


# ------------------------------------------------ robust outlier gate (MAD) --
_MAD_K = 3  # flag when |x - median| > K * MAD


@register(
    "quality_mad_outliers",
    oracle=f"""
WITH med AS (
  SELECT source, quantile_cont(n_chars, 0.5) AS med
  FROM documents GROUP BY source
),
dev AS (
  SELECT d.source, d.n_chars, m.med, ABS(d.n_chars - m.med) AS adev
  FROM documents d JOIN med m USING (source)
),
stats AS (
  SELECT source, MAX(med) AS med, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY source
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN ABS(d.n_chars - s.med) > {_MAD_K} * s.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(s.med AS DOUBLE) AS median_chars,
       CAST(s.mad AS DOUBLE) AS mad_chars
FROM documents d JOIN stats s USING (source)
GROUP BY d.source, s.med, s.mad
""",
    doc="ROBUST per-source outlier gate — median/MAD instead of mean/stddev, "
    "because crawl length distributions are heavy-tailed and a single "
    "10 MB page drags a mean-based z-score past every real document: flag "
    f"docs whose length deviates from their source's median by > {_MAD_K}"
    "x the median absolute deviation. Exact interpolated medians "
    "(percentile <-> quantile_cont agree bit-for-bit on integer inputs), "
    "two grouped passes by construction (median then MAD are sequential "
    "order statistics), each a bounded groupBy(source); per-source stats "
    "broadcast back, so the corpus is scanned twice with pruned columns "
    "and never shuffled on doc identity.",
)
def quality_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("source", "n_chars")
    med = docs.groupBy("source").agg(F.expr("percentile(n_chars, 0.5)").alias("med"))
    dev = docs.join(F.broadcast(med), "source").withColumn(
        "adev", F.abs(F.col("n_chars") - F.col("med"))
    )
    stats = dev.groupBy("source").agg(
        F.max("med").alias("med"),
        F.expr("percentile(adev, 0.5)").alias("mad"),
    )
    flagged = docs.join(F.broadcast(stats), "source")
    out = (F.abs(F.col("n_chars") - F.col("med")) > _MAD_K * F.col("mad")).cast("int")
    return flagged.groupBy("source", "med", "mad").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(out).cast("bigint").alias("n_outliers"),
    ).select(
        "source",
        "n_docs",
        "n_outliers",
        F.col("med").cast("double").alias("median_chars"),
        F.col("mad").cast("double").alias("mad_chars"),
    )


# --------------------------------------------------- collocation mining --
_COLLOC_TOP_K = 50
_COLLOC_MIN_COUNT = 5  # a pair must occur at least this often


@register(
    "text_collocations_lift",
    oracle=rf"""
WITH toks AS (
  SELECT string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
bi AS (
  SELECT w[i] AS a, w[i+1] AS b
  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM toks WHERE len(w) >= 2)
),
uni AS (
  SELECT t, COUNT(*) AS c FROM (
    SELECT unnest(w) AS t FROM toks
  ) GROUP BY t
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
bic AS (SELECT a, b, COUNT(*) AS cab FROM bi GROUP BY a, b HAVING COUNT(*) >= {_COLLOC_MIN_COUNT}),
scored AS (
  SELECT bic.a, bic.b,
         CAST(bic.cab AS BIGINT) AS pair_count,
         CAST(bic.cab * t.n AS DOUBLE) / (ua.c * ub.c) AS lift
  FROM bic JOIN uni ua ON ua.t = bic.a JOIN uni ub ON ub.t = bic.b CROSS JOIN tot t
)
SELECT a, b, pair_count, lift FROM scored
ORDER BY lift DESC, a, b LIMIT {_COLLOC_TOP_K}
""",
    doc=f"COLLOCATION mining — the corpus statistic behind phrase detection "
    "(word2vec-phrases, tokenizer-merge candidates): adjacent-bigram lift "
    "= c(ab)·N / (c(a)·c(b)) over the whole corpus, top-"
    f"{_COLLOC_TOP_K} pairs occurring >= {_COLLOC_MIN_COUNT} times. The "
    "numerator and denominator are exact BIGINT products with ONE IEEE "
    "division (no log — same cross-engine-exact trick as TF-IDF; lift "
    "RANKS identically to PMI since log is monotone). Plan: one corpus "
    "explode each for bigram and unigram counts (both map-side combined), "
    "unigram counts broadcast back onto the thresholded bigram table "
    "twice, TakeOrdered for the top-k (never a global sort).",
)
def text_collocations_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    base = docs.select(tokens(F.col("text")).alias("w")).filter(F.size("w") >= 2)
    bi = base.selectExpr(
        "explode(arrays_zip(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1))) AS p"
    ).select(F.col("p.0").alias("a"), F.col("p.1").alias("b"))
    uni = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("bigint").alias("n"))
    bic = (
        bi.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= _COLLOC_MIN_COUNT)
    )
    ua = uni.select(F.col("t").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("t").alias("b"), F.col("c").alias("cb"))
    scored = (
        bic.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            F.col("cab").cast("bigint").alias("pair_count"),
            ((F.col("cab") * F.col("n")).cast("double") / (F.col("ca") * F.col("cb"))).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "a", "b").limit(_COLLOC_TOP_K)


# ------------------------------------------------- hybrid retrieval (RRF) --
# Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09): fuse a lexical
# and a dense retrieval run per query without score calibration — each leg
# contributes 1/(k + rank), k = 60 per the paper. The fused score is kept in
# integer units of SCALE//(k+rank) so both engines agree bit-for-bit (ranks
# are integers; no float score mixing).
_RRF_K = 60
_RRF_SCALE = 1_000_000
_RRF_LEG_TOP = 20  # fuse the top-L list of each leg (standard RRF input)
_RRF_TOP_K = 5
_RRF_QUERY_FILTER = "doc_id % 50 = 0"  # bounded request set, by contract


def _rrf_oracle_sql() -> str:
    from pg2parquet_spark.operators.similarity import EMB_DIM, dot_sql

    return rf"""
WITH qset AS (
  SELECT d.doc_id AS q_id FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
  WHERE d.{_RRF_QUERY_FILTER}
),
sh AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM (SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
        FROM documents)
),
inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
qinv AS (SELECT q.q_id, i.s FROM qset q JOIN inv i ON i.doc_id = q.q_id),
ovl AS (
  SELECT q.q_id, i.doc_id AS cand_id, CAST(COUNT(*) AS BIGINT) AS overlap
  FROM qinv q JOIN inv i ON q.s = i.s AND i.doc_id <> q.q_id
  GROUP BY q.q_id, i.doc_id
),
lex AS (
  SELECT q_id, cand_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY overlap DESC, cand_id) AS BIGINT) AS lex_rank
  FROM ovl
  QUALIFY lex_rank <= {_RRF_LEG_TOP}
),
den AS (
  SELECT q.q_id, e.vec_id AS cand_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY q.q_id
              ORDER BY {dot_sql('qe.embedding', 'e.embedding', EMB_DIM, False)} DESC, e.vec_id) AS BIGINT) AS emb_rank
  FROM qset q JOIN embeddings qe ON qe.vec_id = q.q_id
       JOIN embeddings e ON e.vec_id <> q.q_id
  QUALIFY emb_rank <= {_RRF_LEG_TOP}
),
fused AS (
  SELECT q_id, cand_id,
         CAST(COALESCE({_RRF_SCALE} // ({_RRF_K} + lex_rank), 0)
            + COALESCE({_RRF_SCALE} // ({_RRF_K} + emb_rank), 0) AS BIGINT) AS rrf_score,
         lex_rank, emb_rank
  FROM lex FULL OUTER JOIN den USING (q_id, cand_id)
)
SELECT q_id, cand_id, rrf_score, lex_rank, emb_rank
FROM fused
QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rrf_score DESC, cand_id) <= {_RRF_TOP_K}
"""


@register(
    "text_rrf_hybrid",
    oracle=_rrf_oracle_sql(),
    doc=f"Hybrid retrieval with reciprocal-rank fusion (k={_RRF_K}): per query "
    f"document, a LEXICAL leg (3-gram shingle-overlap count via an inverted "
    f"index — the query side's shingles broadcast, so the corpus index join "
    f"is linear in the corpus and shuffles once on the (q,cand) groupBy) and "
    f"a DENSE leg (exact fixed-order cosine, query embeddings broadcast — "
    f"the ann_cosine_topk contract shape) each produce a top-{_RRF_LEG_TOP} "
    f"list; fusion is a full-outer join of the two bounded lists with "
    f"integer score SCALE//(k+rank) summed over present legs, then top-"
    f"{_RRF_TOP_K} per query. The RAG-stack operator: different candidate "
    f"universes per leg (every document vs embedded subset) is the point of "
    f"RRF — no score calibration, rank-only fusion, integer-exact for the "
    f"oracle. Query set is bounded BY CONTRACT ({_RRF_QUERY_FILTER}), like "
    f"every ANN query here.",
)
def text_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.operators.similarity import dot_col

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    qset = (
        docs.filter(_RRF_QUERY_FILTER)
        .join(emb.select(F.col("vec_id").alias("doc_id")), "doc_id")
        .select(F.col("doc_id").alias("q_id"))
    )
    sh = docs.select(
        "doc_id", F.array_distinct(word_shingles(F.col("text"), 3)).alias("sh")
    )
    inv = sh.select("doc_id", F.explode("sh").alias("s"))
    qinv = inv.join(
        F.broadcast(qset), inv["doc_id"] == qset["q_id"]
    ).select("q_id", "s")
    ovl = (
        inv.join(F.broadcast(qinv), "s")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", F.col("doc_id").alias("cand_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap"))
    )
    w_lex = Window.partitionBy("q_id").orderBy(F.desc("overlap"), "cand_id")
    lex = (
        ovl.withColumn("lex_rank", F.row_number().over(w_lex).cast("bigint"))
        .filter(F.col("lex_rank") <= _RRF_LEG_TOP)
        .select("q_id", "cand_id", "lex_rank")
    )
    qe = qset.join(emb, qset["q_id"] == emb["vec_id"]).select(
        "q_id", F.col("embedding").alias("q_emb")
    )
    w_den = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "cand_id")
    den = (
        emb.crossJoin(F.broadcast(qe))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("cand_id"),
            dot_col("q_emb", "embedding").alias("cos_sim"),
        )
        .withColumn("emb_rank", F.row_number().over(w_den).cast("bigint"))
        .filter(F.col("emb_rank") <= _RRF_LEG_TOP)
        .select("q_id", "cand_id", "emb_rank")
    )
    fused = lex.join(den, ["q_id", "cand_id"], "full_outer").select(
        "q_id",
        "cand_id",
        (
            F.coalesce(F.expr(f"{_RRF_SCALE} div ({_RRF_K} + lex_rank)"), F.lit(0))
            + F.coalesce(F.expr(f"{_RRF_SCALE} div ({_RRF_K} + emb_rank)"), F.lit(0))
        ).cast("bigint").alias("rrf_score"),
        "lex_rank",
        "emb_rank",
    )
    w_fin = Window.partitionBy("q_id").orderBy(F.desc("rrf_score"), "cand_id")
    return (
        fused.withColumn("rn", F.row_number().over(w_fin))
        .filter(F.col("rn") <= _RRF_TOP_K)
        .drop("rn")
    )


# ------------------------------------------- distribution drift (epoch TV) --
# Dataset-drift monitor between two ingestion epochs — the check a training-
# data pipeline runs before each refresh ("did the crawl's distribution move
# under us?"). PSI is the textbook metric but needs ln(p/q); libm logs are
# not correctly rounded, so cross-engine hash equality would be luck. Total
# variation distance is the same monitoring decision with EXACT integer
# arithmetic: TV = Σ|p_i − q_i|/2 = Σ|cnt_a·tot_b − cnt_b·tot_a| /
# (2·tot_a·tot_b) — we emit the integer numerator and totals, and the drift
# flag compares integers (TV > 0.1 ⟺ 5·tv_num > tot_a·tot_b).
_DRIFT_SPLIT = "2024-01-16"  # epoch boundary: first vs second half of the month
_DRIFT_BIN = 500  # value bins of 5.00 (cents // 500), exact via DECIMAL cents


@register(
    "quality_tv_drift",
    oracle=f"""
WITH binned AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // {_DRIFT_BIN} AS bin,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
  FROM events
  GROUP BY event_type, bin
),
tot AS (
  SELECT event_type, bin, cnt_a, cnt_b,
         SUM(cnt_a) OVER (PARTITION BY event_type) AS tot_a,
         SUM(cnt_b) OVER (PARTITION BY event_type) AS tot_b
  FROM binned
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(MAX(tot_a) AS BIGINT) AS tot_a,
       CAST(MAX(tot_b) AS BIGINT) AS tot_b,
       CAST(SUM(ABS(cnt_a * tot_b - cnt_b * tot_a)) AS BIGINT) AS tv_num,
       CAST(SUM(ABS(cnt_a * tot_b - cnt_b * tot_a)) * 5 > MAX(tot_a) * MAX(tot_b)
            OR (MAX(tot_a) = 0) <> (MAX(tot_b) = 0) AS BOOLEAN) AS drifted
FROM tot
GROUP BY event_type
""",
    doc=f"Per-event-type distribution drift between the two halves of the "
    f"ingestion window (split {_DRIFT_SPLIT}): value histogram in exact "
    f"5.00-unit bins (DECIMAL cents // {_DRIFT_BIN} — no float floor), then "
    f"total-variation distance as an integer numerator Σ|cnt_a·tot_b − "
    f"cnt_b·tot_a| with the drift flag TV > 0.1 decided by integer "
    f"comparison. ONE corpus scan → one (type,bin) shuffle with map-side "
    f"combine → a type-keyed window + final bounded groupBy; at 100 TB both "
    f"epoch counts come from the same pass (no per-epoch rescan) and the "
    f"result is |types| rows. The PSI alternative needs ln(); TV keeps the "
    f"identical monitoring decision oracle-exact (see module determinism "
    f"contract). Domain note: binning assumes value ≥ 0 (true of this "
    f"corpus); for signed features the integer floor/truncate division "
    f"split between engines (DuckDB // floors, Spark div truncates) would "
    f"need a floor-consistent bin expression.",
)
def quality_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    in_a = (F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp")).cast("bigint")
    binned = (
        ev.select(
            "event_type",
            F.expr(
                f"CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div {_DRIFT_BIN}"
            ).alias("bin"),
            in_a.alias("a"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum("a").cast("bigint").alias("cnt_a"),
            F.sum(1 - F.col("a")).cast("bigint").alias("cnt_b"),
        )
    )
    w = Window.partitionBy("event_type")
    tot = binned.select(
        "event_type",
        "cnt_a",
        "cnt_b",
        F.sum("cnt_a").over(w).alias("tot_a"),
        F.sum("cnt_b").over(w).alias("tot_b"),
    )
    diff = F.abs(F.col("cnt_a") * F.col("tot_b") - F.col("cnt_b") * F.col("tot_a"))
    # the one-epoch-empty case is MAXIMAL drift (true TV = 1) but makes the
    # integer numerator 0/0-shaped (tv_num = 0): flag it explicitly — a feed
    # dying or a new event_type appearing mid-window must read as drifted,
    # never as "no drift" (review finding, r5)
    one_sided = (F.max("tot_a") == 0) != (F.max("tot_b") == 0)
    return tot.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.max("tot_a").cast("bigint").alias("tot_a"),
        F.max("tot_b").cast("bigint").alias("tot_b"),
        F.sum(diff).cast("bigint").alias("tv_num"),
        ((F.sum(diff) * 5 > F.max("tot_a") * F.max("tot_b")) | one_sided).alias(
            "drifted"
        ),
    )


# ------------------------------------------------- feature-hashing audit --
# The hashing trick (Weinberger et al., ICML'09) featurizes an open token
# vocabulary into a FIXED 2^k-dim space — the only featurizer whose memory
# is independent of corpus size, which is why 100 TB text pipelines use it.
# Its one design risk is collision load; this operator is the audit that
# sizes k: per-bucket distinct-token counts and total mass, plus the
# documented occupancy summary. xxhash64 is Spark-implemented; DuckDB does
# not ship the same function, so the ORACLE pins the bucket assignment via
# a portable integer hash built from md5 hex nibbles (identical in both
# engines); Spark uses the same expression — the operator's contract is the
# bucketing SHAPE, not a specific hash family.
_FHASH_BITS = 10  # 1024 buckets
_FHASH_TOP = 20


def _fhash_bucket_sql(col: str) -> str:
    # 12-bit integer from the first 3 md5 hex nibbles via POSITION
    # arithmetic — the one hash construction BOTH engines evaluate
    # identically (no hex-string cast, no conv(); the simhash operator uses
    # the same nibble-decode trick) — then % 2^k, so each bucket has exactly
    # 2^(12-k) pre-images from the hash itself. A deployment swaps in
    # xxhash64 when the DuckDB gate is out of the loop.
    nib = lambda i: (
        f"(POSITION(SUBSTRING(md5({col}), {i}, 1) IN '0123456789abcdef') - 1)"
    )
    return (
        f"(({nib(1)} * 256 + {nib(2)} * 16 + {nib(3)}) % {1 << _FHASH_BITS})"
    )


@register(
    "ml_feature_hash_collisions",
    oracle=rf"""
WITH toks AS (
  SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS t
  FROM documents
),
tf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY t),
bucketed AS (
  SELECT {_fhash_bucket_sql('t')} AS bucket, t, cnt FROM tf
),
agg AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(cnt) AS BIGINT) AS total_mass
  FROM bucketed GROUP BY bucket
)
SELECT bucket, n_tokens, total_mass
FROM agg ORDER BY n_tokens DESC, bucket LIMIT {_FHASH_TOP}
""",
    doc=f"Feature-hashing collision audit: the corpus vocabulary hashed into "
    f"2^{_FHASH_BITS} buckets, reporting the {_FHASH_TOP} most-collided "
    "buckets (distinct tokens + token mass). The sizing check run before "
    "committing to a hashed feature space. One token explode with map-side "
    "combine (vocabulary-sized shuffle), bucket agg is bounded by 2^k, "
    "top-N is TakeOrdered. Bucket hash = 12-bit md5-nibble integer % 2^k "
    "(engine-portable); Spark's xxhash64 drops in at deploy time when the "
    "oracle gate is not in the loop.",
)
def ml_feature_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    bucketed = tf.select(
        F.expr(_fhash_bucket_sql("t")).alias("bucket"), "t", "cnt"
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("cnt").cast("bigint").alias("total_mass"),
        )
        .orderBy(F.desc("n_tokens"), "bucket")
        .limit(_FHASH_TOP)
    )


# ------------------------------------------------ Poisson bootstrap CI --
# Uncertainty for a corpus statistic at scale: the classic bootstrap
# resamples n rows B times (B·n work, a shuffle per replicate); the
# SCALABLE published form is the Poisson bootstrap (Chamandy et al.,
# "Estimating Uncertainty for Massive Data Streams", Google 2012): each row
# contributes to replicate b with weight ~ Poisson(1), independent across
# replicates — all B replicate sums accumulate in ONE scan with map-side
# combine and no data movement beyond a single 1-row aggregate. Weights are
# DETERMINISTIC here: u = 3 md5 hex nibbles of (row id, b) → integer in
# [0,4096), mapped through the precomputed Poisson(1) CDF thresholds (an
# integer CASE chain — no float RNG, both engines agree exactly).
_BOOT_B = 64  # replicates; CI indices below assume this
# floor(cdf * 4096) for Poisson(1): P(X<=k), k = 0..4
# (4096·cdf = 1506.83, 3013.67, 3767.09, 4018.22, 4081.01 — floored)
_BOOT_THRESH = (1506, 3013, 3767, 4018, 4081)


def _boot_u_sql(b: int) -> str:
    h = f"md5(CONCAT(l_orderkey, '_', l_linenumber, '_', {b}))"
    nib = lambda i: f"(POSITION(SUBSTRING({h}, {i}, 1) IN '0123456789abcdef') - 1)"
    return f"({nib(1)} * 256 + {nib(2)} * 16 + {nib(3)})"


def _boot_w_sql(b: int) -> str:
    u = _boot_u_sql(b)
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_BOOT_THRESH)
    )
    return f"(CASE {cases} ELSE {len(_BOOT_THRESH)} END)"


def _boot_mean_sql(b: int) -> str:
    w = _boot_w_sql(b)
    return (
        f"CAST(SUM({w} * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)"
        f" / SUM({w})"
    )


@register(
    "quality_bootstrap_ci",
    oracle=f"""
WITH reps AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
           / COUNT(*) AS point_mean_cents,
         {", ".join(f"{_boot_mean_sql(b)} AS m{b}" for b in range(_BOOT_B))}
  FROM lineitem
)
SELECT n_rows, CAST({_BOOT_B} AS BIGINT) AS n_replicates, point_mean_cents,
       list_sort([{", ".join(f"m{b}" for b in range(_BOOT_B))}])[2] AS ci_lo_cents,
       list_sort([{", ".join(f"m{b}" for b in range(_BOOT_B))}])[63] AS ci_hi_cents
FROM reps
""",
    doc=f"Poisson-bootstrap 95% CI for the mean lineitem price (Chamandy et "
    f"al. 2012 — the bootstrap that scales): {_BOOT_B} replicates, each "
    "row's per-replicate weight drawn Poisson(1) via DETERMINISTIC integer "
    "thresholds on 3 md5 nibbles (no RNG, engine-exact), ALL replicates "
    f"accumulated in ONE corpus scan as 2x{_BOOT_B} conditional sums with "
    "map-side combine — no explode, no per-replicate shuffle, 1-row "
    "output. CI = 2nd/63rd order statistic of the replicate means "
    "(2.5/97.5 percentile at B=64). The classic resample-B-times bootstrap "
    "moves B corpora; this moves one row of partial sums — the difference "
    "between feasible and not at 100 TB.",
)
def quality_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg2parquet_spark.tables import spread_scan

    # Two r12 changes, same values (oracle SQL untouched, results verified
    # equal at sf0.001/0.01/0.1):
    # 1. spread_scan: the replicate weights cost 64 md5 derivations PER ROW,
    #    all fused into the scan stage; a single-row-group fixture file caps
    #    that at one core (measured min-of-5: 44.3 s at sf0.1). The spread
    #    fans the scan out and is a no-op once the scan fills the cluster —
    #    the shuffle ships only the 3 pruned columns the replicates read.
    # 2. one md5 projection + weight indicators INLINE IN THE AGGREGATE.
    #    Spelling the weight as the oracle does (3x POSITION/SUBSTRING
    #    nibble extraction + 5-branch CASE), in any projection layering,
    #    fuses into a single whole-stage processNext() that janino cannot
    #    compile ("Code grows beyond 64 KB" — a hard ERROR under the
    #    selfcheck codegen gate, a silent interpreted fallback elsewhere;
    #    wide pass-through projections don't help, column pruning narrows
    #    them right back). Instead: (a) lowercase-hex strings order
    #    lexicographically exactly as their numeric value, so
    #    "first-3-nibbles(h) >= t" IS "h >= hex3(t)" — one string compare
    #    replaces the whole nibble extraction; (b) the ascending-threshold
    #    CASE chain equals the SUM of >= indicators; (c) those indicator
    #    sums sit inside the aggregate expressions, because the 130-field
    #    HashAggregate is already PAST spark.sql.codegen.maxFields and is
    #    excluded from whole-stage codegen GRACEFULLY (no compile attempt,
    #    no janino error) — only the 65-column md5 projection compiles.
    #    Interleaved A/B mins at sf0.1: r11 inline shape 8.3 s, layered
    #    projections (gate-RED) 4.9 s, this shape 3.67 s — at the measured
    #    pure-md5 floor of 3.3 s. Equivalences property-tested in
    #    tests/test_pipeline_ops.py::test_bootstrap_weight_grammar_equivalence.
    li = spread_scan(table(spark, sf_dir, "lineitem"))
    cents = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    h = li.select(
        F.expr(cents).alias("cents"),
        *[
            F.expr(f"md5(CONCAT(l_orderkey, '_', l_linenumber, '_', {b}))").alias(
                f"h{b}"
            )
            for b in range(_BOOT_B)
        ],
    )
    hex3 = [format(t, "03x") for t in _BOOT_THRESH]
    w = lambda b: "(" + " + ".join(f"CAST(h{b} >= '{x}' AS INT)" for x in hex3) + ")"
    aggs = [
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_rows"),
        F.expr("CAST(SUM(cents) AS DOUBLE) / COUNT(*)").alias("point_mean_cents"),
    ]
    for b in range(_BOOT_B):
        aggs.append(
            F.expr(f"CAST(SUM({w(b)} * cents) AS DOUBLE) / SUM({w(b)})").alias(f"m{b}")
        )
    reps = h.agg(*aggs)
    means = "array_sort(array(" + ", ".join(f"m{b}" for b in range(_BOOT_B)) + "))"
    return reps.select(
        "n_rows",
        F.lit(_BOOT_B).cast("bigint").alias("n_replicates"),
        "point_mean_cents",
        F.expr(f"element_at({means}, 2)").alias("ci_lo_cents"),
        F.expr(f"element_at({means}, 63)").alias("ci_hi_cents"),
    )
