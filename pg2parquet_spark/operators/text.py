"""Text analysis operators for training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language-ID heuristic,
quality scoring, token counting, document fingerprinting — all pure Column
expressions (JVM-side, codegen), no UDFs, so they scale to 100 TB as
embarrassingly-parallel map work with zero shuffles.

Determinism contract (oracle-hash safety): outputs are ints, strings, or
single-division / fixed-order float expressions — identical IEEE evaluation
in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pg2parquet_spark.registry import register
from pg2parquet_spark.tables import table

# ---------------------------------------------------------------- helpers --

def normalize_text(col: Column) -> Column:
    """Canonical form: lowercase, trimmed, whitespace collapsed."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def word_shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a TEXT column as an array<string>; [] when
    too short. See :func:`token_shingles` for the construction."""
    return token_shingles(tokens(col), n)


def token_shingles(toks: Column, n: int = 3) -> Column:
    """n-gram shingles over an already-tokenized array<string> column, in
    document order (index i = 0-based start position of shingle i).

    Built from n zipped shifted slices of the token array — each slice is
    evaluated once per ROW. (The naive form, element_at(toks, i+j) inside a
    transform lambda, re-evaluates the source expression per shingle
    element — ~90× more CPU per document; measured 10× slower at sf0.1.)
    """
    size = F.size(toks)
    # aliases pin arrays_zip's struct field names to "0".."n-1" regardless of
    # whether `toks` arrives as a named column or an anonymous expression
    shifted = [toks.alias("0")] + [
        F.slice(toks, j + 1, F.greatest(size - j, F.lit(0))).alias(str(j))
        for j in range(1, n)
    ]
    z = F.arrays_zip(*shifted)  # tail entries padded with nulls
    sh = F.transform(z, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)]))
    return F.slice(sh, 1, F.greatest(size - (n - 1), F.lit(0)))


# Tiny per-language stopword lists (n-gram-heuristic stand-in; the point is
# the operator shape — swap in real fastText/CLD at deploy time).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "zu"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["的", "了", "是", "我", "在"],
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]  # fixed tie-break priority


def stopword_hits(toks: Column, lang: str) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))


def lang_id(col: Column) -> Column:
    """Argmax of stopword hits with fixed priority order on ties."""
    toks = tokens(col)
    hits = {lang: stopword_hits(toks, lang) for lang in LANG_ORDER}
    expr = None
    for i, lang in enumerate(LANG_ORDER):
        cond = None
        for other in LANG_ORDER[i + 1 :]:
            c = hits[lang] >= hits[other]
            cond = c if cond is None else (cond & c)
        for prev in LANG_ORDER[:i]:
            c = hits[lang] > hits[prev]
            cond = c if cond is None else (cond & c)
        branch = F.when(cond, F.lit(lang)) if cond is not None else F.lit(lang)
        expr = branch if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(LANG_ORDER[-1]))


# --------------------------------------------------------------- queries --
@register(
    "text_token_stats",
    oracle=r"""
WITH src AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm FROM documents
)
SELECT doc_id,
       length(norm) AS n_chars_norm,
       len(string_split(norm, ' ')) AS n_tokens,
       len(list_distinct(string_split(norm, ' '))) AS n_distinct_tokens,
       CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(string_split(norm, ' ')) AS avg_token_len,
       len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_subword_pieces
FROM src
""",
    doc="Token counting: whitespace tokens, distinct tokens, avg token length, and a "
    "BPE-ish regex piece count — all JVM-side expressions, zero shuffles.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    toks = F.split(norm, " ")
    return docs.select(
        "doc_id",
        F.length(norm).alias("n_chars_norm"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (
            F.length(F.replace(norm, F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
        F.size(F.regexp_extract_all(norm, F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).alias(
            "n_subword_pieces"
        ),
    )


@register(
    "text_quality_stats",
    oracle=r"""
WITH src AS (
  SELECT doc_id, lang, n_chars,
         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
), feats AS (
  SELECT doc_id, lang, n_chars,
         len(toks) AS n_tokens,
         len(list_filter(toks, t -> list_contains(['the','a','of','and','to'], t))) AS stop_hits,
         len(list_distinct(toks)) AS n_distinct
  FROM src
)
SELECT doc_id, lang, n_tokens, stop_hits,
       CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio,
       CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
       0.4 * (CASE WHEN n_tokens >= 50 THEN 1.0 ELSE CAST(n_tokens AS DOUBLE) / 50 END)
         + 0.3 * (CAST(stop_hits AS DOUBLE) / n_tokens)
         + 0.3 * (CAST(n_distinct AS DOUBLE) / n_tokens) AS quality_score
FROM feats
""",
    doc="Quality scoring: length/stopword/lexical-diversity ratios combined into a fixed-order "
    "weighted score (single divisions, deterministic cross-engine).",
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
    n_distinct = F.size(F.array_distinct(toks))
    stop_ratio = stop_hits.cast("double") / n_tokens
    distinct_ratio = n_distinct.cast("double") / n_tokens
    len_score = F.when(n_tokens >= 50, F.lit(1.0)).otherwise(
        n_tokens.cast("double") / 50
    )
    quality = F.lit(0.4) * len_score + F.lit(0.3) * stop_ratio + F.lit(0.3) * distinct_ratio
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        stop_hits.alias("stop_hits"),
        stop_ratio.alias("stop_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        quality.alias("quality_score"),
    )


@register(
    "text_lang_id",
    oracle=r"""
WITH src AS (
  SELECT doc_id, lang,
         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
), hits AS (
  SELECT doc_id, lang,
         len(list_filter(toks, t -> list_contains(['the','a','of','and','to'], t))) AS h_en,
         len(list_filter(toks, t -> list_contains(['der','die','das','und','zu'], t))) AS h_de,
         len(list_filter(toks, t -> list_contains(['el','la','de','y','que'], t))) AS h_es,
         len(list_filter(toks, t -> list_contains(['le','la','et','les','des'], t))) AS h_fr,
         len(list_filter(toks, t -> list_contains(['的','了','是','我','在'], t))) AS h_zh
  FROM src
)
SELECT doc_id, lang AS actual_lang,
       CASE
         WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
         WHEN h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh AND h_de > h_en THEN 'de'
         WHEN h_es >= h_fr AND h_es >= h_zh AND h_es > h_en AND h_es > h_de THEN 'es'
         WHEN h_fr >= h_zh AND h_fr > h_en AND h_fr > h_de AND h_fr > h_es THEN 'fr'
         ELSE 'zh'
       END AS predicted_lang
FROM hits
""",
    doc="Language-ID via stopword-hit argmax with fixed tie order (n-gram-heuristic shape; "
    "deterministic integer comparisons).",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        lang_id(F.col("text")).alias("predicted_lang"),
    )


@register(
    "text_fingerprint",
    oracle=r"""
WITH src AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm FROM documents
)
SELECT doc_id,
       md5(norm) AS md5_fp,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(norm, ' '),
                          t -> CAST(length(t) * 31 + (strpos('0123456789abcdef', substr(md5(t),1,1)) - 1) AS BIGINT))),
         (acc, v) -> (acc * 1000003 + v) % 2147483647) AS rolling_fp
FROM src
""",
    doc="Document fingerprinting: md5 of normal form + a rolling polynomial hash folded "
    "left-to-right over tokens (mod 2^31-1; exact integer arithmetic both engines).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    toks = F.split(norm, " ")
    token_val = lambda t: (
        F.length(t) * 31
        + (F.instr(F.lit("0123456789abcdef"), F.substring(F.md5(t), 1, 1)) - 1)
    ).cast("bigint")
    rolling = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 1000003 + token_val(t)) % 2147483647,
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("md5_fp"),
        rolling.alias("rolling_fp"),
    )


@register(
    "pipeline_train_test_split",
    oracle="""
WITH tagged AS (
  SELECT doc_id,
         CASE WHEN CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS INT) < 80
              THEN 'train' ELSE 'test' END AS split,
         len(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS n_tokens
  FROM documents
)
SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM tagged GROUP BY split
""",
    doc="Deterministic train/test split: md5(doc_id) %% 100 — NOT rand(), so the "
    "split is stable across runs, engines, retries, and re-partitioning (the "
    "property a reproducible training pipeline needs; a rand()-based split "
    "changes under task retry). 80/20 by hash bucket; reports per-split doc "
    "and token totals.",
)
def pipeline_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    ).cast("int")
    split = F.when(bucket < 80, "train").otherwise("test")
    n_tokens = F.size(F.split(normalize_text(F.col("text")), " "))
    return (
        docs.select(split.alias("split"), n_tokens.alias("n_tokens"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


@register(
    "pipeline_stratified_sample",
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS stratum_total
  FROM documents
)
SELECT doc_id, lang, source, n_chars, rn AS sample_rank, stratum_total
FROM ranked WHERE rn <= 25
""",
    doc="Stratified sampling with a DETERMINISTIC pseudo-random order: within "
    "each `lang` stratum take the first 25 docs ordered by md5(doc_id) — a "
    "stable shuffle that is identical across runs, engines, task retries and "
    "partitionings (rand()/TABLESAMPLE are not). One shuffle on the stratum "
    "key; at 100 TB the same plan holds because each stratum's quota head is "
    "a per-partition top-k (window + filter → rank pushdown into the sort).",
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    order_key = F.md5(F.col("doc_id").cast("string"))
    w = W.partitionBy("lang").orderBy(order_key, F.col("doc_id"))
    return (
        docs.select(
            "doc_id", "lang", "source", "n_chars",
            F.row_number().over(w).alias("sample_rank"),
            F.count(F.lit(1)).over(W.partitionBy("lang")).alias("stratum_total"),
        )
        .filter(F.col("sample_rank") <= 25)
    )


_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"


@register(
    "text_pii_redact",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
              ELSE text END AS text
  FROM documents
),
red AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
         regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g') AS clean
  FROM aug
)
SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails, md5(clean) AS clean_md5
FROM red WHERE n_emails > 0
""",
    doc="PII redaction: regex email scrubbing with planted synthetic addresses "
    "(the corpus itself is clean, so docs with doc_id%%3=0 get a deterministic "
    "fake email appended in BOTH engines). Pure regexp_replace/regexp_count "
    "column expressions — zero shuffles, embarrassingly parallel at 100 TB; "
    "the regex is restricted to syntax Java regex and RE2 evaluate "
    "identically. Output is per-doc match count + md5 of the cleaned text.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com now"),
        ),
    ).otherwise(F.col("text"))
    aug = docs.select("doc_id", planted.alias("text"))
    return (
        aug.select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
            F.md5(F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>")).alias("clean_md5"),
        )
        .filter(F.col("n_emails") > 0)
    )
