"""Text-analysis operators over `documents`: token stats, quality scoring,
language-ID heuristic, document fingerprinting. All JVM-side expressions
(whole-stage codegen), all values exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# token counting + basic stats
# ---------------------------------------------------------------------------

@register(
    "token_stats",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS n_nonspace_chars,
       CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
         / LEN(string_split(text, ' ')) AS avg_token_len
FROM documents
""",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + average token length (exact ints +
    one exact division)."""
    d = _docs(spark, sf_dir)
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    n_chr = F.length(F.regexp_replace("text", " ", "")).cast("bigint")
    return d.select(
        F.col("doc_id").cast("bigint"),
        n_tok.alias("n_tokens"),
        n_chr.alias("n_nonspace_chars"),
        (n_chr.cast("double") / n_tok).alias("avg_token_len"),
    )


# ---------------------------------------------------------------------------
# quality scoring: length / stopword / short-token ratios
# ---------------------------------------------------------------------------

_STOPWORDS = "('a', 'the', 'of', 'and', 'to', 'in', 'is', 'it', 'on', 'for')"


@register(
    "quality_score",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, t.w FROM documents, UNNEST(string_split(text, ' ')) AS t(w)),
agg AS (
  SELECT doc_id,
         COUNT(*) AS n,
         SUM(CASE WHEN w IN {_STOPWORDS} THEN 1 ELSE 0 END) AS n_stop,
         SUM(CASE WHEN LENGTH(w) <= 2 THEN 1 ELSE 0 END) AS n_short
  FROM toks GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(a.n_stop AS DOUBLE) / a.n AS stopword_ratio,
       CAST(a.n_short AS DOUBLE) / a.n AS short_token_ratio,
       CAST(d.n_chars AS DOUBLE) / a.n AS chars_per_token,
       CAST(a.n_stop AS DOUBLE) / a.n * 2.0
         + (1.0 - CAST(a.n_short AS DOUBLE) / a.n) AS quality
FROM documents d JOIN agg a ON d.doc_id = a.doc_id
""",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: stopword ratio, short-token ratio, chars/token,
    and a weighted score — all exact-arithmetic ratios."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    stop = [s.strip("'") for s in _STOPWORDS.strip("()").split(", ")]
    agg = toks.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("w").isin(stop), 1).otherwise(0)).alias("n_stop"),
        F.sum(F.when(F.length("w") <= 2, 1).otherwise(0)).alias("n_short"),
    )
    sr = F.col("n_stop").cast("double") / F.col("n")
    shr = F.col("n_short").cast("double") / F.col("n")
    return (
        d.join(agg, "doc_id")
        .select(
            F.col("doc_id").cast("bigint"),
            sr.alias("stopword_ratio"),
            shr.alias("short_token_ratio"),
            (F.col("n_chars").cast("double") / F.col("n")).alias("chars_per_token"),
            (sr * 2.0 + (F.lit(1.0) - shr)).alias("quality"),
        )
    )


# ---------------------------------------------------------------------------
# language-ID heuristic: stopword-hit share thresholding
# ---------------------------------------------------------------------------

@register(
    "lang_id",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, t.w FROM documents, UNNEST(string_split(text, ' ')) AS t(w)),
agg AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN w IN {_STOPWORDS} THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS ratio
  FROM toks GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang AS declared_lang,
       CASE WHEN a.ratio >= 0.05 THEN 'en' ELSE 'und' END AS predicted_lang,
       a.ratio AS stopword_ratio
FROM documents d JOIN agg a ON d.doc_id = a.doc_id
""",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic with threshold decision."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    stop = [s.strip("'") for s in _STOPWORDS.strip("()").split(", ")]
    agg = toks.groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("w").isin(stop), 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("ratio")
    )
    return d.join(agg, "doc_id").select(
        F.col("doc_id").cast("bigint"),
        F.col("lang").alias("declared_lang"),
        F.when(F.col("ratio") >= 0.05, "en").otherwise("und").alias("predicted_lang"),
        F.col("ratio").alias("stopword_ratio"),
    )


# ---------------------------------------------------------------------------
# document fingerprint: position-weighted token-hash sum (rolling-hash-like,
# exact integer arithmetic, order-sensitive)
# ---------------------------------------------------------------------------

_POW16 = "(VALUES (1, 268435456), (2, 16777216), (3, 1048576), (4, 65536), " \
         "(5, 4096), (6, 256), (7, 16), (8, 1))"


@register(
    "doc_fingerprint",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(string_split(text, ' ')) AS w,
         UNNEST(range(1, LEN(string_split(text, ' ')) + 1)) AS pos
  FROM documents),
pw(p, wgt) AS {_POW16},
tokval AS (
  SELECT doc_id, pos,
         SUM((STRPOS('0123456789abcdef', SUBSTR(md5(w), p, 1)) - 1) * wgt) AS tv
  FROM toks CROSS JOIN pw GROUP BY doc_id, pos)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(SUM(tv % 1000000000 * (pos * 2654435761 % 1000003)) AS BIGINT)
         AS fingerprint
FROM tokval GROUP BY doc_id
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: md5-derived 32-bit token values
    combined with position-dependent weights — pure integer arithmetic, so
    identical in every engine, and shuffle-light (one agg per doc)."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "w")
    ).withColumn("pos", F.col("pos0") + 1).drop("pos0")
    pw = d.sparkSession.createDataFrame(
        [(1, 268435456), (2, 16777216), (3, 1048576), (4, 65536),
         (5, 4096), (6, 256), (7, 16), (8, 1)],
        "p int, wgt bigint",
    )
    tokval = (
        toks.crossJoin(F.broadcast(pw))
        .groupBy("doc_id", "pos")
        .agg(
            F.sum(
                F.expr(
                    "(instr('0123456789abcdef', substr(md5(cast(w AS binary)), p, 1)) - 1) * wgt"
                )
            ).alias("tv")
        )
    )
    return tokval.groupBy(F.col("doc_id").cast("bigint").alias("doc_id")).agg(
        F.sum(
            F.expr("tv % 1000000000 * (pos * 2654435761 % 1000003)")
        ).cast("bigint").alias("fingerprint")
    )
