"""Text-analysis queries over the `documents` table — the
training-data-pipeline extension surface (token counting, quality
scoring, exact dedup).  All string work stays JVM-side
(`pyspark.sql.functions`), no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.queries import register
from data_engineering_user_session_analysis_spark.sources.tables import load_table


@register(
    "doc_token_stats",
    """
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
  CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars,
  CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
FROM documents GROUP BY lang
""",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting per language (distributed token
    accounting — the first thing a 100 TB corpus pipeline needs)."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.size(F.split("text", " ")).cast("long")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(tokens).alias("total_tokens"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
        F.max(tokens).alias("max_tokens"),
    )


@register(
    "dedup_exact",
    """
SELECT md5(text) AS text_hash,
  CAST(count(*) AS BIGINT) AS dup_count,
  CAST(min(doc_id) AS BIGINT) AS canonical_doc_id
FROM documents
GROUP BY md5(text)
HAVING count(*) > 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication: hash-groupBy on content, keep the lowest
    doc_id as canonical.  At 100 TB this is the standard
    shuffle-on-digest pattern — the md5 shrinks shuffle payload from
    document bytes to 32 hex chars."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count("*").alias("dup_count"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


@register(
    "doc_quality",
    """
SELECT doc_id, lang,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token,
  CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS BIGINT) AS n_stopwords
FROM documents
WHERE length(text) >= 100
""",
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: char/token counts, mean token
    length, stopword count — the length/ratio half of a quality
    classifier.  Pure projection over the scan (no shuffle)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 100)
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("long")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (F.length("text").cast("double") / n_tokens).alias("chars_per_token"),
        F.size(F.filter(toks, lambda t: t.isin("the", "a")))
        .cast("long")
        .alias("n_stopwords"),
    )
