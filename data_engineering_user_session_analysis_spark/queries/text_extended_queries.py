"""Registry entries for the text-analysis operators (language ID,
quality scoring, fingerprinting, tokenizer accounting), each with a
DuckDB oracle replaying the same deterministic heuristic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.text_analysis import (
    LANG_PROFILES,
    bpe_token_counts,
    doc_fingerprints,
    predict_lang,
    quality_features,
)
from data_engineering_user_session_analysis_spark.queries import register
from data_engineering_user_session_analysis_spark.sources.tables import load_table


def _score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
    return (
        f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ({words}))) "
        f"AS BIGINT) AS score_{lang}"
    )


def _predict_sql() -> str:
    langs = list(LANG_PROFILES)
    cases = []
    for lang in langs:
        conds = " AND ".join(
            f"score_{lang} >= score_{other}" for other in langs if other != lang
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"


@register(
    "lang_id",
    f"""
WITH scored AS (
  SELECT doc_id, lang,
    {_score_sql('en')}, {_score_sql('de')}, {_score_sql('es')}, {_score_sql('fr')}
  FROM documents
)
SELECT doc_id, lang AS declared_lang,
  {_predict_sql()} AS predicted_lang,
  score_en, score_de, score_es, score_fr
FROM scored
""",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (n-gram-free heuristic baseline):
    per-language hit scores + argmax with a fixed priority chain."""
    docs = load_table(spark, sf_dir, "documents")
    return predict_lang(docs).select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        "predicted_lang",
        "score_en",
        "score_de",
        "score_es",
        "score_fr",
    )


@register(
    "doc_quality_scores",
    """
WITH feat AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
    CAST(len(list_filter(string_split(text, ' '),
         t -> t IN ('the','a','of','and','to'))) AS BIGINT) AS stop_hits,
    CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_types,
  n_types / CAST(n_tokens AS DOUBLE) AS type_token_ratio,
  stop_hits / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
  (n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE) AS mean_token_len,
  n_types / CAST(n_tokens AS DOUBLE) * 0.5
    + stop_hits / CAST(n_tokens AS DOUBLE) * 0.3
    + (n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE) * 0.04 AS quality_score
FROM feat
""",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + composite score (fixed linear
    blend, bit-deterministic).  The single quality projection over
    documents — round 1's overlapping ``doc_quality`` entry folded in
    here (``n_chars`` column; see COVERAGE.md)."""
    docs = load_table(spark, sf_dir, "documents")
    return quality_features(docs).select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        "n_tokens",
        "n_types",
        "type_token_ratio",
        "stopword_ratio",
        "mean_token_len",
        "quality_score",
    )


@register(
    "doc_fingerprints",
    """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, len(w) - 3),
      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS gs
  FROM toks WHERE len(w) >= 5
)
SELECT doc_id, unnest(list_sort(list_filter(
  list_transform(gs, g -> CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT)),
  h -> h % 8 = 0))) AS fingerprint
FROM grams
""",
)
def doc_fingerprints_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOD-8 sampled 5-gram md5 fingerprints (copy-detection
    sampling; ~1/8 of distinct grams per doc)."""
    docs = load_table(spark, sf_dir, "documents")
    return doc_fingerprints(docs)


# NOTE: round 1's `bpe_token_accounting` registry entry was absorbed
# into `doc_token_stats` (text_queries.py) — same lang grain, same
# scan, whitespace + BPE-regex accounting in one row (COVERAGE.md).
# The operator itself stays: operators/text_analysis.py:bpe_token_counts.
