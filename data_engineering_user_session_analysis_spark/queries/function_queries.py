"""Function-family coverage queries (SURVEY.md §2.7 note: "the
engine's surface should include the standard string/date/math
families since they are zero-cost").

Round-2 consolidation (the driver caps correctness rows at 50 —
COVERAGE.md has the full mapping): round 1 registered one row per
family; they are now merged by source table and grain so every
family keeps a driver-checked row inside the cap:

* ``scalar_doc_functions`` = string_functions + regexp_functions +
  token_array_ops + hash_sample (documents, doc grain; the
  deterministic md5-bucket sample is the row filter).
* ``event_window_functions`` = ranking_functions +
  trailing_hour_activity + null_handling_functions (events, event
  grain; both window specs share the user_id hash partitioning).
* ``props_map_stats`` retired in round 3: the MapType schema-on-read
  surface (map decode, map_keys, map element access) now lives in
  ``props_extract`` (session_queries.py) next to the StructType
  decode — one row checks both JSON read paths.
* date arithmetic lives in ``customer_running_total``
  (relational_queries.py); ROLLUP grouping-sets in ``docs_cube``
  (CUBE is the superset demo, same Expand operator); UNPIVOT inside
  ``event_type_pivot``; the spark.sql surface in
  ``q6_forecast_revenue``.

Every expression is chosen for bit-identical cross-engine behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.sessionize import epoch_seconds
from data_engineering_user_session_analysis_spark.queries import register
from data_engineering_user_session_analysis_spark.sources.events import load_events
from data_engineering_user_session_analysis_spark.sources.tables import load_table


@register(
    "scalar_doc_functions",
    """
WITH fp AS (
  -- the doc_fingerprints operator replayed: mod-8 sampled 5-gram
  -- md5 fingerprints, aggregated to doc grain
  SELECT doc_id,
    CAST(len(fps) AS BIGINT) AS n_fingerprints,
    list_min(fps) AS min_fingerprint,
    list_max(fps) AS max_fingerprint
  FROM (
    SELECT doc_id, list_filter(
      list_transform(
        list_distinct(list_transform(range(1, len(w) - 3),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])),
        g -> CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT)),
      h -> h % 8 = 0) AS fps
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    WHERE len(w) >= 5
  )
)
SELECT documents.doc_id,
  -- string family
  upper(lang) AS lang_upper,
  substr(text, 1, 20) AS prefix20,
  replace(substr(text, 1, 40), ' ', '_') AS snake40,
  CAST(strpos(text, 'spark') AS INT) AS spark_pos,
  lpad(CAST(documents.doc_id AS VARCHAR), 8, '0') AS padded_id,
  CAST(length(trim(text)) AS INT) AS trimmed_len,
  concat(lang, ':', source) AS lang_source,
  -- regexp family
  CAST(regexp_matches(text, 'spark\\s+\\w+') AS BOOLEAN) AS has_spark_bigram,
  regexp_extract(text, 'spark\\s+(\\w+)', 1) AS word_after_spark,
  CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS len_no_vowels,
  CAST(len(regexp_extract_all(text, '\\bdata\\b')) AS INT) AS data_mentions,
  -- array family (over whitespace tokens)
  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
  string_split(text, ' ')[1] AS first_token,
  string_split(text, ' ')[-1] AS last_token,
  array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS first3_sorted,
  CAST(list_contains(string_split(text, ' '), 'spark') AS BOOLEAN) AS mentions_spark,
  array_to_string(
    list_reverse(list_sort(list_distinct(string_split(text, ' '))))[1:2], ','
  ) AS top2_types_desc,
  -- fingerprint family (round-4 consolidation: doc_fingerprints)
  CAST(coalesce(fp.n_fingerprints, 0) AS BIGINT) AS n_fingerprints,
  fp.min_fingerprint,
  fp.max_fingerprint
FROM documents LEFT JOIN fp ON documents.doc_id = fp.doc_id
-- deterministic 1-in-10 content-hash sample (reproducible across
-- engines/runs/partitionings, unlike TABLESAMPLE)
WHERE CAST(('0x' || substr(md5(CAST(documents.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
""",
)
def scalar_doc_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + regexp + array function families in one projection
    over a deterministic hash-bucket sample of documents — all JVM
    built-ins inside whole-stage codegen; the sample filter is the
    reproducible Bernoulli-by-content sampling contract a
    training-data pipeline needs.  Round-4 consolidation: the
    ``doc_fingerprints`` registry row retired into the three
    fingerprint aggregate columns here — they run the REAL operator
    (`operators/text_analysis.py:doc_fingerprints`), so a defect in
    the 5-gram/md5/mod-8 construction still fails this row
    (COVERAGE.md)."""
    from data_engineering_user_session_analysis_spark.operators.text_analysis import (
        doc_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = doc_fingerprints(docs).groupBy("doc_id").agg(
        F.count("*").alias("_n_fp"),
        F.min("fingerprint").alias("min_fingerprint"),
        F.max("fingerprint").alias("max_fingerprint"),
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long") % 10
    w = F.split("text", " ")
    return docs.filter(bucket == 0).join(fp, "doc_id", "left").select(
        "doc_id",
        # string family
        F.upper("lang").alias("lang_upper"),
        F.substring("text", 1, 20).alias("prefix20"),
        F.replace(F.substring("text", 1, 40), F.lit(" "), F.lit("_")).alias("snake40"),
        F.locate("spark", F.col("text")).cast("int").alias("spark_pos"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.length(F.trim(F.col("text"))).cast("int").alias("trimmed_len"),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
        # regexp family
        F.col("text").rlike("spark\\s+\\w+").alias("has_spark_bigram"),
        F.regexp_extract("text", "spark\\s+(\\w+)", 1).alias("word_after_spark"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).cast("int").alias(
            "len_no_vowels"
        ),
        F.size(F.regexp_extract_all("text", F.lit("\\bdata\\b"), 0))
        .cast("int")
        .alias("data_mentions"),
        # array family
        F.size(w).cast("int").alias("n_tokens"),
        F.get(w, 0).alias("first_token"),
        F.element_at(w, -1).alias("last_token"),
        F.array_join(F.slice(F.array_sort(w), 1, 3), ",").alias("first3_sorted"),
        F.array_contains(w, "spark").alias("mentions_spark"),
        F.array_join(
            F.slice(F.reverse(F.array_sort(F.array_distinct(w))), 1, 2), ","
        ).alias("top2_types_desc"),
        # fingerprint family (round-4 consolidation: doc_fingerprints)
        F.coalesce(F.col("_n_fp"), F.lit(0)).cast("long").alias("n_fingerprints"),
        "min_fingerprint",
        "max_fingerprint",
    )


@register(
    "event_window_functions",
    """
SELECT event_id, user_id,
  -- ranking family (deterministic tie-break on event_id)
  CAST(rank()         OVER w AS INT) AS rnk,
  CAST(dense_rank()   OVER w AS INT) AS drnk,
  CAST(ntile(4)       OVER w AS INT) AS quartile,
  percent_rank()      OVER w AS pct_rank,
  cume_dist()         OVER w AS cume,
  -- time-range frame: trailing-hour activity
  CAST(count(*) OVER (
    PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
    AS n_events_trailing_1h,
  -- null-handling family (exact decimal comparison domain)
  nullif(event_type, 'error') AS type_or_null,
  coalesce(nullif(event_type, 'error'), 'suppressed') AS type_filled,
  CAST(greatest(CAST(value AS DECIMAL(18,2)),
                CAST(props->>'k' AS DECIMAL(18,2))) AS DOUBLE) AS max_metric,
  CAST(least(CAST(value AS DECIMAL(18,2)),
             CAST(props->>'k' AS DECIMAL(18,2))) AS DOUBLE) AS min_metric,
  CAST(value IS NOT NULL AND event_type IS NOT NULL AS BOOLEAN) AS is_complete
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC)
""",
)
def event_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family (rank, dense_rank, ntile,
    percent_rank, cume_dist), a time-RANGE frame (trailing-hour
    count), and the null-handling scalars (nullif/coalesce/
    greatest/least) in one event-grain pass.

    Plan shape: both window specs partition by user_id, so Catalyst
    shuffles ONCE and re-sorts within partitions for the second
    ordering — the scalar projection rides along map-side."""
    from pyspark.sql import types as T

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    w_range = (
        Window.partitionBy("user_id")
        .orderBy(epoch_seconds(F.col("ts")))
        .rangeBetween(-3600, 0)
    )
    k = F.from_json("props", T.MapType(T.StringType(), T.StringType()))["k"].cast(
        "decimal(18,2)"
    )
    v = F.col("value").cast("decimal(18,2)")
    type_or_null = F.nullif(F.col("event_type"), F.lit("error"))
    return ev.select(
        "event_id",
        "user_id",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.count("*").over(w_range).alias("n_events_trailing_1h"),
        type_or_null.alias("type_or_null"),
        F.coalesce(type_or_null, F.lit("suppressed")).alias("type_filled"),
        F.greatest(v, k).cast("double").alias("max_metric"),
        F.least(v, k).cast("double").alias("min_metric"),
        (F.col("value").isNotNull() & F.col("event_type").isNotNull()).alias(
            "is_complete"
        ),
    )


