"""Function-family coverage queries: the standard scalar/array/date
families (SURVEY.md §2.7 note: "the engine's surface should include
the standard string/date/math families since they are zero-cost"),
plus ROLLUP, UNPIVOT, time-range window frames, and deterministic
hash sampling.  Every expression is chosen for bit-identical
cross-engine behavior."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.queries import register
from data_engineering_user_session_analysis_spark.queries.relational_queries import EVENT_TYPES
from data_engineering_user_session_analysis_spark.sources.events import load_events
from data_engineering_user_session_analysis_spark.sources.tables import load_table


@register(
    "rollup_daily_revenue",
    """
SELECT strftime(ts, '%Y-%m-%d') AS date, event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
  CAST(GROUPING(strftime(ts, '%Y-%m-%d')) * 2 + GROUPING(event_type) AS INT)
    AS grouping_level
FROM events
GROUP BY ROLLUP (strftime(ts, '%Y-%m-%d'), event_type)
""",
)
def rollup_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (day → day+type → grand total) with grouping
    id — one shuffle for all three grouping sets."""
    ev = load_events(spark, sf_dir)
    return ev.rollup(
        F.date_format("ts", "yyyy-MM-dd").alias("date"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        F.grouping_id().cast("int").alias("grouping_level"),
    )


@register(
    "event_type_unpivot",
    """
WITH pivoted AS (
  SELECT user_id,
    CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
    CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
    CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
    CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
  FROM events GROUP BY user_id
)
SELECT user_id, 'click' AS event_type, click AS cnt FROM pivoted
UNION ALL SELECT user_id, 'error', error FROM pivoted
UNION ALL SELECT user_id, 'purchase', purchase FROM pivoted
UNION ALL SELECT user_id, 'signup', signup FROM pivoted
UNION ALL SELECT user_id, 'view', view FROM pivoted
""",
)
def event_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT via stack(): wide per-user counts back to long form —
    the melt operation feature pipelines need constantly."""
    ev = load_events(spark, sf_dir)
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )
    stack_expr = "stack(5, " + ", ".join(
        f"'{t}', {t}" for t in EVENT_TYPES
    ) + ") as (event_type, cnt)"
    return pivoted.selectExpr("user_id", stack_expr)


@register(
    "trailing_hour_activity",
    """
SELECT event_id, user_id,
  CAST(count(*) OVER (
    PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
    AS n_events_trailing_1h
FROM events
""",
)
def trailing_hour_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frame (rangeBetween on epoch seconds):
    per-event trailing-hour activity — the sliding-window primitive
    for rate features and anomaly baselines."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id", "user_id", F.count("*").over(w).alias("n_events_trailing_1h")
    )


@register(
    "token_array_ops",
    """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
  CAST(len(w) AS INT) AS n_tokens,
  w[1] AS first_token,
  w[-1] AS last_token,
  array_to_string(list_sort(w)[1:3], ',') AS first3_sorted,
  CAST(list_contains(w, 'spark') AS BOOLEAN) AS mentions_spark,
  array_to_string(list_reverse(list_sort(list_distinct(w)))[1:2], ',') AS top2_types_desc
FROM toks
""",
)
def token_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family: index, slice, sort, distinct, reverse,
    contains, join — all JVM built-ins over the token array."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(w).cast("int").alias("n_tokens"),
        F.get(w, 0).alias("first_token"),
        F.element_at(w, -1).alias("last_token"),
        F.array_join(F.slice(F.array_sort(w), 1, 3), ",").alias("first3_sorted"),
        F.array_contains(w, "spark").alias("mentions_spark"),
        F.array_join(
            F.slice(F.reverse(F.array_sort(F.array_distinct(w))), 1, 2), ","
        ).alias("top2_types_desc"),
    )


@register(
    "string_functions",
    """
SELECT doc_id,
  upper(lang) AS lang_upper,
  substr(text, 1, 20) AS prefix20,
  replace(substr(text, 1, 40), ' ', '_') AS snake40,
  CAST(strpos(text, 'spark') AS INT) AS spark_pos,
  lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
  CAST(length(trim(text)) AS INT) AS trimmed_len,
  concat(lang, ':', source) AS lang_source
FROM documents
""",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family: case, substring, replace, locate,
    pad, trim, concat."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_upper"),
        F.substring("text", 1, 20).alias("prefix20"),
        F.replace(
            F.substring("text", 1, 40), F.lit(" "), F.lit("_")
        ).alias("snake40"),
        F.locate("spark", F.col("text")).cast("int").alias("spark_pos"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.length(F.trim(F.col("text"))).cast("int").alias("trimmed_len"),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
    )


@register(
    "date_arithmetic",
    """
SELECT o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
  CAST(date_part('quarter', o_orderdate) AS INT) AS order_quarter,
  CAST(date_diff('day', o_orderdate, TIMESTAMP '1999-01-01') AS INT) AS days_to_1999
FROM orders
""",
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function family: add, trunc, last_day, quarter, diff —
    string-projected for engine-neutral comparison."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.datediff(F.lit("1999-01-01"), F.to_date("o_orderdate"))
        .cast("int")
        .alias("days_to_1999"),
    )


@register(
    "hash_sample",
    """
SELECT doc_id, lang, n_chars
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
""",
)
def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample by content hash — unlike
    TABLESAMPLE, reproducible across engines, runs, and partitionings
    (the sampling contract a training-data pipeline needs)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long") % 10
    return docs.filter(bucket == 0).select("doc_id", "lang", "n_chars")


@register(
    "regexp_functions",
    """
SELECT doc_id,
  CAST(regexp_matches(text, 'spark\\s+\\w+') AS BOOLEAN) AS has_spark_bigram,
  regexp_extract(text, 'spark\\s+(\\w+)', 1) AS word_after_spark,
  length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_no_vowels,
  CAST(len(regexp_extract_all(text, '\\bdata\\b')) AS INT) AS data_mentions
FROM documents
""",
)
def regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family: match test, group extraction, global replace,
    extract-all counting."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").rlike("spark\\s+\\w+").alias("has_spark_bigram"),
        F.regexp_extract("text", "spark\\s+(\\w+)", 1).alias("word_after_spark"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).cast("int").alias(
            "len_no_vowels"
        ),
        F.size(F.regexp_extract_all("text", F.lit("\\bdata\\b"), 0))
        .cast("int")
        .alias("data_mentions"),
    )


@register(
    "ranking_functions",
    """
SELECT event_id, user_id,
  CAST(rank()         OVER w AS INT) AS rnk,
  CAST(dense_rank()   OVER w AS INT) AS drnk,
  CAST(ntile(4)       OVER w AS INT) AS quartile,
  percent_rank()      OVER w AS pct_rank,
  cume_dist()         OVER w AS cume
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC)
""",
)
def ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family: rank, dense_rank, ntile,
    percent_rank, cume_dist (deterministic tie-break on event_id)."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "user_id",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "props_map_stats",
    """
SELECT k_key,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(k_value) AS BIGINT) AS sum_value,
  CAST(min(k_value) AS BIGINT) AS min_value,
  CAST(max(k_value) AS BIGINT) AS max_value
FROM (
  SELECT k AS k_key, CAST(props ->> k AS BIGINT) AS k_value
  FROM events, unnest(json_keys(props)) AS t(k)
)
GROUP BY k_key
""",
)
def props_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the JSON payload as map<string,long>,
    explode entries, aggregate per key — the schema-on-read path for
    open-ended event properties (vs the fixed-struct decode of
    props_extract)."""
    from pyspark.sql import types as T

    ev = load_events(spark, sf_dir)
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return (
        ev.select(F.explode(m).alias("k_key", "k_value"))
        .groupBy("k_key")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k_value").alias("sum_value"),
            F.min("k_value").alias("min_value"),
            F.max("k_value").alias("max_value"),
        )
    )


@register(
    "sql_surface_region_revenue",
    """
SELECT r_name AS region,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def sql_surface_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL API surface: identical query expressed as
    ``spark.sql`` over registered temp views — Catalyst produces the
    same plan as the DataFrame composition, proving both layers of
    the engine's API."""
    from data_engineering_user_session_analysis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name AS region,
          count(*) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@register(
    "null_handling_functions",
    """
SELECT event_id,
  nullif(event_type, 'error') AS type_or_null,
  coalesce(nullif(event_type, 'error'), 'suppressed') AS type_filled,
  CAST(greatest(CAST(value AS DECIMAL(18,2)), CAST(props->>'k' AS DECIMAL(18,2))) AS DOUBLE) AS max_metric,
  CAST(least(CAST(value AS DECIMAL(18,2)), CAST(props->>'k' AS DECIMAL(18,2))) AS DOUBLE) AS min_metric,
  CAST(value IS NOT NULL AND event_type IS NOT NULL AS BOOLEAN) AS is_complete
FROM events
""",
)
def null_handling_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family: nullif, coalesce, greatest/least (exact
    decimal comparison domain — double promotion differs across
    engines), boolean completeness flag."""
    from pyspark.sql import types as T

    ev = load_events(spark, sf_dir)
    k = F.from_json("props", T.MapType(T.StringType(), T.StringType()))["k"].cast(
        "decimal(18,2)"
    )
    v = F.col("value").cast("decimal(18,2)")
    type_or_null = F.nullif(F.col("event_type"), F.lit("error"))
    return ev.select(
        "event_id",
        type_or_null.alias("type_or_null"),
        F.coalesce(type_or_null, F.lit("suppressed")).alias("type_filled"),
        F.greatest(v, k).cast("double").alias("max_metric"),
        F.least(v, k).cast("double").alias("min_metric"),
        (F.col("value").isNotNull() & F.col("event_type").isNotNull()).alias(
            "is_complete"
        ),
    )
