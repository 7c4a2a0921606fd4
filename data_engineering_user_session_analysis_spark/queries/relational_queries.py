"""Relational-surface widening: the operator families a user of a
full analytics engine expects beyond the reference's literal code —
set operations, pivot, cube/grouping sets, exact percentiles,
lag/lead analytics, as-of joins, and window frame specs.  Each is a
Spark built-in composition with an exact DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.sessionize import epoch_seconds
from data_engineering_user_session_analysis_spark.queries import register
from data_engineering_user_session_analysis_spark.sources.events import load_events
from data_engineering_user_session_analysis_spark.sources.tables import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "user_segments",
    """
(SELECT user_id, strftime(ts, '%Y-%m-%d') AS date
 FROM events WHERE event_type = 'purchase'
 INTERSECT
 SELECT user_id, strftime(ts, '%Y-%m-%d')
 FROM events WHERE event_type = 'error')
EXCEPT
SELECT user_id, strftime(ts, '%Y-%m-%d')
FROM events WHERE event_type = 'signup'
""",
)
def user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (SURVEY.md §2.6) at (user, day) grain:
    user-days with both a purchase and an error but no signup —
    INTERSECT then EXCEPT (distinct semantics).  ``intersect``
    compiles to a LeftSemi join and ``subtract`` to a LeftAnti join
    (since round 9 this row is the registry's anti-join carrier —
    the retired ``customers_no_orders`` row was permanently 0-row;
    non-vacuity of the anti path here is pinned in
    tests/test_tpch.py::test_anti_join_non_vacuous)."""
    ev = load_events(spark, sf_dir)

    def days(event_type: str) -> DataFrame:
        return ev.filter(F.col("event_type") == event_type).select(
            "user_id", F.date_format("ts", "yyyy-MM-dd").alias("date")
        )

    # left side is already distinct (intersect output), so EXCEPT
    # DISTINCT ≡ EXCEPT ALL here — and subtract() plans as a LeftAnti
    # join rather than exceptAll's replicate-union rewrite
    return days("purchase").intersect(days("error")).subtract(
        days("signup")
    )


@register(
    "event_type_pivot",
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
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot + unpivot in one plan: per-user counts pivoted wide (one
    column per event type, explicit value list → no extra
    distinct-discovery job), then melted back long via ``stack()`` —
    the round-trip covers both reshape directions in a single
    driver-checked row (round 1 had separate pivot/unpivot entries;
    COVERAGE.md).  One shuffle for the pivot agg; the stack is a
    map-side Expand."""
    ev = load_events(spark, sf_dir)
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )
    stack_expr = (
        "stack(5, "
        + ", ".join(f"'{t}', {t}" for t in EVENT_TYPES)
        + ") as (event_type, cnt)"
    )
    return pivoted.selectExpr("user_id", stack_expr)


@register(
    "docs_cube",
    """
SELECT lang, source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
  CAST(GROUPING(lang) * 2 + GROUPING(source) AS INT) AS grouping_level
FROM documents
GROUP BY CUBE (lang, source)
""",
)
def docs_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation with grouping id — all four (lang, source)
    grouping sets in one pass (Spark expands to a single shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.cube("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
        F.grouping_id().cast("int").alias("grouping_level"),
    )


@register(
    "value_percentiles",
    # Explicit replay of Spark's exact-percentile algorithm rather
    # than quantile_cont: Spark aggregates counts per DISTINCT value
    # and, when the floor- and ceil-rank values land in the same
    # bucket (tie-heavy 2-decimal data: at sf1 the 'view' p90
    # neighbors are both 115.04), returns the bucket value directly —
    # quantile_cont computes (1-f)*a + f*b, which for a == b is NOT a
    # in floating point (115.04000000000002).  The CTE mirrors the
    # bucket walk and the same-bucket short-circuit, with every
    # literal cast to DOUBLE so both engines run identical
    # double-precision expressions (DuckDB parses bare 0.9 as
    # DECIMAL, which would floor() differently at exact-integer
    # positions).
    """
WITH vc AS (
  SELECT event_type, value, count(*) AS c FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, value,
    sum(c) OVER (PARTITION BY event_type ORDER BY value) - c AS cum_lo,
    sum(c) OVER (PARTITION BY event_type ORDER BY value) AS cum_hi,
    sum(c) OVER (PARTITION BY event_type) AS n
  FROM vc
), pcts AS (
  SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                 CAST(0.99 AS DOUBLE)]) AS p
), pos AS (
  SELECT g.event_type, pcts.p, pcts.p * (g.n - 1) AS pos
  FROM (SELECT DISTINCT event_type, n FROM cum) g CROSS JOIN pcts
), ab AS (
  SELECT pos.event_type, pos.p, pos.pos,
    max(CASE WHEN cum.cum_lo <= floor(pos.pos)
              AND floor(pos.pos) < cum.cum_hi THEN cum.value END) AS a,
    max(CASE WHEN cum.cum_lo <= ceil(pos.pos)
              AND ceil(pos.pos) < cum.cum_hi THEN cum.value END) AS b
  FROM pos JOIN cum ON pos.event_type = cum.event_type
  GROUP BY 1, 2, 3
), r AS (
  SELECT event_type, p,
    CASE WHEN pos = floor(pos) OR a = b THEN a
         ELSE (floor(pos) + 1 - pos) * a + (pos - floor(pos)) * b
    END AS v
  FROM ab
)
SELECT event_type,
  max(CASE WHEN p = CAST(0.5 AS DOUBLE) THEN v END) AS p50,
  max(CASE WHEN p = CAST(0.9 AS DOUBLE) THEN v END) AS p90,
  max(CASE WHEN p = CAST(0.99 AS DOUBLE) THEN v END) AS p99
FROM r GROUP BY event_type
""",
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group.  (The 100 TB variant
    is approx_percentile — single-pass sketch; exact needs a sort and
    is the correctness baseline here.)  The oracle replays Spark's
    distinct-value bucket walk explicitly — see the SQL comment."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )


@register(
    "event_transitions",
    """
WITH seq AS (
  SELECT user_id, event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT prev_type, event_type,
  CAST(count(*) AS BIGINT) AS n_transitions,
  CAST(count(CASE WHEN next_type = 'purchase' THEN 1 END) AS BIGINT)
    AS n_followed_by_purchase
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics (the primitives gap-sessionization builds
    on): event-type transition matrix + purchase follow-through."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumns(
        {
            "prev_type": F.lag("event_type").over(w),
            "next_type": F.lead("event_type").over(w),
        }
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy("prev_type", "event_type").agg(
        F.count("*").alias("n_transitions"),
        F.count(F.when(F.col("next_type") == "purchase", 1)).alias(
            "n_followed_by_purchase"
        ),
    )


@register(
    "purchase_asof_view",
    """
WITH tagged AS (
  SELECT *,
    max(CASE WHEN event_type = 'view' THEN ts END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
  FROM events
)
SELECT event_id, user_id, ts, last_view_ts,
  CAST(date_diff('second', last_view_ts, ts) AS BIGINT) AS seconds_since_view
FROM tagged WHERE event_type = 'purchase'
""",
)
def purchase_asof_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed as a running conditional max (Spark has
    no native as-of; this windowed form is exact, single-shuffle, and
    skew-safe — the per-key alternative `pd.merge_asof` via
    applyInPandas is only worth it for two distinct tables)."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = ev.withColumn(
        "last_view_ts",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    return tagged.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        "last_view_ts",
        (epoch_seconds(F.col("ts")) - epoch_seconds(F.col("last_view_ts"))).alias(
            "seconds_since_view"
        ),
    )


@register(
    "customer_running_total",
    """
SELECT o_custkey, o_orderkey,
  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
  CAST(row_number()
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT)
    AS order_seq,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
  CAST(date_part('quarter', o_orderdate) AS INT) AS order_quarter,
  CAST(date_diff('day', o_orderdate, TIMESTAMP '1999-01-01') AS INT) AS days_to_1999
FROM orders
""",
)
def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window frame (rowsBetween): per-customer running
    spend — decimal accumulation so partial order never changes the
    result — plus the date-function family (add, trunc, last_day,
    quarter, diff) as order-timeline columns (round 1's separate
    ``date_arithmetic`` entry, folded in here at the same order
    grain; COVERAGE.md).  The date projection is map-side and rides
    the window's single shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(run)
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w).cast("int").alias("order_seq"),
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
    "salted_user_totals",
    """
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY user_id
""",
)
def salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe per-user totals via salted two-phase aggregation
    (operators/skew.py) — the hot-key fallback for Zipf-skewed users.
    The oracle is the direct GROUP BY: salting must be invisible in
    the result."""
    from data_engineering_user_session_analysis_spark.operators.skew import salted_agg

    ev = load_events(spark, sf_dir)
    out = salted_agg(
        ev,
        ["user_id"],
        {
            "n_events": ("count", "event_id"),
            "total_value": ("sum", F.col("value").cast("decimal(18,2)")),
        },
        buckets=16,
        row_key="event_id",  # deterministic salt — retry-safe at scale
    )
    return out.withColumn("total_value", F.col("total_value").cast("double"))
