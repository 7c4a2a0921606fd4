"""Streaming queries surfaced through the batch-shaped registry: the
stream is driven to completion (availableNow + memory sink) and the
materialized result returned as a plain DataFrame, so the DuckDB
oracle can check streaming semantics against the equivalent batch
SQL — the gap-sessionization CTE.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.queries import register
from data_engineering_user_session_analysis_spark.queries.session_queries import _SESSIONIZED_CTE
from data_engineering_user_session_analysis_spark.streaming.ingest_stream import read_file_stream
from data_engineering_user_session_analysis_spark.streaming.session_stream import (
    session_window_rollup,
    write_memory_sink,
)


@register(
    "streaming_session_rollup",
    _SESSIONIZED_CTE
    + """
, firsts AS (
  SELECT *,
    first_value(event_type) OVER w AS first_event_type,
    last_value(event_type)  OVER w AS last_event_type
  FROM sessionized
  WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT
  user_id,
  min(ts) AS session_start_time,
  max(ts) AS session_end_time,
  date_diff('second', min(ts), max(ts)) AS session_duration_seconds,
  CAST(count(*) AS BIGINT) AS number_of_events,
  CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT) AS is_purchase,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value,
  any_value(first_event_type) AS first_event_type,
  any_value(last_event_type) AS last_event_type
FROM firsts
GROUP BY user_id, session_id
""",
)
def streaming_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming sessionization (session_window + memory
    sink, driven to completion) — must equal the batch lag/cumsum
    sessionization, which is what the oracle SQL computes.

    Watermark is effectively unbounded here so the bounded replay is
    lossless; the 10-minute production watermark is pinned separately
    in tests/test_streaming.py."""
    stream = read_file_stream(spark, os.path.join(sf_dir, "events.parquet"))
    rollup = session_window_rollup(stream, watermark="3650 days")
    name = f"stream_rollup_{uuid.uuid4().hex[:8]}"
    q = write_memory_sink(rollup, name, output_mode="complete")
    q.processAllAvailable()
    q.stop()
    return spark.table(name).withColumns(
        {
            "is_purchase": F.col("is_purchase").cast("int"),
            "session_value": F.col("session_value").cast("double"),
        }
    )


@register(
    "streaming_hourly_counts",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY date_trunc('hour', ts), event_type
""",
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window streaming aggregation (F.window, 1h) driven to
    completion — the canonical watermarked windowed count.  Oracle:
    the equivalent batch GROUP BY on the truncated hour."""
    stream = read_file_stream(spark, os.path.join(sf_dir, "events.parquet"))
    agg = (
        stream.withWatermark("ts", "3650 days")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
    )
    name = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    q = write_memory_sink(agg, name, output_mode="complete")
    q.processAllAvailable()
    q.stop()
    return spark.table(name).select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )


@register(
    "distinct_user_event_pairs",
    """
SELECT DISTINCT user_id, event_type FROM events
""",
)
def distinct_user_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates — batch twin of streaming deduplication (the
    streaming variant with watermark state is pinned in
    tests/test_streaming.py)."""
    from data_engineering_user_session_analysis_spark.sources.events import load_events

    return load_events(spark, sf_dir).dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
