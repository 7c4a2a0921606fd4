"""Full session rollup — the reference's declared `user_session`
serving table (DDL at ``spark_jobs/spark_stream.py:116-131``):
start/end/duration (sec + minutes), event count, first/last
product-like fields, and the ordered event list serialized to a
string column.

The event list is the part the reference never shipped (its
``events_json TEXT`` column plus commented-out array-of-struct parse,
``spark_jobs/spark_batch_job.py:102-110``).  Spark-first: sort the
collected struct array by (ts, event_id) *inside* the aggregation
(``array_sort`` on a leading-timestamp struct), so the serialization
is deterministic under any partitioning — required for oracle hashes
and for stable downstream parsing.

Works for both session models: gap-derived ``session_id`` or a
data-assigned key column (SURVEY.md §2.9) — the operator only needs
*some* session key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.sessionize import epoch_seconds


def session_rollup_full(
    df: DataFrame,
    session_col: str = "session_id",
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_type_col: str = "event_type",
    id_col: str = "event_id",
    with_events_json: bool = True,
) -> DataFrame:
    """Aggregate events to the full serving-table schema.

    One hash aggregation; ``collect_list`` makes this the heaviest
    rollup (state ~ session size), which is fine: sessions are
    human-scale (10s-100s of events), never data-scale.
    """
    order = F.struct(F.col(ts_col), F.col(id_col))
    start, end = F.min(ts_col), F.max(ts_col)
    dur_sec = epoch_seconds(end) - epoch_seconds(start)
    sorted_events = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col), F.col(id_col), F.col(event_type_col)))
    )
    aggs = [
        start.alias("session_start_time"),
        end.alias("session_end_time"),
        dur_sec.alias("session_duration_seconds"),
        F.round(dur_sec / 60.0, 2).alias("session_duration_minutes"),
        F.count("*").alias("number_of_events"),
        F.min_by(id_col, order).alias("first_event_id"),
        F.max_by(id_col, order).alias("last_event_id"),
        F.min_by(event_type_col, order).alias("first_event_type"),
        F.max_by(event_type_col, order).alias("last_event_type"),
        F.array_join(
            F.transform(
                sorted_events,
                lambda s: F.concat_ws(
                    ":", s[id_col].cast("string"), s[event_type_col]
                ),
            ),
            ",",
        ).alias("events_trace"),
    ]
    if with_events_json:
        aggs.append(F.to_json(sorted_events).alias("events_json"))
    out = df.groupBy(user_col, session_col).agg(*aggs)
    return out.withColumn(
        "date", F.date_format("session_start_time", "yyyy-MM-dd")
    )
