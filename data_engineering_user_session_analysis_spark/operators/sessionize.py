"""Sessionization operators — the reference's core capability.

The reference evidences two session models (SURVEY.md §1.2, §2.9):

* **key-based** — sessions pre-assigned by the data (`user_session`
  UUID column in the e-commerce schema; reference
  ``spark_jobs/spark_batch_job.py:27-41`` groups by it directly);
* **gap-based** — sessions *derived* from event-time gaps per user
  (the synthetic web-event schema has no session key; the committed
  streaming checkpoint at reference ``tmp/state/0/`` shows a stateful
  per-user session aggregation with a 10-minute watermark).

Batch gap-sessionization is the classic lag/cumsum construction:
flag an event as a session start when its gap from the previous event
of the same user exceeds the threshold, then running-sum the flags.
This is the DuckDB-oracle-checkable twin of streaming
``session_window`` (see ``streaming/session_stream.py``).

Scale notes (100 TB): the window spec partitions by ``user_id`` —
one shuffle, hash-partitioned on the user key, the same partitioning
the downstream session rollup needs, so Catalyst reuses the exchange
(no second shuffle between sessionize and the per-session groupBy).
Hot users (Zipf skew) are bounded: a user's events must fit one
partition's sort buffer, which holds to ~10^8 events/user; beyond
that, pre-split by (user_id, date) and stitch boundary sessions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Truncated epoch seconds for TIMESTAMP *and* TIMESTAMP_NTZ
    inputs (NTZ cannot cast to BIGINT directly; casting through
    TIMESTAMP is the identity under the engine's UTC session tz)."""
    return F.col(col).cast("timestamp").cast("long") if isinstance(col, str) else col.cast("timestamp").cast("long")


def epoch_micros(col: Column | str) -> Column:
    """Exact epoch microseconds (native TimestampType precision)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: tuple[str, ...] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-user session index from event-time gaps.

    Adds two columns:

    * ``session_seq`` — 1-based session ordinal within the user
      (deterministic: ordered by (ts, *order_cols*));
    * ``session_col`` — globally unique string key
      ``"{user}-{seq}"``.

    Events whose gap from the previous same-user event exceeds
    ``gap_seconds`` open a new session (strict ``>``, matching
    streaming ``session_window`` semantics where an event at exactly
    ``gap`` past the previous one extends the window).

    The gap is compared at native MICROSECOND precision — the same
    precision streaming ``session_window`` uses — so batch and
    streaming sessionization agree on boundary pairs.  (Round 1
    compared second-truncated epochs, which merges a pair whose
    truncated delta equals the gap while its true delta exceeds it;
    the DuckDB oracle CTE uses ``date_diff('microsecond', ...)`` to
    match exactly.)
    """
    order = [F.col(ts_col).asc(), *(F.col(c).asc() for c in order_cols)]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    gap = epoch_micros(F.col(ts_col)) - epoch_micros(prev_ts)
    is_new = F.when(
        prev_ts.isNull() | (gap > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", F.sum(is_new).over(running)).withColumn(
        session_col,
        F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_seq")),
    )


def _event_order(ts_col: str, tiebreak_col: str) -> Column:
    """Total order on events: (ts, tiebreak) as a comparable struct.

    The reference uses ``first()/last()`` in group-agg for
    first/last product (``spark_jobs/spark_batch_job.py:30``), which
    is order-NONdeterministic in Spark; the intent is
    earliest/latest.  ``min_by/max_by`` over this struct is the
    deterministic fix (SURVEY.md §2.4 A8)."""
    return F.struct(F.col(ts_col), F.col(tiebreak_col))


def session_rollup(
    df: DataFrame,
    session_col: str = "session_id",
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_type_col: str = "event_type",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    purchase_value: str = "purchase",
) -> DataFrame:
    """Session-level aggregate — the reference's Q1
    (``spark_jobs/spark_batch_job.py:27-41``) generalized to the full
    ``user_session`` serving DDL (``spark_jobs/spark_stream.py:116-131``).

    One hash aggregation (partial + final, single shuffle on the
    session key).  Deterministic first/last via min_by/max_by on
    (ts, tiebreak).
    """
    order = _event_order(ts_col, tiebreak_col)
    start = F.min(ts_col)
    end = F.max(ts_col)
    return df.groupBy(user_col, session_col).agg(
        start.alias("session_start_time"),
        end.alias("session_end_time"),
        (epoch_seconds(end) - epoch_seconds(start)).alias("session_duration_seconds"),
        F.count("*").alias("number_of_events"),
        F.countDistinct(event_type_col).alias("distinct_event_types"),
        F.max(F.when(F.col(event_type_col) == purchase_value, 1).otherwise(0)).alias(
            "is_purchase"
        ),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("session_value"),
        F.min_by(event_type_col, order).alias("first_event_type"),
        F.max_by(event_type_col, order).alias("last_event_type"),
    )
