"""Watermarked stream-stream join — purchase-to-view attribution.

Extension beyond the reference surface (its only join is the batch
left equi-join, ``spark_jobs/spark_batch_job.py:69-71``), but squarely
in its domain: attribute each ``purchase`` event to the ``view``
events of the same user that preceded it within an attribution
window — the classic ad-tech click/impression join, here expressed
over the reference's own event stream.

Spark-native design: both sides carry an event-time watermark and the
join predicate carries an explicit event-time range constraint
(``purchase_ts BETWEEN view_ts AND view_ts + window``).  That pair is
exactly what Structured Streaming's ``StreamingSymmetricHashJoin``
needs to derive per-side *state watermarks*: a buffered view row can
be evicted once the purchase-side watermark passes
``view_ts + window``, so join state is bounded by
``watermark + attribution_window`` of data per side — at 100 TB/day
the state store holds a sliding window, not the stream's history.

The transform is a plain ``DataFrame -> DataFrame``: over batch
frames it is an ordinary interval equi-join (one shuffle on
``user_id``), which is how the tests pin the streaming result equal
to the batch answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: join types Structured Streaming supports for stream-stream joins
#: with watermarks + an event-time range condition (Spark docs:
#: inner, leftOuter, rightOuter, fullOuter, leftSemi).
SUPPORTED_HOW = ("inner", "leftOuter", "leftSemi")


def attribution_join(
    purchases: DataFrame,
    views: DataFrame,
    *,
    watermark: str = "10 minutes",
    attribution_window: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join purchases (left) to the same user's preceding views (right).

    Parameters mirror the reference's streaming envelope: the 10-minute
    watermark is the one its checkpoint evidences (SURVEY.md §2.9 ST3),
    the 30-minute window matches the sessionization gap.

    ``how``:
      - ``inner``  — one row per (purchase, attributable view) pair.
      - ``leftOuter`` — additionally keeps purchases with no view in
        the window (view columns null).  In streaming, outer rows are
        emitted only once the watermark proves no match can arrive.
      - ``leftSemi`` — purchases that have at least one attributable
        view, view columns omitted (no duplication of the left side).
    """
    if how not in SUPPORTED_HOW:
        raise ValueError(f"how must be one of {SUPPORTED_HOW}, got {how!r}")

    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    v = views.select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
    )
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    if views.isStreaming:
        v = v.withWatermark("view_ts", watermark)

    cond = (
        (p["p_user_id"] == v["v_user_id"])
        & (p["purchase_ts"] >= v["view_ts"])
        & (p["purchase_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {attribution_window}"))
    )
    joined = p.join(v, cond, how)
    out = [
        F.col("p_user_id").alias("user_id"),
        "purchase_event_id",
        "purchase_ts",
        "purchase_value",
    ]
    if how != "leftSemi":
        out += ["view_event_id", "view_ts"]
    return joined.select(*out)


def split_purchases_views(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split one event stream into the two join inputs.  Each filter
    is a pushed predicate on the shared source — Spark plans two
    independent scans of the same stream, which is the supported
    self-join shape."""
    return (
        events.filter(F.col("event_type") == "purchase"),
        events.filter(F.col("event_type") == "view"),
    )
