"""Watermark-bounded streaming deduplication.

The reference ingests from Kafka with at-least-once delivery
(`/root/reference/spark_jobs/spark_stream.py:29-36` — no transactional
producer, no idempotent sink), so replayed micro-batches can deliver
the same event twice.  Its pipeline carries the duplicates through;
this operator is the missing exactly-once-per-key guard, and the same
primitive is the streaming tier of the repo's dedup family
(batch exact dedup: `queries/text_queries.py`).

Spark-native design: ``dropDuplicatesWithinWatermark`` instead of
``dropDuplicates``.  Plain ``dropDuplicates`` on a stream keeps EVERY
key ever seen in the state store — at 100 TB/day the state grows
without bound and the job dies by memory, not by logic.  The
within-watermark variant evicts a key once the event-time watermark
passes its first-seen timestamp + the delay, so state is bounded by
(keys arriving per watermark interval), a sliding window.  The
contract weakens correspondingly — a duplicate arriving LATER than
the watermark delay is re-emitted — which is the right trade for
redelivery dedup: replays are near-in-time, and the delay knob is the
replay horizon.  Both sides of that contract are pinned in
tests/test_stream_dedup.py.

Over batch frames the transform degrades to a plain
``dropDuplicates`` on the keys, which is how tests pin the streaming
answer equal to the batch answer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    *,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop redelivered rows by ``keys`` within the watermark horizon.

    The 10-minute default mirrors the reference's evidenced watermark
    (SURVEY.md §2.9 ST3).  ``keys`` defaults to the event primary key;
    for document streams pass the content digest column instead
    (exact content dedup at ingest).

    Streaming: requires ``ts_col`` to be an event-time timestamp;
    emits each key's first-seen row, holds the key in state for
    ``watermark``, then evicts.  Batch: same call degrades to
    ``dropDuplicates(keys)`` (Spark ignores the watermark), keeping
    the transform a plain DataFrame -> DataFrame.
    """
    keys = list(keys)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def dedup_ingest(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    scrub_col: str | None = "props",
) -> DataFrame:
    """The ingest-hygiene composition: PII-scrub the payload column,
    then drop redelivered events by primary key within the watermark
    horizon — the streaming twin of the batch corpus-prep pipeline's
    first stages (`pipelines/corpus_prep.py`).

    The scrub is a map-side projection, so it rides inside the same
    micro-batch stage as the decode; only the dedup holds state.
    ``scrub_col=None`` skips scrubbing (pass-through dedup).
    """
    from data_engineering_user_session_analysis_spark.operators.scrubbing import (
        scrub_pii,
    )

    out = events
    if scrub_col is not None:
        out = scrub_pii(out, scrub_col)
    return dedup_stream(out, ts_col=ts_col, watermark=watermark)
