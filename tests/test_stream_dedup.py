"""Streaming dedup tests: redelivered keys are dropped within the
watermark horizon, the dedupe-within-watermark state operator is in
the executed plan, state is evicted after the horizon (the bounded-
state contract), and the batch degradation equals dropDuplicates."""

from __future__ import annotations

import uuid

import pandas as pd

from data_engineering_user_session_analysis_spark.sources.events import load_events
from data_engineering_user_session_analysis_spark.streaming.ingest_stream import (
    read_file_stream,
)
from data_engineering_user_session_analysis_spark.streaming.stream_dedup import (
    dedup_stream,
)


def _mk_events(path, rows):
    """rows: (event_id, ts, user_id, event_type)."""
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [pd.Timestamp(r[1]).value for r in rows],  # nanos-as-long
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(path)


def _start(result):
    name = f"sd_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    return q, name


def test_stream_dedup_drops_redelivered_keys(spark, tmp_path):
    """Exact and near-in-time (jittered-timestamp) redeliveries of the
    same key collapse to one output row; the state operator is the
    dedupe-within-watermark one, not the unbounded dedupe."""
    src = tmp_path / "src"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 12:00:00")
    _mk_events(
        src / "a.parquet",
        [
            (1, base, 1, "view"),
            (1, base, 1, "view"),  # exact duplicate
            (2, base + pd.Timedelta("1m"), 1, "purchase"),
            (3, base + pd.Timedelta("2m"), 2, "view"),
        ],
    )
    # redelivery in a later micro-batch, with timestamp jitter — the
    # case plain dropDuplicates-on-(key,ts) would miss
    _mk_events(
        src / "b.parquet",
        [
            (2, base + pd.Timedelta("1m30s"), 1, "purchase"),
            (4, base + pd.Timedelta("3m"), 2, "click"),
        ],
    )
    stream = read_file_stream(spark, str(src), max_files_per_trigger=1)
    q, name = _start(dedup_stream(stream, watermark="10 minutes"))
    try:
        q.processAllAvailable()
        out = spark.table(name)
        assert sorted(r.event_id for r in out.collect()) == [1, 2, 3, 4]
        ops = (q.lastProgress or {}).get("stateOperators", [])
        assert any(
            o.get("operatorName") == "dedupeWithinWatermark" for o in ops
        ), ops
    finally:
        q.stop()


def test_stream_dedup_state_evicted_after_horizon(spark, tmp_path):
    """The bounded-state contract: once the watermark passes a key's
    eviction point, a fresh-timestamped redelivery of that key is
    treated as new.  This is the trade that keeps state O(keys per
    watermark interval) instead of O(all keys ever) at 100 TB."""
    src = tmp_path / "src"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 12:00:00")
    _mk_events(src / "a.parquet", [(1, base, 1, "view")])
    # far-future batch advances the watermark well past key 1's
    # (first-seen + delay) eviction point
    _mk_events(
        src / "b.parquet", [(2, base + pd.Timedelta("6h"), 2, "view")]
    )
    # expired state is purged at the end of the first batch that RUNS
    # under the advanced watermark — this batch triggers the purge
    _mk_events(
        src / "c.parquet", [(3, base + pd.Timedelta("6h 1m"), 3, "view")]
    )
    # key 1 redelivered with a fresh timestamp after eviction
    _mk_events(
        src / "d.parquet",
        [(1, base + pd.Timedelta("6h 2m"), 1, "view")],
    )
    stream = read_file_stream(spark, str(src), max_files_per_trigger=1)
    q, name = _start(dedup_stream(stream, watermark="10 minutes"))
    try:
        q.processAllAvailable()
        ids = sorted(r.event_id for r in spark.table(name).collect())
        assert ids == [1, 1, 2, 3], ids  # re-emitted: state was evicted
    finally:
        q.stop()


def test_dedup_ingest_scrubs_and_dedups(spark, tmp_path):
    """The composed ingest stage: payload PII is redacted AND the
    redelivered key is dropped, in one streaming pass."""
    from data_engineering_user_session_analysis_spark.streaming.stream_dedup import (
        dedup_ingest,
    )

    src = tmp_path / "src"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 12:00:00")
    rows = [
        (1, base, 1, "view"),
        (1, base, 1, "view"),  # redelivery
        (2, base + pd.Timedelta("1m"), 2, "view"),
    ]
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [pd.Timestamp(r[1]).value for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [1.0] * len(rows),
            "props": ['{"email": "bob@example.com"}'] * len(rows),
        }
    )
    pdf.to_parquet(src / "a.parquet")
    stream = read_file_stream(spark, str(src))
    q, name = _start(dedup_ingest(stream, watermark="10 minutes"))
    try:
        q.processAllAvailable()
        out = spark.table(name).collect()
        assert sorted(r.event_id for r in out) == [1, 2]
        for r in out:
            assert "<EMAIL>" in r.props and "bob@example.com" not in r.props
    finally:
        q.stop()


def test_batch_degradation_equals_drop_duplicates(spark, sf_small):
    """Over a batch frame the same call is a plain key dedup: one row
    per event_id, all original ids preserved."""
    from pyspark.sql import functions as F

    events = load_events(spark, sf_small)
    # duplicate every row (explode, not self-union: a self-union's
    # shared attribute ids trip Spark's dedup-to-aggregate rewrite)
    doubled = events.withColumn(
        "_n", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("_n")
    out = dedup_stream(doubled)
    assert out.count() == events.select("event_id").distinct().count()
    # every surviving row is an original event row, bit-for-bit
    # (anti-join against a FRESH scan: exceptAll over a Deduplicate
    # node trips INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND in Spark 4.1)
    fresh = load_events(spark, sf_small)
    assert out.join(fresh, on=list(fresh.columns), how="left_anti").count() == 0
