"""Stream-stream watermarked join tests: streaming result == batch
interval join, outer-null emission gated on the watermark, and the
symmetric-hash-join state operator in the executed plan."""

from __future__ import annotations

import os
import time
import uuid

import pandas as pd

from data_engineering_user_session_analysis_spark.sources.events import load_events
from data_engineering_user_session_analysis_spark.streaming.ingest_stream import read_file_stream
from data_engineering_user_session_analysis_spark.streaming.stream_join import (
    attribution_join,
    split_purchases_views,
)


def _run_to_memory(result, output_mode="append"):
    name = f"sj_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q, name


def test_stream_stream_inner_join_equals_batch(spark, sf_small):
    """Self-join shape: one event stream split into purchase and view
    sides, inner-joined within the attribution window.  Streaming
    answer == the same transform over batch frames."""
    stream = read_file_stream(spark, os.path.join(sf_small, "events.parquet"))
    sp, sv = split_purchases_views(stream)
    q, name = _run_to_memory(
        attribution_join(sp, sv, watermark="3650 days", how="inner")
    )
    try:
        streamed = spark.table(name)
        bp, bv = split_purchases_views(load_events(spark, sf_small))
        batch = attribution_join(bp, bv, how="inner")
        assert streamed.count() == batch.count() > 0
        assert streamed.exceptAll(batch).count() == 0
        assert batch.exceptAll(streamed).count() == 0
        # executed plan used the streaming symmetric hash join operator
        ops = (q.lastProgress or {}).get("stateOperators", [])
        assert any("symmetricHashJoin" in o.get("operatorName", "") for o in ops)
    finally:
        q.stop()


def test_stream_stream_left_semi_equals_batch(spark, sf_small):
    stream = read_file_stream(spark, os.path.join(sf_small, "events.parquet"))
    sp, sv = split_purchases_views(stream)
    q, name = _run_to_memory(
        attribution_join(sp, sv, watermark="3650 days", how="leftSemi")
    )
    try:
        streamed = spark.table(name)
        bp, bv = split_purchases_views(load_events(spark, sf_small))
        batch = attribution_join(bp, bv, how="leftSemi")
        # semi join: one row per attributable purchase, no view columns
        assert "view_event_id" not in streamed.columns
        assert streamed.count() == batch.count() > 0
        assert streamed.exceptAll(batch).count() == 0
    finally:
        q.stop()


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


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """leftOuter: a purchase with no view in its window is held in
    state until the watermark proves no match can arrive, then emitted
    with null view columns."""
    src = tmp_path / "src"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 12:00:00")
    # batch 1: user 1 view+purchase 10 min apart (matched pair);
    # user 2 purchase with no view at all (the outer candidate)
    _mk_events(
        src / "a.parquet",
        [
            (1, base, 1, "view"),
            (2, base + pd.Timedelta("10m"), 1, "purchase"),
            (3, base + pd.Timedelta("5m"), 2, "purchase"),
        ],
    )
    stream = read_file_stream(spark, str(src), max_files_per_trigger=1)
    sp, sv = split_purchases_views(stream)
    result = attribution_join(
        sp, sv, watermark="10 minutes", attribution_window="30 minutes", how="leftOuter"
    )
    name = f"sj_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        matched = spark.table(name).filter("view_event_id IS NOT NULL")
        assert [r.purchase_event_id for r in matched.collect()] == [2]
        # batch 2: far-future events on BOTH sides push the watermark
        # past user 2's purchase so its outer row can be emitted
        far = base + pd.Timedelta("6h")
        _mk_events(
            src / "b.parquet",
            [(4, far, 3, "view"), (5, far, 3, "purchase")],
        )
        q.processAllAvailable()
        # no-data micro-batches finish the eviction asynchronously
        deadline = time.time() + 60
        while time.time() < deadline:
            outer = spark.table(name).filter("view_event_id IS NULL").collect()
            if outer:
                break
            q.processAllAvailable()
            time.sleep(1)
        assert [r.purchase_event_id for r in outer] == [3]
        assert outer[0].view_ts is None
    finally:
        q.stop()


def test_attribution_join_batch_window_bounds(spark):
    """Window edges: a view exactly at purchase_ts and exactly
    window-width before are both attributable; one second outside is
    not; views AFTER the purchase never attribute."""
    base = pd.Timestamp("2024-01-01 12:00:00")
    rows = [
        (1, base, 7, "purchase"),
        (2, base, 7, "view"),  # same instant: attributable
        (3, base - pd.Timedelta("30m"), 7, "view"),  # exactly window: in
        (4, base - pd.Timedelta("30m") - pd.Timedelta("1s"), 7, "view"),  # out
        (5, base + pd.Timedelta("1s"), 7, "view"),  # after purchase: out
    ]
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [pd.Timestamp(r[1]) for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    ev = spark.createDataFrame(pdf)
    p, v = split_purchases_views(ev)
    got = attribution_join(p, v, attribution_window="30 minutes", how="inner")
    assert sorted(r.view_event_id for r in got.collect()) == [2, 3]
