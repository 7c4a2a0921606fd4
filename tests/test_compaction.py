"""Small-file compaction: stats-driven rewrite of one partition,
content-identical, other partitions untouched (sources/compaction.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.sources.compaction import (
    compact_partition,
    partition_file_stats,
)
from data_engineering_user_session_analysis_spark.sources.events import load_events


def _fragmented_lake(spark, sf_small, tmp_path) -> str:
    """A date-partitioned lake where every partition is shattered
    into many small files — the streaming-sink aftermath."""
    path = str(tmp_path / "lake")
    ev = load_events(spark, sf_small).withColumn("date", F.to_date("ts"))
    ev.repartition(20).write.partitionBy("date").mode("overwrite").parquet(path)
    return path


def test_stats_and_compact_roundtrip(spark, sf_small, tmp_path):
    lake = _fragmented_lake(spark, sf_small, tmp_path)
    stats = partition_file_stats(spark, lake)
    assert len(stats) > 1  # date-partitioned
    target = max(stats, key=lambda s: s["n_files"])
    assert target["n_files"] >= 10  # genuinely fragmented

    # materialize the before-content: the compaction swap replaces
    # files, so a lazy pre-swap DataFrame would re-read stale paths
    before_rows = sorted(map(tuple, spark.read.parquet(lake).collect()))
    other = [s for s in stats if s["path"] != target["path"]][0]
    other_files_before = {p for p, _ in _list(spark, other["path"])}

    report = compact_partition(
        spark, target["path"], target_file_bytes=1 << 30
    )
    assert report["files_after"] == 1
    assert report["files_before"] == target["n_files"]

    # content identical (partition col comes from the dir name)
    after_rows = sorted(map(tuple, spark.read.parquet(lake).collect()))
    assert after_rows == before_rows
    # untouched partition keeps its exact files
    assert {p for p, _ in _list(spark, other["path"])} == other_files_before


def test_compact_clustered_file_skipping(spark, sf_small, tmp_path):
    """cluster_by produces near-disjoint per-file key ranges: each
    output file's [min,max] user_id span must cover a fraction of the
    global span, which is what lets footer stats skip files."""
    lake = _fragmented_lake(spark, sf_small, tmp_path)
    stats = partition_file_stats(spark, lake)
    target = max(stats, key=lambda s: s["bytes"])
    report = compact_partition(
        spark,
        target["path"],
        target_file_bytes=max(1, target["bytes"] // 4),
        cluster_by=("user_id",),
    )
    assert report["files_after"] >= 3
    spans = []
    for p, _ in _list(spark, target["path"]):
        mm = (
            spark.read.parquet(p)
            .agg(F.min("user_id"), F.max("user_id"))
            .collect()[0]
        )
        spans.append((mm[0], mm[1]))
    spans.sort()
    # range partitioning => files overlap at most at boundaries
    overlaps = sum(
        1 for (a, b) in zip(spans, spans[1:]) if b[0] < a[1]
    )
    assert overlaps == 0, spans


def test_needs_compaction_signal(spark, sf_small, tmp_path):
    lake = _fragmented_lake(spark, sf_small, tmp_path)
    stats = partition_file_stats(spark, lake)
    s = max(stats, key=lambda s: s["n_files"])
    mean = s["bytes"] / s["n_files"]
    assert mean < (1 << 20)  # shattered: avg file well under 1 MB
    compact_partition(spark, s["path"], target_file_bytes=1 << 30)
    s2 = [x for x in partition_file_stats(spark, lake) if x["path"] == s["path"]][0]
    assert s2["n_files"] == 1
    assert s2["bytes"] > 0


def _list(spark, path):
    from data_engineering_user_session_analysis_spark.sources.compaction import _list_data_files

    return _list_data_files(spark, path)


def test_compact_refuses_then_retires_filestream_sink_log(spark, sf_small, tmp_path):
    """A lake built by writeStream carries a _spark_metadata log that
    batch root-reads treat as the authoritative file list; compaction
    must refuse by default (its renames would orphan the log) and,
    after retire_sink_log=True, the root re-read must see every row
    via plain listing — the ADVICE-flagged silent-loss scenario."""
    import pytest

    from data_engineering_user_session_analysis_spark.sources.compaction import compact_table, find_sink_log
    from data_engineering_user_session_analysis_spark.streaming.ingest_stream import (
        enrich_events,
        read_file_stream,
        write_lake_stream,
    )

    lake = str(tmp_path / "stream_lake")
    ckpt = str(tmp_path / "ckpt")
    # shatter the source into several files so availableNow runs
    # several micro-batches -> several files per lake partition
    src = str(tmp_path / "src")
    spark.read.parquet(os.path.join(sf_small, "events.parquet")).repartition(
        4
    ).write.parquet(src)
    stream = read_file_stream(spark, src, max_files_per_trigger=1)
    q = write_lake_stream(
        enrich_events(stream), lake, ckpt, partition_col="date", trigger_available_now=True
    )
    q.awaitTermination(120)
    assert find_sink_log(spark, lake) is not None
    src_count = spark.read.parquet(lake).count()
    target = max(partition_file_stats(spark, lake), key=lambda s: s["n_files"])

    with pytest.raises(RuntimeError, match="_spark_metadata"):
        compact_partition(spark, target["path"], target_file_bytes=1 << 30)
    with pytest.raises(RuntimeError, match="_spark_metadata"):
        compact_table(spark, lake, target_file_bytes=1 << 30)

    reports = compact_table(
        spark, lake, target_file_bytes=1 << 30, retire_sink_log=True
    )
    assert find_sink_log(spark, lake) is None
    assert any(r["files_after"] < r["files_before"] for r in reports)
    # the failure mode this guards: a stale sink log would make this
    # root read miss the compacted partitions entirely
    assert spark.read.parquet(lake).count() == src_count


def test_compact_table_sweeps_then_noops(spark, sf_small, tmp_path):
    """The table sweep compacts every fragmented partition once and is
    a no-op on the second pass (healthy partitions untouched)."""
    from data_engineering_user_session_analysis_spark.sources.compaction import compact_table

    lake = _fragmented_lake(spark, sf_small, tmp_path)
    n_parts = len(partition_file_stats(spark, lake))
    reports = compact_table(spark, lake, target_file_bytes=1 << 30)
    assert len(reports) == n_parts  # everything was fragmented
    assert all(r["files_after"] == 1 for r in reports)
    # content preserved across the whole table
    assert spark.read.parquet(lake).count() == 1000
    # second sweep: nothing left to do
    assert compact_table(spark, lake, target_file_bytes=1 << 30) == []
