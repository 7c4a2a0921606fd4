"""LIVE JDBC round-trips (reference S5/S6) against embedded Derby —
the JDBC driver Spark ships for its Hive metastore, so no external
database is needed.  These are real ``df.write.jdbc`` /
``spark.read.jdbc`` / streaming ``foreachBatch`` JDBC paths, not
parquet stand-ins."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.sources.events import load_events
from data_engineering_user_session_analysis_spark.sources.jdbc import read_jdbc, write_jdbc

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _derby_url(tmp_path, name: str) -> str:
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def test_jdbc_overwrite_roundtrip(spark, sf_small, tmp_path):
    """S5: serving-table overwrite + read-back equality, including a
    second overwrite (the reference's daily re-publish contract)."""
    url = _derby_url(tmp_path, "serving")
    agg = (
        load_events(spark, sf_small)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )
    write_jdbc(agg, url, "user_totals", properties=DERBY_PROPS)
    back = read_jdbc(spark, url, "user_totals", properties=DERBY_PROPS)
    assert back.count() == agg.count()
    assert agg.exceptAll(back).count() == 0
    # re-publish (overwrite) converges, no duplicate rows
    write_jdbc(agg, url, "user_totals", properties=DERBY_PROPS)
    assert read_jdbc(spark, url, "user_totals", properties=DERBY_PROPS).count() == agg.count()


def test_jdbc_partitioned_read(spark, sf_small, tmp_path):
    """Range-partitioned JDBC scan: N parallel connections, same rows."""
    url = _derby_url(tmp_path, "partread")
    ev = load_events(spark, sf_small).select("event_id", "user_id", "value")
    write_jdbc(ev, url, "events_copy", properties=DERBY_PROPS)
    hi = ev.agg(F.max("event_id")).first()[0]
    back = read_jdbc(
        spark,
        url,
        "events_copy",
        properties=DERBY_PROPS,
        partition_column="event_id",
        lower_bound=0,
        upper_bound=int(hi) + 1,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == ev.count()
    assert ev.exceptAll(back).count() == 0


def test_streaming_foreach_batch_jdbc(spark, sf_small, tmp_path):
    """S6: micro-batch JDBC sink driven by a real streaming query —
    every streamed row lands exactly once in the database table."""
    import os

    from data_engineering_user_session_analysis_spark.streaming.ingest_stream import read_file_stream
    from data_engineering_user_session_analysis_spark.streaming.session_stream import foreach_batch_jdbc

    url = _derby_url(tmp_path, "streamdb")
    # pre-create the table: foreachBatch appends per epoch
    seed = load_events(spark, sf_small).select("event_id", "user_id", "value").limit(0)
    write_jdbc(seed, url, "stream_events", properties=DERBY_PROPS)

    stream = read_file_stream(
        spark, os.path.join(sf_small, "events.parquet")
    ).select("event_id", "user_id", "value")
    q = foreach_batch_jdbc(
        stream,
        url=url,
        table="stream_events",
        properties=DERBY_PROPS,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    back = read_jdbc(spark, url, "stream_events", properties=DERBY_PROPS)
    expected = load_events(spark, sf_small).select("event_id", "user_id", "value")
    assert back.count() == expected.count()
    assert expected.exceptAll(back).count() == 0
