"""CSV replay → Kafka-message shape → shared JSON decode: the batch
twin of the streaming ingest boundary (reference S2/S7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.sources.events import load_events
from data_engineering_user_session_analysis_spark.sources.replay import (
    as_kafka_messages,
    read_events_csv,
)
from data_engineering_user_session_analysis_spark.streaming.ingest_stream import decode_json_messages


def test_csv_replay_roundtrip(spark, sf_small, tmp_path):
    src = load_events(spark, sf_small)
    csv_dir = str(tmp_path / "csv")
    # Spark routes TIMESTAMP columns through `timestampFormat` and
    # TIMESTAMP_NTZ columns through `timestampNTZFormat`; fixtures have
    # shipped both flavors, so pin both to the replay wire format.
    src.write.option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").mode(
        "overwrite"
    ).csv(csv_dir)

    replayed = read_events_csv(spark, csv_dir)
    assert replayed.count() == src.count()
    assert replayed.schema["ts"].dataType.simpleString() == "timestamp"

    messages = as_kafka_messages(replayed)
    assert set(messages.columns) == {"key", "value"}
    decoded = decode_json_messages(messages)
    assert decoded.count() == src.count()
    # decode(encode(x)) == x  on every column.  Event time is tz-less
    # UTC end-to-end; align NTZ source ts with the wire TimestampType
    # (identity under the UTC session tz) before comparing.
    src_t = src.withColumn("ts", F.col("ts").cast("timestamp"))
    assert decoded.exceptAll(src_t).count() == 0
    assert src_t.exceptAll(decoded).count() == 0
