"""CSV replay → Kafka-message shape → shared JSON decode: the batch
twin of the streaming ingest boundary (reference S2/S7)."""

from __future__ import annotations

from data_engineering_user_session_analysis_spark.sources.events import load_events
from data_engineering_user_session_analysis_spark.sources.replay import (
    as_kafka_messages,
    read_events_csv,
)
from data_engineering_user_session_analysis_spark.streaming.ingest_stream import decode_json_messages


def test_csv_replay_roundtrip(spark, sf_small, tmp_path):
    src = load_events(spark, sf_small)
    csv_dir = str(tmp_path / "csv")
    src.write.option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).mode("overwrite").csv(csv_dir)

    replayed = read_events_csv(spark, csv_dir)
    assert replayed.count() == src.count()
    assert replayed.schema["ts"].dataType.simpleString() == "timestamp"

    messages = as_kafka_messages(replayed)
    assert set(messages.columns) == {"key", "value"}
    decoded = decode_json_messages(messages)
    assert decoded.count() == src.count()
    # decode(encode(x)) == x  on every column
    assert decoded.exceptAll(src).count() == 0
    assert src.exceptAll(decoded).count() == 0
