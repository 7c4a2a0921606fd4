"""Sources & sinks (parquet lake, Kafka, CSV replay, JDBC serving)."""
