"""Structured Streaming surface: Kafka-shaped ingest → enrich →
partitioned lake sink, and the stateful session-window aggregation
the reference's committed checkpoint evidences (SURVEY.md §2.9)."""
