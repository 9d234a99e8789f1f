"""Structured Streaming surface (SURVEY.md §2.8): watermark dedup,
windowed aggregations, Kafka-shaped sinks, foreachBatch upserts."""
