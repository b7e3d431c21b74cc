"""Structured Streaming operators (SURVEY.md §2.G).

Streaming twins of the batch event-series operators: watermarked
tumbling/sliding window aggregation, streaming dedup, and a custom
stateful sessionizer. All are plan builders — they take a (streaming)
DataFrame and return a transformed streaming DataFrame, so the same
code path works against file, Kafka, rate, or memory sources.
"""

from pypers_spark.streaming.core import (
    sessionize_stateful,
    stream_events,
    streaming_dedup,
    streaming_interval_join,
    streaming_sliding_counts,
    streaming_tumbling_counts,
)

__all__ = [
    "stream_events",
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_dedup",
    "streaming_interval_join",
    "sessionize_stateful",
]
