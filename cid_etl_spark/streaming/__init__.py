"""Structured Streaming extensions (SURVEY §2.10, §7 M7)."""

from cid_etl_spark.streaming.events import (
    hourly_event_counts,
    read_event_stream,
    sessionized_event_counts,
    stream_dedup_events,
)

__all__ = [
    "hourly_event_counts",
    "read_event_stream",
    "sessionized_event_counts",
    "stream_dedup_events",
]
