"""Structured Streaming tier (SURVEY §2.9 T1-T5)."""

from audience_finder_pro_spark.streaming.jobs import (
    EVENTS_SCHEMA,
    read_events_stream,
    run_stream_to_memory,
    tumbling_agg,
    session_agg,
    stateful_dedup,
    stream_static_join,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "run_stream_to_memory",
    "tumbling_agg",
    "session_agg",
    "stateful_dedup",
    "stream_static_join",
]
