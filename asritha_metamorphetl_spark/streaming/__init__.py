"""Structured Streaming surface (green-field — the reference is batch-only,
SURVEY.md §2.12; its only temporal notion is the daily DAY_DT snapshot)."""

from asritha_metamorphetl_spark.streaming.windows import (
    hourly_event_counts,
    sessionized_stream,
    sliding_event_stats,
    snapshot_stream,
    stream_static_enrich,
    streaming_dedup,
)

__all__ = [
    "hourly_event_counts",
    "sessionized_stream",
    "sliding_event_stats",
    "snapshot_stream",
    "stream_static_enrich",
    "streaming_dedup",
]
