from .events_stream import (
    events_stream,
    run_stream_to_memory,
    stream_dedup_events,
    stream_session_windows,
    stream_tumbling_counts,
)

__all__ = [
    "events_stream",
    "run_stream_to_memory",
    "stream_dedup_events",
    "stream_session_windows",
    "stream_tumbling_counts",
]
