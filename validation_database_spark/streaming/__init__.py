from .validation import (
    stream_events,
    streaming_window_counts,
    streaming_sessionize,
    streaming_missing_ids,
    streaming_user_totals,
    streaming_ewma,
    run_to_completion,
)

__all__ = [
    "stream_events",
    "streaming_window_counts",
    "streaming_sessionize",
    "streaming_missing_ids",
    "streaming_user_totals",
    "streaming_ewma",
    "run_to_completion",
]
