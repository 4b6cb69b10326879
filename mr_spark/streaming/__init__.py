"""Structured Streaming pipelines over the events stream.

The reference has no streaming at all (SURVEY.md §2c) — this package is
north-star extension surface: windowed aggregation with watermarks (late
data), streaming deduplication, and a custom stateful operator
(gap-based sessionization via applyInPandasWithState).
"""

from .pipelines import (
    events_file_stream,
    run_to_completion,
    sessionize_stateful,
    user_profile_tws,
    stream_dedup,
    windowed_counts,
)

__all__ = [
    "events_file_stream",
    "run_to_completion",
    "sessionize_stateful",
    "user_profile_tws",
    "stream_dedup",
    "windowed_counts",
]
