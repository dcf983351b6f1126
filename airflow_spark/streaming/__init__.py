"""Structured-Streaming monitors — the streaming form of the
reference's cron-polling checks (SURVEY.md §2.11)."""

from .monitors import (  # noqa: F401
    dedupe_events,
    drift_monitor,
    ewma_monitor,
    freshness_monitor,
    last_seen_monitor,
    last_seen_monitor_eventtime,
    session_window_counts,
    sliding_window_counts,
    threshold_monitor,
    tumbling_window_counts,
)
