from .pipeline import (
    session_window_stats,
    stream_raw_to_staging,
    windowed_event_counts,
)

__all__ = ["stream_raw_to_staging", "windowed_event_counts", "session_window_stats"]
