"""Structured Streaming: incremental archive + windowed aggregation."""

from .archive import incremental_archive, windowed_event_counts

__all__ = ["incremental_archive", "windowed_event_counts"]
