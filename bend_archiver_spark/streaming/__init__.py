"""Structured Streaming: incremental archive, windowed aggregation,
bounded-state deduplication, stateful sessionization."""

from .archive import incremental_archive, windowed_event_counts
from .dedup import dedup_stream

__all__ = ["incremental_archive", "windowed_event_counts", "dedup_stream"]
