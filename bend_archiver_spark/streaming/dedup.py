"""Streaming deduplication — the continuous twin of the batch dedup
suite (operators/dedup.py).

A training-data ingest stream re-delivers records (at-least-once
sources, retried uploads, duplicated crawl fetches). This operator
drops repeats by key with bounded state: ``dropDuplicatesWithinWatermark``
keeps each key only until the watermark passes it, so state size is
(keys per watermark window), not (keys ever seen) — the property that
lets it run forever at 100 TB/day where a global ``dropDuplicates``
would accumulate unbounded state.

Batch mode falls back to exact ``dropDuplicates`` — the batch result
over the same files is the oracle for the streaming result (same
contract as streaming/archive.windowed_event_counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .timecol import ensure_event_time

__all__ = ["dedup_stream"]


def dedup_stream(
    df: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate records by ``id_cols``.

    Streaming input: duplicates arriving within ``watermark`` of the
    original (by ``time_col`` event time) are dropped with per-key
    state that the watermark garbage-collects; records older than the
    watermark are dropped as late. Batch input: plain exact dedup.
    """
    if not df.isStreaming:
        return df.dropDuplicates(list(id_cols))
    df = ensure_event_time(df, time_col)
    return df.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
