"""Streaming joins — the enrichment and correlation steps of a
continuous ingest pipeline.

Two shapes the batch suite already covers (broadcast dim join;
as-of/range correlation) get their streaming twins here:

- ``enrich_stream``: stream-static join. The static side is re-read
  per micro-batch (so slowly-changing dims pick up updates) and
  broadcast; no state is kept — this is the streaming analogue of the
  broadcast dimension joins pinned in tests/test_plans.py.
- ``interval_join``: stream-stream event-time join with watermarks on
  both sides and a bounded time condition. The time bound is what
  makes it runnable forever: each side's state is garbage-collected
  once the other side's watermark passes the bound, so state is
  O(rows per interval), not O(stream). An unbounded-condition
  stream-stream join would accumulate both streams in state — the
  streaming equivalent of the O(n^2) crossJoin this repo's dedup
  queries refuse to register.

Both helpers accept batch DataFrames and degrade to the equivalent
batch join (watermarks are streaming-only), so the batch result over
the same files is the oracle for the streaming result — the same
contract as streaming/archive.windowed_event_counts and
streaming/dedup.dedup_stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .timecol import ensure_event_time

__all__ = ["enrich_stream", "interval_join"]


def enrich_stream(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join on ``on``. The static side
    broadcasts; each micro-batch joins against its current snapshot.
    Stateless: nothing is retained between batches."""
    return stream.join(F.broadcast(dim), on, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "ts",
    right_time: str = "ts",
    watermark: str = "1 hour",
    interval: str = "1 hour",
    extra_cond: Column | None = None,
) -> DataFrame:
    """Inner stream-stream join: rows match when they share ``key``
    and the right row's event time falls in
    ``[left_time, left_time + interval]``.

    Streaming inputs get watermarks on both sides — required for
    state cleanup (each side holds only rows newer than the other
    side's watermark minus the interval). Batch inputs run the same
    join expression directly.
    """
    left = ensure_event_time(left, left_time)
    right = ensure_event_time(right, right_time)
    if left.isStreaming:
        left = left.withWatermark(left_time, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_time, watermark)
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {interval}"))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return left.alias("l").join(right.alias("r"), cond, "inner")
