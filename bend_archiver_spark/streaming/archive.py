"""Incremental (streaming) archive — the streaming upgrade of the
reference's time-split mode (A22-A24).

The reference archives a time range once, sequentially, with
LIMIT/OFFSET pages (worker/worker.go:176-228). Structured Streaming
turns the same job into a continuous pipeline: new files/rows arrive,
tumbling windows close under a watermark, and ``foreachBatch`` writes
each micro-batch through the same sink + verification code the batch
path uses. State, late-data handling, and exactly-once file sinks come
from the engine instead of hand-rolled pagination.

Scale notes: the watermark bounds state; windows = the reference's
time-split stride (config/config.go:147-160). For an RDBMS source the
micro-batch boundary is a monotonically increasing key/time column —
each trigger archives ``(last_ckpt, now]``, which is exactly A22's
paged loop without the concurrent-LIMIT/OFFSET hazard.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import TIME_SPLIT_STRIDES
from .timecol import ensure_event_time

__all__ = ["incremental_archive", "windowed_event_counts"]


def windowed_event_counts(
    events: DataFrame,
    time_col: str = "ts",
    unit: str = "hour",
    watermark: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts with a watermark for late data — works on
    both a static and a streaming DataFrame (same code path; the
    batch-mode result is the oracle for the streaming one).

    The window stride reuses the batch planner's unit map
    (minute->10m, quarter->15m, hour->2h, day->24h), so a streaming
    job and a reference-config batch job cut identical windows.
    """
    stride = TIME_SPLIT_STRIDES[unit]
    window_spec = F.window(F.col(time_col), f"{int(stride.total_seconds())} seconds")
    df = ensure_event_time(events, time_col)
    if events.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return (
        df.groupBy(window_spec.alias("win"), *group_cols)
        .agg(F.count(F.lit(1)).alias("rows_in_window"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "rows_in_window",
        )
    )


def incremental_archive(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    schema,
    checkpoint_path: str,
    source_format: str = "parquet",
    target_format: str = "parquet",
    transform: Callable[[DataFrame], DataFrame] | None = None,
    trigger_once: bool = True,
    foreach_batch: Callable[[DataFrame, int], None] | None = None,
    reader_options: dict[str, str] | None = None,
) -> StreamingQuery:
    """Continuously archive files landing under ``source_path`` into
    ``target_path``. ``trigger_once`` processes the backlog and stops —
    the cron-style incremental archive; set False for an always-on
    stream.

    Exactly-once: the default path writes through the **native file
    sink**, whose ``_spark_metadata`` transaction log commits each
    batch's files atomically with the checkpoint — a crash between
    write and checkpoint commit replays the batch id and the sink
    log deduplicates it (the streaming analog of the reference's
    idempotency gate, cmd/main.go:74-82).

    ``foreach_batch`` opts into a custom per-batch writer (e.g. to
    reuse the batch sink/verify code). That path is **at-least-once**
    unless the callable is idempotent per ``batch_id`` — a restart
    after a batch write but before the checkpoint commit re-runs the
    same batch id; blind appends would duplicate it.

    ``reader_options`` pass through to the source (e.g.
    ``maxFilesPerTrigger`` / ``maxBytesPerTrigger``, which
    ``availableNow`` honors) — the pacing knob that keeps one backlog
    drain from forming a single giant micro-batch at 100 TB: each
    batch's state and shuffle must fit the cluster, so the backlog is
    consumed as bounded increments with a commit per batch.
    """
    reader_builder = spark.readStream.format(source_format).schema(schema)
    for k, v in (reader_options or {}).items():
        reader_builder = reader_builder.option(k, v)
    reader = reader_builder.load(source_path)
    if transform is not None:
        reader = transform(reader)

    if foreach_batch is not None:
        writer = (
            reader.writeStream.foreachBatch(foreach_batch)
            .option("checkpointLocation", checkpoint_path)
        )
    else:
        writer = (
            reader.writeStream.format(target_format)
            .option("path", target_path)
            .option("checkpointLocation", checkpoint_path)
        )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
