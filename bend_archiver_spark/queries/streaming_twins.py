"""Batch twins of the streaming operators, registered so the driver's
correctness gate exercises the exact code paths the streams run.

``streaming/`` helpers all accept batch DataFrames and degrade to the
equivalent batch op (the module contract: the batch result over the
same files is the oracle for the streaming result — pinned in
tests/test_streaming.py). These registry entries put that contract
under the driver's hash check too: ``windowed_event_counts`` already
has one (``streaming_window_counts``); this module adds the interval
join and the bounded-state dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t

_INTERVAL_H = 2


@register(
    "events_interval_join_batch",
    oracle=f"""
    SELECT l.user_id,
           l.event_id AS signup_event,
           r.event_id AS purchase_event,
           CAST(date_diff('second',
                date_trunc('second', l.ts),
                date_trunc('second', r.ts)) AS BIGINT) AS seconds_between
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts
     AND r.ts <= l.ts + INTERVAL {_INTERVAL_H} HOUR
    WHERE l.event_type = 'signup' AND r.event_type = 'purchase'
    """,
    tags=("streaming", "join", "sessions"),
)
def events_interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming/joins.interval_join evaluated in batch mode: purchases
    within 2 hours of each signup by the same user. In a stream both
    sides carry watermarks and state is garbage-collected past the
    bound — the bounded time condition is what makes the stream
    runnable forever (state O(rows per interval), not O(stream)); in
    batch the same join expression plans as one equi-join on user_id
    with the range as a post-condition. The driver row pins that both
    modes share semantics."""
    from ..streaming.joins import interval_join

    ev = t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "signup")
    right = ev.filter(F.col("event_type") == "purchase")
    joined = interval_join(
        left, right, key="user_id", interval=f"{_INTERVAL_H} hours"
    )
    return joined.select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("signup_event"),
        F.col("r.event_id").alias("purchase_event"),
        F.expr(
            "timestampdiff(SECOND, date_trunc('second', l.ts),"
            " date_trunc('second', r.ts))"
        ).alias("seconds_between"),
    )


@register(
    "events_stream_dedup_batch",
    oracle="""
    WITH doubled AS (
      SELECT * FROM events UNION ALL SELECT * FROM events
    ),
    dedup AS (
      SELECT DISTINCT event_id FROM doubled
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_after_dedup,
           CAST((SELECT COUNT(*) FROM doubled) AS BIGINT) AS n_before,
           CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_expected
    FROM dedup
    """,
    tags=("streaming", "dedup"),
)
def events_stream_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming/dedup.dedup_stream on an at-least-once delivery
    simulation (every event delivered twice): batch mode is exact
    dropDuplicates on the key; the streaming mode is
    dropDuplicatesWithinWatermark with per-key state the watermark
    garbage-collects. The row pins the dedup invariant
    (n_after == original count) under the driver's hash check."""
    from ..streaming.dedup import dedup_stream

    ev = t(spark, sf_dir, "events")
    doubled = ev.unionAll(ev)
    deduped = dedup_stream(doubled, id_cols=("event_id",))
    return (
        deduped.agg(F.count(F.lit(1)).cast("bigint").alias("n_after_dedup"))
        .crossJoin(
            doubled.agg(F.count(F.lit(1)).cast("bigint").alias("n_before"))
        )
        .crossJoin(
            ev.agg(F.count(F.lit(1)).cast("bigint").alias("n_expected"))
        )
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
    tags=("sessions", "sequence"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: for every consecutive event pair
    per user, count transitions and distinct users — the Markov-chain
    view of user behavior that funnels/recommenders start from. One
    window on user_id (the partitioning every sessions query shares)
    followed by a map-side-combinable groupBy on the (from, to) pair —
    at 100 TB the transition matrix itself is |event_types|^2 rows,
    so the rollup collapses massively map-side."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
    )
