"""Sessionization and funnel analytics over the event stream.

The batch forms of the stateful-streaming patterns: gap-based
sessionization (the batch twin of ``session_window`` /
``applyInPandasWithState``), and an ordered conversion funnel. Both
are pure window-function pipelines — one shuffle on user_id, no
Python — and both have exact DuckDB oracles (lag + cumulative-sum
sessionization is the canonical SQL formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t

_GAP_MIN = 30  # session gap, minutes


@register(
    "sessionize_events",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL {_GAP_MIN} MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM ordered
    )
    SELECT user_id, session_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_event_types
    FROM tagged
    GROUP BY user_id, session_id
    """,
    headline=True,
    tags=("sessions", "window"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap): mark
    session starts with lag(), number sessions with a running sum,
    aggregate per session. One shuffle on user_id shared by both
    windows and the final groupBy — Catalyst reuses the partitioning.
    This is the batch twin of the streaming session_window; at 100 TB
    it stays a single-pass window pipeline."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Interval arithmetic, not cast-to-long: valid for both TimestampType
    # and TIMESTAMP_NTZ (NTZ→BIGINT cast is illegal in Spark 4.x).
    is_new = F.when(
        F.col("ts") - F.lag("ts").over(w)
        > F.expr(f"INTERVAL {_GAP_MIN} MINUTES"),
        1,
    ).when(F.lag("ts").over(w).isNull(), 1).otherwise(0)
    tagged = ev.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return tagged.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
    )


@register(
    "funnel_signup_to_purchase",
    oracle="""
    WITH signups AS (
      SELECT user_id, MIN(ts) AS first_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    purchases AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase_after
      FROM events e JOIN signups s
        ON e.user_id = s.user_id AND e.ts > s.first_signup
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT s.user_id,
           strftime(s.first_signup, '%Y-%m-%d %H:%M:%S') AS first_signup,
           strftime(p.first_purchase_after, '%Y-%m-%d %H:%M:%S') AS first_purchase,
           (p.user_id IS NOT NULL) AS converted,
           CAST(date_diff('second', s.first_signup, p.first_purchase_after)
                AS BIGINT) AS seconds_to_convert
    FROM signups s LEFT JOIN purchases p ON s.user_id = p.user_id
    """,
    tags=("sessions", "funnel"),
)
def funnel_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: first signup -> first purchase
    strictly after it, with time-to-convert. Two aggregations and a
    left join, all on the user_id partitioning."""
    ev = t(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(signups, "user_id")
        .filter(F.col("ts") > F.col("first_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_after"))
    )
    joined = signups.join(purchases, "user_id", "left_outer")
    return joined.select(
        "user_id",
        F.date_format("first_signup", "yyyy-MM-dd HH:mm:ss").alias(
            "first_signup"
        ),
        F.date_format("first_purchase_after", "yyyy-MM-dd HH:mm:ss").alias(
            "first_purchase"
        ),
        F.col("first_purchase_after").isNotNull().alias("converted"),
        # timestampdiff works on both TimestampType and TIMESTAMP_NTZ
        # (cast-to-long would be illegal on NTZ). date_trunc first:
        # timestampdiff truncates the ELAPSED interval, but the oracle's
        # date_diff('second', ...) counts second-boundary crossings —
        # they differ by one when the purchase's sub-second part is
        # smaller than the signup's.
        F.expr(
            "timestampdiff(SECOND, date_trunc('second', first_signup),"
            " date_trunc('second', first_purchase_after))"
        ).alias("seconds_to_convert"),
    )


@register(
    "session_window_native",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL {_GAP_MIN} MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(MAX(ts) + INTERVAL {_GAP_MIN} MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS window_end,
           COUNT(*) AS n_events
    FROM tagged
    GROUP BY user_id, sid
    """,
    tags=("sessions", "window"),
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in ``session_window`` (gap-merged event-time
    windows; window end = last event + gap). The oracle re-derives the
    same windows with the lag/cumulative-sum formulation, pinning that
    the native operator and the manual sessionizer agree — so either
    can serve the batch path, and the native one carries over to
    streaming unchanged."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{_GAP_MIN} minutes").alias("win"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.date_format("win.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "n_events",
        )
    )


@register(
    "streaming_window_counts",
    oracle="""
    SELECT strftime(to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 7200) * 7200),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 7200) * 7200 + 7200),
                    '%Y-%m-%d %H:%M:%S') AS window_end,
           event_type,
           COUNT(*) AS rows_in_window
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("sessions", "streaming", "window"),
)
def streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming module's tumbling-window aggregation
    (streaming/archive.py windowed_event_counts, hour unit -> 2h
    stride per the reference's unit map) evaluated in batch mode —
    the exact code path the watermarked stream runs, pinned against
    an epoch-arithmetic oracle. F.window buckets align to the unix
    epoch and FLOOR sub-second parts; the oracle floors explicitly
    (DuckDB's double->bigint cast rounds, which would shift boundary
    events one window)."""
    from ..streaming.archive import windowed_event_counts
    from ..tables import load_table

    ev = load_table(spark, sf_dir, "events")
    out = windowed_event_counts(ev, unit="hour")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        "rows_in_window",
    )
