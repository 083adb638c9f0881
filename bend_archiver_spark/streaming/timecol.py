"""Event-time column guard.

``withWatermark`` requires TimestampType; Spark 4.x rejects
TIMESTAMP_NTZ event time with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE.
Streaming readers take schemas from arbitrary user files (a naive
micro-precision parquet infers NTZ under default confs), so every
watermark site coerces the event-time column first. The cast is
wallclock-preserving in the engine's UTC session — the same instants
the DuckDB oracle sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ensure_event_time"]


def ensure_event_time(df: DataFrame, time_col: str) -> DataFrame:
    """Cast ``time_col`` to TimestampType if it arrived as
    TIMESTAMP_NTZ; no-op otherwise."""
    field = next((f for f in df.schema.fields if f.name == time_col), None)
    if field is not None and field.dataType.typeName() == "timestamp_ntz":
        return df.withColumn(time_col, F.col(time_col).cast("timestamp"))
    return df
