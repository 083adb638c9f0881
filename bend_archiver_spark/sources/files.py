"""File sources: CSV / NDJSON / parquet / ORC readers with explicit
schemas.

The reference lists CSV and NDJSON sources as "coming soon"
(README.md supported-sources table) — here they exist. Schemas are
explicit (no inference pass over 100 TB); NDJSON round-trips the
sink's stage-file format (sink.py write_batch fmt='ndjson'),
including explicit nulls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_source", "SUPPORTED_FORMATS"]

SUPPORTED_FORMATS = ("parquet", "orc", "csv", "ndjson", "json")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    csv_header: bool = True,
    csv_delimiter: str = ",",
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Read a file source. A schema skips inference (mandatory at
    scale: schema inference reads the data twice); without one, CSV
    falls back to header+inference for interactive use."""
    if fmt in ("parquet", "orc"):
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(path) if fmt == "parquet" else reader.orc(path)
    if fmt == "csv":
        reader = (
            spark.read.option("header", str(csv_header).lower())
            .option("sep", csv_delimiter)
            .option("timestampFormat", timestamp_format)
            .option("mode", "PERMISSIVE")
        )
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", "true")
        return reader.csv(path)
    if fmt in ("ndjson", "json"):
        from ..sink import NDJSON_TS_FMT

        reader = spark.read.option("timestampFormat", NDJSON_TS_FMT)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(path)
    raise ValueError(
        f"unsupported source format {fmt!r}; expected one of {SUPPORTED_FORMATS}"
    )
