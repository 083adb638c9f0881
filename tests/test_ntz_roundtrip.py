"""Temporal-fidelity regression tests for naive-timestamp parquet.

The driver's data generator has already changed timestamp physical
types once (nanos in round 1, naive micros in round 3), and the second
change silently broke seven tests and two driver queries. These tests
pin the load-layer contract directly so the next format change breaks
ONE targeted test with an obvious name:

- naive (isAdjustedToUTC=false) micro-precision parquet loads as
  TimestampType, never TIMESTAMP_NTZ (SURVEY §1.2 maps the reference's
  temporal-as-string model to TimestampType natively);
- wallclock values match the DuckDB oracle's view of the same file;
- the streaming event-time guard accepts an NTZ column even when a
  caller bypasses the load layer.
"""

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from bend_archiver_spark.streaming.timecol import ensure_event_time
from bend_archiver_spark.tables import load_parquet, load_table

_WALLCLOCKS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),
    datetime.datetime(2024, 6, 30, 23, 59, 59, 999999),
    datetime.datetime(2025, 12, 31, 12, 30, 0, 1),
]


def _write_naive_micros(path: str) -> None:
    table = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            # timestamp("us") without a timezone => isAdjustedToUTC=false,
            # the layout Spark 4.x infers as TIMESTAMP_NTZ by default
            "ts": pa.array(_WALLCLOCKS, pa.timestamp("us")),
        }
    )
    pq.write_table(table, path)


class TestNaiveMicrosParquet:
    def test_loads_as_timestamp_type(self, spark, tmp_path):
        path = str(tmp_path / "naive.parquet")
        _write_naive_micros(path)
        df = load_parquet(spark, path)
        assert dict(df.dtypes)["ts"] == "timestamp"

    def test_wallclock_matches_duckdb(self, spark, tmp_path):
        path = str(tmp_path / "naive.parquet")
        _write_naive_micros(path)
        df = load_parquet(spark, path)
        got = [
            r["s"]
            for r in df.orderBy("id")
            .select(
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s")
            )
            .collect()
        ]
        want = [
            r[0]
            for r in duckdb.sql(
                f"SELECT strftime(ts, '%Y-%m-%d %H:%M:%S.%f') "
                f"FROM '{path}' ORDER BY id"
            ).fetchall()
        ]
        assert got == want

    def test_long_cast_legal_after_load(self, spark, tmp_path):
        # the exact operation that broke sessionize_events under NTZ
        path = str(tmp_path / "naive.parquet")
        _write_naive_micros(path)
        df = load_parquet(spark, path)
        epochs = [
            r[0] for r in df.select(F.col("ts").cast("long")).collect()
        ]
        assert epochs == [
            int(w.replace(tzinfo=datetime.timezone.utc).timestamp())
            for w in _WALLCLOCKS
        ]

    def test_events_table_ts_is_timestamp(self, spark, sf_dir):
        # whatever physical type the driver generates, the engine's view
        # of events.ts must be TimestampType
        ev = load_table(spark, sf_dir, "events")
        assert dict(ev.dtypes)["ts"] == "timestamp"

    def test_watermark_guard_coerces_ntz(self, spark, tmp_path):
        # bypass the load layer entirely: force an NTZ column and check
        # the streaming guard makes it watermarkable
        path = str(tmp_path / "naive.parquet")
        _write_naive_micros(path)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        try:
            raw = spark.read.parquet(path)
            assert dict(raw.dtypes)["ts"] == "timestamp_ntz"
            fixed = ensure_event_time(raw, "ts")
            assert dict(fixed.dtypes)["ts"] == "timestamp"
            # withWatermark on a batch df validates the column type
            fixed.withWatermark("ts", "1 hour")
        finally:
            spark.conf.set(
                "spark.sql.parquet.inferTimestampNTZ.enabled", "false"
            )
