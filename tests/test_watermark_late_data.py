"""Watermark semantics: late rows behind the persisted watermark are
dropped; on-time rows aggregate — demonstrated across checkpointed
availableNow runs of an append-mode windowed aggregation into a file
sink (file sinks support checkpoint recovery; the memory sink does
not). The proof of the drop: a later-arriving row behind the persisted
watermark never re-emits or amends its already-final window in the
cumulative output.
"""

import shutil
from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _run(spark, src, out, ckpt):
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("start"), "n")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    rows = spark.read.parquet(out).collect()
    return sorted((r.start.hour, r.n) for r in rows)


class TestWatermarkLateData:
    def test_late_rows_behind_watermark_are_dropped(self, spark, tmp_path):
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        base = datetime(2024, 6, 1, 0, 0, 0)

        # run 1: hours 0,0,1,2,4 -> watermark finalizes at 4:10-1h =
        # 3:10; windows ending below it emit
        rows1 = [
            (i, base + timedelta(hours=h, minutes=10))
            for i, h in enumerate([0, 0, 1, 2, 4])
        ]
        spark.createDataFrame(rows1, _SCHEMA).write.parquet(src)
        assert _run(spark, src, out, ckpt) == [(0, 2), (1, 1), (2, 1)]

        # run 2: a LATE hour-0 event (behind the persisted 3:10
        # watermark) plus an on-time hour-6 event. The late row is
        # dropped — hour 0 stays (0, 2), no amendment, no duplicate —
        # and the advanced watermark (5:05) closes hour 4.
        rows2 = [
            (100, base + timedelta(minutes=30)),          # late -> dropped
            (101, base + timedelta(hours=6, minutes=5)),  # on time
        ]
        spark.createDataFrame(rows2, _SCHEMA).write.mode("append").parquet(src)
        assert _run(spark, src, out, ckpt) == [(0, 2), (1, 1), (2, 1), (4, 1)]

        # run 3: far-future event closes hour 6; hour 0 still exactly
        # one final row with the pre-late-event count
        rows3 = [(200, base + timedelta(hours=20))]
        spark.createDataFrame(rows3, _SCHEMA).write.mode("append").parquet(src)
        assert _run(spark, src, out, ckpt) == [
            (0, 2), (1, 1), (2, 1), (4, 1), (6, 1),
        ]
        shutil.rmtree(str(tmp_path), ignore_errors=True)
