"""applyInPandasWithState sessionization: streaming result must agree
with the batch sessionizer (the oracle) on all closed sessions.

Determinism: a sentinel event far beyond the gap is appended per user,
force-closing every real session within the data itself — no reliance
on processing-time timeout timing. Sessions opened by sentinels are
filtered out of the comparison (their start lies beyond max real ts);
a timeout may or may not additionally flush them, so asserting on them
would be racy.
"""

import shutil

from pyspark.sql import functions as F

from bend_archiver_spark.queries.sessions import sessionize_events
from bend_archiver_spark.streaming.stateful import sessionize_stream
from bend_archiver_spark.tables import load_table


class TestSessionizeStream:
    def test_closed_sessions_match_batch(self, spark, sf_dir, tmp_path):
        events = load_table(spark, sf_dir, "events").filter("user_id < 40")
        max_ts = events.agg(F.max("ts")).first()[0]
        sentinel = (
            events.select("user_id")
            .distinct()
            .select(
                "user_id",
                (F.lit(max_ts) + F.expr("INTERVAL 10 DAYS")).alias("ts"),
            )
        )
        src = str(tmp_path / "sess_src")
        events.select("user_id", "ts").unionByName(sentinel).write.parquet(src)

        stream = spark.readStream.schema(
            sentinel.schema
        ).parquet(src)
        q = (
            sessionize_stream(stream, gap_min=30, timeout_ms=0)
            .writeStream.format("memory")
            .queryName("stream_sessions")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        terminated = q.awaitTermination(240)
        assert terminated, "availableNow query must terminate (NoTimeout mode)"
        streamed = {
            (
                r.user_id,
                r.session_start.strftime("%Y-%m-%d %H:%M:%S"),
                r.session_end.strftime("%Y-%m-%d %H:%M:%S"),
                r.n_events,
            )
            for r in spark.sql("SELECT * FROM stream_sessions").collect()
            if r.session_start <= max_ts  # drop sentinel-opened sessions
        }

        batch = sessionize_events(spark, sf_dir).filter("user_id < 40")
        expected = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in batch.collect()
        }
        assert streamed == expected
        assert len(streamed) > 100
        shutil.rmtree(str(tmp_path), ignore_errors=True)
