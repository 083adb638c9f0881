"""Streaming tests: incremental archive exactly-once + windowed counts
(batch result is the oracle for the streaming result)."""

import shutil

from pyspark.sql import functions as F

from bend_archiver_spark.streaming import (
    incremental_archive,
    windowed_event_counts,
)
from bend_archiver_spark.tables import load_table


class TestIncrementalArchive:
    def test_backlog_then_incremental_exactly_once(self, spark, sf_dir, tmp_path):
        src = str(tmp_path / "src")
        tgt = str(tmp_path / "tgt")
        ckpt = str(tmp_path / "ckpt")
        events = load_table(spark, sf_dir, "events")
        schema = events.schema

        # land a first file batch
        events.filter("event_id < 500").write.mode("append").parquet(src)
        q = incremental_archive(spark, src, tgt, schema, ckpt)
        q.awaitTermination(120)
        n1 = spark.read.parquet(tgt).count()
        assert n1 == 500

        # land more files; rerun (cron-style availableNow trigger)
        events.filter("event_id >= 500").write.mode("append").parquet(src)
        q2 = incremental_archive(spark, src, tgt, schema, ckpt)
        q2.awaitTermination(120)
        n2 = spark.read.parquet(tgt).count()
        assert n2 == events.count()

        # exactly-once: rerunning with nothing new adds nothing
        q3 = incremental_archive(spark, src, tgt, schema, ckpt)
        q3.awaitTermination(120)
        assert spark.read.parquet(tgt).count() == n2
        shutil.rmtree(str(tmp_path), ignore_errors=True)

    def test_reader_options_pace_the_backlog(self, spark, sf_dir, tmp_path):
        """maxFilesPerTrigger under availableNow must drain a
        multi-file backlog as MULTIPLE bounded micro-batches with a
        commit each — the 100 TB pacing contract (one giant batch =
        one giant shuffle) — without changing the exactly-once total."""
        src = str(tmp_path / "psrc")
        tgt = str(tmp_path / "ptgt")
        ckpt = str(tmp_path / "pckpt")
        events = load_table(spark, sf_dir, "events")
        events.repartition(4).write.mode("append").parquet(src)

        batch_ids: list[int] = []

        def write_batch(df, batch_id: int) -> None:
            df.write.mode("overwrite").parquet(f"{tgt}/batch={batch_id}")
            batch_ids.append(batch_id)

        q = incremental_archive(
            spark, src, tgt, events.schema, ckpt,
            foreach_batch=write_batch,
            reader_options={"maxFilesPerTrigger": "1"},
        )
        q.awaitTermination(120)
        assert len(batch_ids) == 4, batch_ids  # one batch per file
        got = spark.read.parquet(tgt)
        assert got.count() == events.count()
        assert got.select("event_id").distinct().count() == events.count()
        shutil.rmtree(str(tmp_path), ignore_errors=True)


class TestWindowedCounts:
    def test_batch_and_streaming_agree(self, spark, sf_dir, tmp_path):
        events = load_table(spark, sf_dir, "events")
        # batch-mode result (the oracle)
        batch = {
            (r.window_start, r.window_end, r.event_type): r.rows_in_window
            for r in windowed_event_counts(events, unit="day").collect()
        }
        assert sum(batch.values()) == events.count()

        # streaming over the same rows, complete-mode into memory sink
        src = str(tmp_path / "stream_src")
        events.write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(events.schema).parquet(src)
        )
        agg = windowed_event_counts(stream, unit="day")
        q = (
            agg.writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {
            (r.window_start, r.window_end, r.event_type): r.rows_in_window
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        assert streamed == batch
        shutil.rmtree(str(tmp_path), ignore_errors=True)


class TestStreamingDedup:
    def test_duplicates_dropped_within_watermark(self, spark, sf_dir, tmp_path):
        """A stream carrying re-delivered records emits each key once;
        the batch-mode dedup over the same files is the oracle."""
        from bend_archiver_spark.streaming import dedup_stream

        src = str(tmp_path / "dsrc")
        tgt = str(tmp_path / "dtgt")
        ckpt = str(tmp_path / "dckpt")
        events = load_table(spark, sf_dir, "events").filter("event_id < 200")
        schema = events.schema
        # land the originals plus a re-delivered copy of half of them
        events.write.mode("append").parquet(src)
        events.filter("event_id % 2 = 0").write.mode("append").parquet(src)

        stream = spark.readStream.schema(schema).parquet(src)
        deduped = dedup_stream(stream, ("event_id",), "ts", "1 hour")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", tgt)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = spark.read.parquet(tgt)
        oracle = dedup_stream(spark.read.parquet(src), ("event_id",))
        assert got.count() == oracle.count() == events.count()
        assert got.select("event_id").distinct().count() == got.count()
        shutil.rmtree(str(tmp_path), ignore_errors=True)


class TestStreamingJoins:
    def test_stream_static_enrichment_matches_batch(self, spark, sf_dir, tmp_path):
        """Enriching a stream with a static dim broadcast-joins each
        micro-batch; the batch join over the same files is the oracle."""
        from bend_archiver_spark.streaming import enrich_stream

        events = load_table(spark, sf_dir, "events")
        dim = events.select("user_id").distinct().withColumn(
            "user_bucket", (events.user_id % 10).cast("int")
        )
        batch = enrich_stream(events, dim, "user_id")
        src = str(tmp_path / "esrc")
        events.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            enrich_stream(stream, dim, "user_id")
            .writeStream.format("memory")
            .queryName("enriched")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM enriched")
        assert got.count() == batch.count() == events.count()
        assert (
            got.filter("user_bucket IS NULL").count()
            == batch.filter("user_bucket IS NULL").count()
            == 0
        )
        shutil.rmtree(str(tmp_path), ignore_errors=True)

    def test_stream_stream_interval_join_matches_batch(self, spark, sf_dir, tmp_path):
        """views joined to same-user purchases within 1 hour: the
        stream-stream interval join emits exactly the batch join's
        row set (inner joins emit eagerly; watermarks only bound
        state)."""
        from bend_archiver_spark.streaming import interval_join

        events = load_table(spark, sf_dir, "events")
        views = events.filter("event_type = 'view'").select(
            "user_id", "ts", F.col("event_id").alias("view_id")
        )
        buys = events.filter("event_type = 'purchase'").select(
            "user_id", "ts", F.col("event_id").alias("buy_id")
        )
        batch = interval_join(views, buys, "user_id").select(
            "l.view_id", "r.buy_id"
        )
        n_batch = batch.count()
        assert n_batch > 0  # the fixture must actually exercise the join

        vsrc, bsrc = str(tmp_path / "v"), str(tmp_path / "b")
        views.write.mode("overwrite").parquet(vsrc)
        buys.write.mode("overwrite").parquet(bsrc)
        vs = spark.readStream.schema(views.schema).parquet(vsrc)
        bs = spark.readStream.schema(buys.schema).parquet(bsrc)
        q = (
            interval_join(vs, bs, "user_id")
            .select("l.view_id", "r.buy_id")
            .writeStream.format("memory")
            .queryName("vb_joined")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM vb_joined")
        assert got.count() == n_batch
        assert (
            got.exceptAll(batch).count() == 0
            and batch.exceptAll(got).count() == 0
        )
        shutil.rmtree(str(tmp_path), ignore_errors=True)


class TestFailureInjection:
    def test_failing_once_foreachbatch_stays_exactly_once(
        self, spark, sf_dir, tmp_path
    ):
        """A foreachBatch writer that dies MID-BATCH — after its write,
        before the checkpoint commit (the worst crash point: the
        batch's effects are already on disk). The restart must replay
        the SAME batch id, and an idempotent-per-batch_id writer
        (overwrite into the batch's own directory) must leave sink
        counts exactly-once. This is the failure-injection twin of
        test_backlog_then_incremental_exactly_once, which only ever
        restarts between clean batches."""
        import pytest
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        src = str(tmp_path / "fsrc")
        tgt = str(tmp_path / "ftgt")
        ckpt = str(tmp_path / "fckpt")
        events = load_table(spark, sf_dir, "events").filter("event_id < 300")
        n_src = events.count()
        schema = events.schema
        events.write.mode("append").parquet(src)

        seen: list[int] = []  # every (re)invocation's batch_id, in order

        def write_batch(df, batch_id: int) -> None:
            # idempotent per batch_id: each batch owns a directory and
            # OVERWRITES it, so a replay rewrites identical content
            # instead of appending a duplicate
            df.write.mode("overwrite").parquet(f"{tgt}/batch={batch_id}")
            first_invocation = not seen
            seen.append(batch_id)
            if first_invocation:
                raise RuntimeError("injected mid-batch failure")

        q = incremental_archive(
            spark, src, tgt, schema, ckpt, foreach_batch=write_batch
        )
        with pytest.raises(StreamingQueryException, match="injected"):
            q.awaitTermination(120)

        # restart with the same checkpoint: Spark replays the batch id
        # whose commit never landed
        q2 = incremental_archive(
            spark, src, tgt, schema, ckpt, foreach_batch=write_batch
        )
        q2.awaitTermination(120)

        assert len(seen) >= 2 and seen[1] == seen[0], seen
        got = spark.read.parquet(tgt)
        assert got.count() == n_src
        assert got.select("event_id").distinct().count() == n_src
        shutil.rmtree(str(tmp_path), ignore_errors=True)

    def test_failing_once_blind_append_duplicates(
        self, spark, sf_dir, tmp_path
    ):
        """Regression fence around incremental_archive's documented
        at-least-once caveat for NON-idempotent foreachBatch writers:
        a blind append that dies after writing IS duplicated by the
        replay. If this ever stops duplicating, the engine's replay
        contract changed and the docstring (and the idempotent-writer
        requirement above) must be revisited."""
        import pytest
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        src = str(tmp_path / "bsrc")
        tgt = str(tmp_path / "btgt")
        ckpt = str(tmp_path / "bckpt")
        events = load_table(spark, sf_dir, "events").filter("event_id < 100")
        n_src = events.count()
        schema = events.schema
        events.write.mode("append").parquet(src)

        failed: list[int] = []

        def blind_append(df, batch_id: int) -> None:
            df.write.mode("append").parquet(tgt)
            if not failed:
                failed.append(batch_id)
                raise RuntimeError("injected mid-batch failure")

        q = incremental_archive(
            spark, src, tgt, schema, ckpt, foreach_batch=blind_append
        )
        with pytest.raises(StreamingQueryException, match="injected"):
            q.awaitTermination(120)
        q2 = incremental_archive(
            spark, src, tgt, schema, ckpt, foreach_batch=blind_append
        )
        q2.awaitTermination(120)
        # the replayed batch appended a second copy of every row
        assert spark.read.parquet(tgt).count() == 2 * n_src
        shutil.rmtree(str(tmp_path), ignore_errors=True)
