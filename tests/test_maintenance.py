"""Compaction tests."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bend_archiver_spark.maintenance import compact_files, dir_stats
from bend_archiver_spark.tables import load_table
from bend_archiver_spark.verify import content_fingerprint


class TestCompaction:
    def test_many_small_files_become_few(self, spark, sf_dir, tmp_path):
        tgt = str(tmp_path / "frag")
        ev = load_table(spark, sf_dir, "events")
        # fragment: 50 tiny appends, like 50 streaming micro-batches
        ev.repartition(50).write.mode("append").parquet(tgt)
        before_files, before_bytes = dir_stats(tgt)
        assert before_files >= 50
        fp_before = content_fingerprint(spark.read.parquet(tgt))

        res = compact_files(spark, tgt, target_file_bytes=before_bytes)
        assert res.files_after < before_files
        assert res.files_after <= 2
        assert res.rows == ev.count()
        after = spark.read.parquet(tgt)
        assert after.count() == res.rows
        assert content_fingerprint(after) == fp_before

    def test_key_clustered_compaction_preserves_pruning(
        self, spark, sf_dir, tmp_path
    ):
        tgt = str(tmp_path / "fragk")
        li = load_table(spark, sf_dir, "lineitem")
        li.repartition(40).write.mode("append").parquet(tgt)
        _, nbytes = dir_stats(tgt)
        compact_files(
            spark, tgt, target_file_bytes=max(1, nbytes // 4), key="l_orderkey"
        )
        ranges = []
        for f in glob.glob(tgt + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(0).statistics
                ranges.append((st.min, st.max))
        ranges.sort()
        assert len(ranges) >= 2
        assert all(a[1] <= b[0] for a, b in zip(ranges, ranges[1:]))


class TestZorder:
    def test_zorder_write_localizes_both_keys(self, spark, sf_dir, tmp_path):
        """Z-order layout: every output file gets a tight min/max
        envelope on BOTH interleaved keys (a plain sort only localizes
        its leading column — the trailing key's per-file span stays
        ~global). Envelopes are what parquet row-group stats prune on."""
        from bend_archiver_spark.maintenance import zorder_write

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity"
        )
        n_files = 16
        tgt = str(tmp_path / "zsorted")
        zorder_write(li, tgt, "l_orderkey", "l_partkey", n_files)

        files = sorted(glob.glob(tgt + "/part-*.parquet"))
        assert len(files) == n_files
        glb = li.groupBy().agg(
            *[f(c) for c in ("l_orderkey", "l_partkey") for f in (F.min, F.max)]
        ).collect()[0]
        ok_span = glb[1] - glb[0]
        pk_span = glb[3] - glb[2]

        total_rows = 0
        ok_spans, pk_spans = [], []
        for path in files:
            meta = pq.read_metadata(path)
            total_rows += meta.num_rows
            t = pq.read_table(path, columns=["l_orderkey", "l_partkey"])
            ok = t.column("l_orderkey").to_pylist()
            pk = t.column("l_partkey").to_pylist()
            ok_spans.append(max(ok) - min(ok))
            pk_spans.append(max(pk) - min(pk))
        assert total_rows == li.count()
        # both dimensions localized: mean per-file span well under the
        # global span (plain sort would leave one of them ~100%)
        assert sum(ok_spans) / len(ok_spans) < 0.6 * ok_span
        assert sum(pk_spans) / len(pk_spans) < 0.6 * pk_span

    def test_morton_query_matches_layout_expr(self, spark, sf_dir):
        """The registered zorder_bucket_stats query and the write-path
        zorder_value agree (same bit interleave)."""
        from bend_archiver_spark.maintenance import zorder_value
        from bend_archiver_spark.queries import REGISTRY

        li = load_table(spark, sf_dir, "lineitem")
        direct = (
            li.select(
                zorder_value(F.col("l_orderkey"), F.col("l_partkey")).alias(
                    "z"
                )
            )
            .agg(F.sum("z"))
            .collect()[0][0]
        )
        assert direct > 0
        buckets = REGISTRY["zorder_bucket_stats"].spark(spark, sf_dir)
        assert buckets.agg(F.sum("n_rows")).collect()[0][0] == li.count()
