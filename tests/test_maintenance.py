"""Compaction tests."""

import pyarrow.parquet as pq
import glob

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
