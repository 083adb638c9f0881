"""Multi-table orchestration — fixture F2 semantics: regex
`db.*@test_table.*` matches exactly db1.test_table1 + db2.test_table2,
the archive total equals the sum of both tables, and non-matching
tables are excluded (cmd/main_test.go:25-59)."""

import shutil

from bend_archiver_spark.config import Config
from bend_archiver_spark.multi import run_multi_table
from bend_archiver_spark.tables import load_table


class TestMultiTable:
    def test_f2_regex_expansion_archives_15_rows(self, spark, sf_dir, tmp_path):
        li = load_table(spark, sf_dir, "lineitem")
        fixtures = {
            ("db1", "test_table1"): li.filter("l_orderkey < 3"),
            ("db2", "test_table2"): li.filter(
                "l_orderkey >= 3 AND l_orderkey < 5"
            ),
            ("other", "ignored"): li.limit(3),
        }
        counts = {k: df.count() for k, df in fixtures.items()}
        expected = (
            counts[("db1", "test_table1")] + counts[("db2", "test_table2")]
        )
        assert expected > 0

        cfg = Config(
            source_db_tables=["db.*@test_table.*"],
            source_split_key="l_orderkey",
            source_where_condition="l_orderkey >= 0",
            batch_size=100,
            target_format="parquet",
        )
        report = run_multi_table(
            spark,
            cfg,
            list_databases=lambda: ["db1", "db2", "other"],
            list_tables=lambda db: {
                "db1": ["test_table1", "junk"],
                "db2": ["test_table2"],
                "other": ["ignored"],
            }[db],
            load_source=lambda db, t: fixtures[(db, t)],
            target_path_for=lambda db, t: str(tmp_path / db / t),
        )
        assert len(report.reports) == 2  # 'other' not matched
        # F2 semantics: sum of the two matched tables, nothing else
        assert report.total_source_rows == expected
        assert report.total_target_rows == expected
        assert report.is_correct
        shutil.rmtree(str(tmp_path), ignore_errors=True)

    def test_explicit_table_merged(self, spark, sf_dir, tmp_path):
        li = load_table(spark, sf_dir, "lineitem").limit(7)
        cfg = Config(
            source_db="dbx",
            source_table="solo",
            source_split_key="l_orderkey",
            source_where_condition="l_orderkey >= 0",
            batch_size=100,
        )
        report = run_multi_table(
            spark,
            cfg,
            list_databases=lambda: [],
            list_tables=lambda db: [],
            load_source=lambda db, t: li,
            target_path_for=lambda db, t: str(tmp_path / db / t),
        )
        assert len(report.reports) == 1
        assert report.total_source_rows == 7
        assert report.is_correct
