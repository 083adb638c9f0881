"""Live-database end-to-end tests for JdbcArchiveJob.

The reference proves its archive protocol against real databases with
a NULL-pattern fixture — odd ids carry NULL int/varchar/timestamp —
and a delete-after-sync round trip (cmd/main_test.go:97-144, :488-509,
embedded Postgres in utils/testutils/postgres.go:18-48). This is the
same evidence over embedded Derby, which ships inside Spark's JVM: a
real JDBC source, real partitioned predicate reads, real deletes — no
network, no mocks.
"""

import shutil

import pytest

from bend_archiver_spark.config import Config
from bend_archiver_spark.job import JdbcArchiveJob

N_ROWS = 200


@pytest.fixture()
def derby(spark, tmp_path):
    """A fresh embedded-Derby database seeded with the NULL-pattern
    fixture: ids 1..200; odd ids have NULL V/NAME/TS (the reference's
    odd-ids-NULL fixture, cmd/main_test.go:488-509); TS carries
    sub-second precision so bound truncation bugs can't hide."""
    db_path = str(tmp_path / "derbydb")
    jvm = spark._sc._jvm  # noqa: SLF001 - raw JDBC seeding
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:derby:{db_path};create=true"
    )
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE TESTTAB (ID BIGINT NOT NULL PRIMARY KEY, "
        "V INT, NAME VARCHAR(64), TS TIMESTAMP)"
    )
    ps = conn.prepareStatement("INSERT INTO TESTTAB VALUES (?, ?, ?, ?)")
    types = jvm.java.sql.Types
    for i in range(1, N_ROWS + 1):
        ps.setLong(1, i)
        if i % 2 == 1:
            ps.setNull(2, types.INTEGER)
            ps.setNull(3, types.VARCHAR)
            ps.setNull(4, types.TIMESTAMP)
        else:
            ps.setInt(2, i * 10)
            ps.setString(3, f"name_{i}")
            ps.setTimestamp(
                4,
                jvm.java.sql.Timestamp.valueOf(
                    f"2024-06-30 10:00:{i % 60:02d}.1235"
                ),
            )
        ps.addBatch()
    ps.executeBatch()
    conn.close()
    yield db_path
    try:
        jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:{db_path};shutdown=true"
        )
    except Exception:
        pass  # Derby signals successful shutdown via SQLException


def _cfg(db_path, target, **kw):
    base = dict(
        database_type="derby",
        source_db=db_path,
        source_table="TESTTAB",
        source_split_key="ID",
        batch_size=50,
        target_path=target,
        target_format="parquet",
    )
    base.update(kw)
    return Config(**base)


class TestJdbcArchiveE2E:
    def test_key_split_null_pattern_round_trip(self, spark, derby, tmp_path):
        tgt = str(tmp_path / "tgt_key")
        report = JdbcArchiveJob(spark, _cfg(derby, tgt)).run()
        assert report.verify.is_correct
        assert report.source_rows == N_ROWS
        # batch 50 over ids 1..200 -> multiple real predicate partitions
        assert report.num_partitions >= 4

        back = spark.read.parquet(tgt)
        assert back.count() == N_ROWS
        # NULL pattern survives the wire: odd ids all-NULL, even ids populated
        assert back.filter(
            "ID % 2 = 1 AND (V IS NOT NULL OR NAME IS NOT NULL "
            "OR TS IS NOT NULL)"
        ).count() == 0
        assert back.filter(
            "ID % 2 = 0 AND (V IS NULL OR NAME IS NULL OR TS IS NULL)"
        ).count() == 0
        # values, not just nullness
        row = back.filter("ID = 42").first()
        assert row.V == 420 and row.NAME == "name_42"
        assert row.TS.microsecond == 123500  # sub-second precision kept
        shutil.rmtree(tgt, ignore_errors=True)

    def test_time_split_includes_subsecond_max_row(
        self, spark, derby, tmp_path
    ):
        """The probed max TS is ...58.1235; a truncated upper bound
        would silently drop it and fail verification (the bug the
        ceil fix closes)."""
        tgt = str(tmp_path / "tgt_time")
        cfg = _cfg(
            derby,
            tgt,
            source_split_key="",
            source_split_time_key="TS",
            source_where_condition="TS IS NOT NULL",
            time_split_unit="minute",
        )
        report = JdbcArchiveJob(spark, cfg).run()
        assert report.verify.is_correct
        assert report.source_rows == N_ROWS // 2
        back = spark.read.parquet(tgt)
        assert back.count() == N_ROWS // 2
        # the max row itself made it across
        assert back.filter("TS = timestamp'2024-06-30 10:00:58.1235'").count() > 0
        shutil.rmtree(tgt, ignore_errors=True)

    def test_delete_after_sync_empties_source(self, spark, derby, tmp_path):
        tgt = str(tmp_path / "tgt_del")
        cfg = _cfg(derby, tgt, delete_after_sync=True)
        report = JdbcArchiveJob(spark, cfg).run()
        assert report.verify.is_correct
        assert report.deleted_rows == N_ROWS
        # the source table is empty after the verified delete
        left = (
            spark.read.format("jdbc")
            .option("url", f"jdbc:derby:{derby};create=true")
            .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
            .option("query", "SELECT COUNT(*) AS cnt FROM TESTTAB")
            .load()
            .first()["CNT"]  # Derby folds unquoted aliases to uppercase
        )
        assert int(left) == 0
        shutil.rmtree(tgt, ignore_errors=True)

    def test_multi_table_discovery_and_rollup(self, spark, derby, tmp_path):
        """The reference CLI's whole multi-table loop against a LIVE
        catalog: regex discovery (A15-A17) over Derby's system tables,
        per-table archive, aggregate count rollup + verification
        (A13 + A31)."""
        from bend_archiver_spark.multi import run_multi_table
        from bend_archiver_spark.sources.dialects import get_dialect

        jvm = spark._sc._jvm  # noqa: SLF001
        conn = jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:{derby};create=true"
        )
        st = conn.createStatement()
        st.execute("CREATE TABLE SIDETAB (ID BIGINT NOT NULL, V INT)")
        for i in range(1, 81):
            st.execute(f"INSERT INTO SIDETAB VALUES ({i}, {i * 2})")
        conn.close()

        dialect = get_dialect("derby")
        url = dialect.jdbc_url("", 0, derby)
        props = {"driver": dialect.driver}

        def list_databases():
            return ["APP"]  # Derby's default schema

        def list_tables(db):
            return [
                r["NAME"]
                for r in spark.read.format("jdbc")
                .option("url", url)
                .option("driver", dialect.driver)
                .option("query", dialect.list_tables_sql(db))
                .load()
                .collect()
            ]

        cfg = _cfg(derby, "", source_table="", source_db="",
                   source_db_tables=["APP@.*TAB.*"])
        report = run_multi_table(
            spark,
            cfg,
            list_databases,
            list_tables,
            load_source=lambda db, table: spark.read.jdbc(
                url, table, properties=props
            ),
            target_path_for=lambda db, table: str(tmp_path / "multi" / table),
        )
        assert len(report.reports) == 2  # TESTTAB + SIDETAB discovered
        assert report.total_source_rows == N_ROWS + 80
        assert report.is_correct
        shutil.rmtree(str(tmp_path / "multi"), ignore_errors=True)

    def test_multi_schema_live_discovery_and_rollup(
        self, spark, derby, tmp_path
    ):
        """The closest this sandbox can get to the reference's second
        live engine (its CI runs MySQL/MSSQL/Databend containers,
        .github/workflows/ci.yaml:12-44; no second embedded JDBC jar
        ships with Spark): a second real CATALOG SHAPE inside Derby.
        Two user schemas with overlapping table names; the database
        list comes LIVE from sys.sysschemas (not hardcoded), per-
        schema table listing is schema-scoped (a leak across schemas
        would double-archive), overlapping selectors dedup, and the
        rollup verifies per-(schema, table) counts."""
        from bend_archiver_spark.catalog import expand_db_tables
        from bend_archiver_spark.multi import run_multi_table
        from bend_archiver_spark.sources.dialects import get_dialect

        jvm = spark._sc._jvm  # noqa: SLF001
        conn = jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:{derby};create=true"
        )
        st = conn.createStatement()
        # same table NAME in both schemas, different row counts — a
        # scoping bug would conflate them
        for schema, n in (("ARCHA", 30), ("ARCHB", 45)):
            st.execute(f"CREATE SCHEMA {schema}")
            st.execute(
                f"CREATE TABLE {schema}.EVENTS (ID BIGINT NOT NULL, V INT)"
            )
            for i in range(1, n + 1):
                st.execute(
                    f"INSERT INTO {schema}.EVENTS VALUES ({i}, {i})"
                )
        st.execute("CREATE TABLE ARCHA.NOTES (ID BIGINT NOT NULL)")
        st.execute("INSERT INTO ARCHA.NOTES VALUES (1)")
        conn.close()

        dialect = get_dialect("derby")
        url = dialect.jdbc_url("", 0, derby)
        props = {"driver": dialect.driver}

        def q(sql):
            return [
                r["NAME"]
                for r in spark.read.format("jdbc")
                .option("url", url)
                .option("driver", dialect.driver)
                .option("query", sql)
                .load()
                .collect()
            ]

        def list_databases():
            return q(dialect.list_databases_sql())

        def list_tables(db):
            return q(dialect.list_tables_sql(db))

        # live schema list includes both user schemas
        assert {"ARCHA", "ARCHB"} <= set(list_databases())
        # schema-scoped listing: no cross-schema leak
        assert list_tables("ARCHA") == ["EVENTS", "NOTES"] or set(
            list_tables("ARCHA")
        ) == {"EVENTS", "NOTES"}
        assert list_tables("ARCHB") == ["EVENTS"]

        # overlapping selectors (both match ARCHA.EVENTS) must dedup
        plan = expand_db_tables(
            ["ARCH.@EVENTS", "ARCHA@.*"],
            list_databases,
            list_tables,
        )
        assert plan == {
            "ARCHA": ["EVENTS", "NOTES"],
            "ARCHB": ["EVENTS"],
        }

        cfg = _cfg(derby, "", source_table="", source_db="",
                   source_db_tables=["ARCH.@EVENTS", "ARCHA@.*"])
        report = run_multi_table(
            spark,
            cfg,
            list_databases,
            list_tables,
            load_source=lambda db, table: spark.read.jdbc(
                url, f"{db}.{table}", properties=props
            ),
            target_path_for=lambda db, table: str(
                tmp_path / "mschema" / db / table
            ),
        )
        assert len(report.reports) == 3
        assert report.total_source_rows == 30 + 45 + 1
        assert report.is_correct
        # the two same-named tables landed separately with their own counts
        assert spark.read.parquet(
            str(tmp_path / "mschema" / "ARCHA" / "EVENTS")
        ).count() == 30
        assert spark.read.parquet(
            str(tmp_path / "mschema" / "ARCHB" / "EVENTS")
        ).count() == 45
        shutil.rmtree(str(tmp_path / "mschema"), ignore_errors=True)

    def test_catalog_discovery_sees_fixture_table(self, spark, derby):
        from bend_archiver_spark.sources.dialects import get_dialect

        dialect = get_dialect("derby")
        names = [
            r["NAME"]
            for r in spark.read.format("jdbc")
            .option("url", dialect.jdbc_url("", 0, derby))
            .option("driver", dialect.driver)
            .option("query", dialect.list_tables_sql(""))
            .load()
            .collect()
        ]
        assert "TESTTAB" in names


class TestV2CatalogPushdown:
    def test_bounds_aggregate_pushes_to_source(self, spark, derby, tmp_path):
        """MIN/MAX/COUNT over the DSv2 catalog must execute inside the
        source database (PushedAggregates in the scan), not by pulling
        every row into Spark — the reference computes bounds source-side
        (source/mysql.go:79-114) and a v1 jdbc read silently would
        not."""
        from bend_archiver_spark.sources.jdbc import JdbcSource

        src = JdbcSource(spark, _cfg(derby, str(tmp_path / "t")))
        cat = src.register_v2_catalog("pushcat")
        agg = spark.sql(
            f"SELECT MIN(ID) AS min_key, MAX(ID) AS max_key, "
            f"COUNT(*) AS cnt FROM {cat}.APP.TESTTAB"
        )
        plan = agg._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "PushedAggregates: [MIN(ID), MAX(ID), COUNT(*)]" in plan
        row = agg.first()
        assert (row["min_key"], row["max_key"], row["cnt"]) == (1, N_ROWS, N_ROWS)

    def test_filter_pushes_to_source(self, spark, derby, tmp_path):
        """Range predicates over the v2 catalog reach the source SQL.
        (Limit pushdown is dialect-gated and Derby's Spark dialect has
        no LIMIT clause support, so the option is set but exercised
        only by dialects that can express it — MySQL/PG/MSSQL.)"""
        from bend_archiver_spark.sources.jdbc import JdbcSource

        src = JdbcSource(spark, _cfg(derby, str(tmp_path / "t")))
        cat = src.register_v2_catalog("pushcat2")
        df = spark.sql(
            f"SELECT ID FROM {cat}.APP.TESTTAB WHERE ID > 150"
        )
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "PushedFilters" in plan and "ID > 150" in plan
        assert df.count() == N_ROWS - 150


class TestCancellationDestructiveLast:
    def test_interrupt_between_write_and_verify_never_deletes(
        self, spark, derby, tmp_path, monkeypatch
    ):
        """A cancellation that lands right after the write (simulating
        a SIGTERM whose exception could not preempt a blocking JVM
        call) must abort at the delete-after-sync boundary: target
        written, source UNTOUCHED (cmd/main.go:29-35 parity; the
        idempotency gate makes the re-run safe)."""
        from bend_archiver_spark import cancel, job as job_mod

        cancel.reset()
        real_write = job_mod.write_batch

        def write_then_cancel(*a, **kw):
            real_write(*a, **kw)
            cancel.request_cancel()

        monkeypatch.setattr(job_mod, "write_batch", write_then_cancel)
        tgt = str(tmp_path / "tgt_cancel")
        cfg = _cfg(derby, tgt, delete_after_sync=True)
        try:
            with pytest.raises(cancel.JobCancelled, match="delete-after-sync"):
                JdbcArchiveJob(spark, cfg).run()
        finally:
            cancel.reset()
        # the write completed...
        assert spark.read.parquet(tgt).count() == N_ROWS
        # ...but the destructive phase never ran: source is intact
        left = (
            spark.read.format("jdbc")
            .option("url", f"jdbc:derby:{derby};create=true")
            .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
            .option("query", "SELECT COUNT(*) AS cnt FROM TESTTAB")
            .load()
            .first()["CNT"]
        )
        assert int(left) == N_ROWS
        shutil.rmtree(tgt, ignore_errors=True)

    def test_cancelled_job_rerun_hits_idempotency_gate(
        self, spark, derby, tmp_path, monkeypatch
    ):
        """Recovery contract after a cancellation that landed post-
        write: the target holds the rows, the source still holds them
        too, and a naive re-run REFUSES via the idempotency gate
        instead of appending a second copy — the operator must
        explicitly clean the target (or skip) to proceed, exactly the
        reference's re-run semantics (A32)."""
        from bend_archiver_spark import cancel, job as job_mod

        cancel.reset()
        real_write = job_mod.write_batch

        def write_then_cancel(*a, **kw):
            real_write(*a, **kw)
            cancel.request_cancel()

        monkeypatch.setattr(job_mod, "write_batch", write_then_cancel)
        tgt = str(tmp_path / "tgt_rerun")
        cfg = _cfg(derby, tgt, delete_after_sync=True,
                   source_where_condition="ID > 0")
        with pytest.raises(cancel.JobCancelled):
            JdbcArchiveJob(spark, cfg).run()
        cancel.reset()
        monkeypatch.setattr(job_mod, "write_batch", real_write)
        # naive re-run: the gate sees the archived predicate rows
        with pytest.raises(RuntimeError, match="idempotency gate"):
            JdbcArchiveJob(spark, cfg).run()
        # no second copy was appended, source never mutated
        assert spark.read.parquet(tgt).count() == N_ROWS
        shutil.rmtree(tgt, ignore_errors=True)


class TestDecimal20JdbcE2E:
    def test_uint64_ceiling_key_split_round_trip(self, spark, tmp_path):
        """DECIMAL(20,0) split keys just under 2^64 over a LIVE Derby
        wire — the JDBC twin of the reference's NullUint64 core case
        (source/mysql.go:410-458): bounds probe returns BigDecimals,
        the planner coerces past int64, the generated range predicates
        carry 20-digit literals Derby must evaluate, and the archived
        max key round-trips bit-exact."""
        from decimal import Decimal

        db_path = str(tmp_path / "derbyu64")
        jvm = spark._sc._jvm  # noqa: SLF001 - raw JDBC seeding
        conn = jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:{db_path};create=true"
        )
        st = conn.createStatement()
        st.execute(
            "CREATE TABLE UTAB (ID DECIMAL(20,0) NOT NULL PRIMARY KEY, "
            "V INT)"
        )
        ps = conn.prepareStatement("INSERT INTO UTAB VALUES (?, ?)")
        base = 2**64 - 2
        n = 120
        for i in range(n):
            ps.setBigDecimal(1, jvm.java.math.BigDecimal(str(base - 7 * i)))
            ps.setInt(2, i)
            ps.addBatch()
        ps.executeBatch()
        conn.close()

        tgt = str(tmp_path / "tgt_u64")
        cfg = _cfg(db_path, tgt, source_table="UTAB", batch_size=100)
        report = JdbcArchiveJob(spark, cfg).run()
        assert report.verify.is_correct
        assert report.source_rows == n

        back = spark.read.parquet(tgt)
        assert back.count() == n
        assert [f.dataType.simpleString() for f in back.schema.fields if
                f.name == "ID"] == ["decimal(20,0)"]
        got_max = back.agg({"ID": "max"}).first()[0]
        assert got_max == Decimal(base)  # no int64/double truncation
        got_min = back.agg({"ID": "min"}).first()[0]
        assert got_min == Decimal(base - 7 * (n - 1))
        shutil.rmtree(tgt, ignore_errors=True)
        try:
            jvm.java.sql.DriverManager.getConnection(
                f"jdbc:derby:{db_path};shutdown=true"
            )
        except Exception:
            pass  # Derby signals successful shutdown via SQLException
