"""Second-engine end-to-end tests: the PostgreSQL dialect's generated
SQL executed by DuckDB.

The reference CI proves its per-dialect SQL against four live engines
(/root/reference/.github/workflows/ci.yaml:12-44 — MySQL 5.7, Databend,
Oracle XE, Azure SQL Edge). This container has no network and ships
only the Derby JDBC driver, so the second live engine here is DuckDB:
a real SQL parser/executor that speaks the PostgreSQL surface our `pg`
dialect targets, including `pg_catalog.pg_tables` discovery. Where the
Derby e2e (tests/test_jdbc_e2e.py) proves the full Spark JDBC archive
protocol, this file proves that every *generated SQL string* of the pg
dialect — discovery, bounds probes, split predicates, time windows,
delete-after-sync — parses and returns correct values on a second
independent engine, not just on the golden-string assertions.

One statement stays golden-only: `list_databases_sql` filters on
`pg_database.datistemplate`, a column only a real PostgreSQL server
has (DuckDB's pg_database compatibility view omits it).
"""

import datetime

import duckdb
import pytest

from bend_archiver_spark.planner import (
    slim_condition,
    split_condition,
    split_condition_streaming,
    split_time_windows,
)
from bend_archiver_spark.sources.dialects import get_dialect

N_ROWS = 200
PG = get_dialect("pg")


@pytest.fixture()
def duck():
    """A fresh DuckDB seeded with the reference's NULL-pattern fixture
    (odd ids carry NULLs, cmd/main_test.go:488-509) plus sub-second
    timestamps so bound-truncation bugs can't hide."""
    con = duckdb.connect()
    con.execute(
        'CREATE TABLE "testtab" (id BIGINT PRIMARY KEY, v INTEGER, '
        "name VARCHAR, ts TIMESTAMP)"
    )
    rows = []
    for i in range(1, N_ROWS + 1):
        if i % 2 == 1:
            rows.append((i, None, None, None))
        else:
            rows.append(
                (
                    i,
                    i * 10,
                    f"name_{i}",
                    datetime.datetime(2024, 6, 30, 10, 0, i % 60, 123500),
                )
            )
    con.executemany("INSERT INTO testtab VALUES (?, ?, ?, ?)", rows)
    yield con
    con.close()


class TestPgDialectOnDuckDB:
    def test_discovery_finds_seeded_table(self, duck):
        names = [r[0] for r in duck.execute(PG.list_tables_sql("")).fetchall()]
        assert "testtab" in names

    def test_bounds_probe_values(self, duck):
        sql = PG.bounds_sql("", "testtab", "id", "")
        lo, hi, cnt = duck.execute(sql).fetchone()
        assert (lo, hi, cnt) == (1, N_ROWS, N_ROWS)

    def test_bounds_probe_with_where(self, duck):
        sql = PG.bounds_sql("", "testtab", "id", "v IS NOT NULL")
        lo, hi, cnt = duck.execute(sql).fetchone()
        assert (lo, hi, cnt) == (2, N_ROWS, N_ROWS // 2)

    def test_bounds_empty_table_sentinel(self, duck):
        """COALESCE(...,0) sentinel (source/postgres.go:116) must
        evaluate on the second engine too."""
        sql = PG.bounds_sql("", "testtab", "id", "id > 100000")
        assert duck.execute(sql).fetchone() == (0, 0, 0)

    def test_minmax_time_keeps_subsecond(self, duck):
        sql = PG.minmax_time_sql("", "testtab", "ts", "ts IS NOT NULL")
        lo, hi = duck.execute(sql).fetchone()
        assert lo.microsecond == 123500 and hi.microsecond == 123500

    def test_key_split_predicates_partition_exactly(self, duck):
        """Sequential splitter (A6): executed per-predicate counts must
        sum to the table count — coverage AND disjointness, proven by a
        second engine actually evaluating the predicate strings."""
        lo, hi, total = duck.execute(
            PG.bounds_sql("", "testtab", "id", "")
        ).fetchone()
        preds = split_condition("id", 50, lo, hi)
        assert len(preds) >= 4
        counts = [
            duck.execute(PG.count_sql("", "testtab", p)).fetchone()[0]
            for p in preds
        ]
        assert sum(counts) == total
        # only the parity quirk's final inclusive overshoot window
        # (min > max after the last stride) may be empty
        assert all(c > 0 for c in counts[:-1])

    def test_streaming_split_predicates_partition_exactly(self, duck):
        """Fan-out splitter (A7) with its stride=batch-1 quirk: the
        shared-boundary windows must still partition the id space when
        a real engine evaluates them."""
        coarse = slim_condition(4, 1, N_ROWS)
        assert len(coarse) == 4
        all_preds = []
        for lo, hi in coarse:
            all_preds.extend(
                split_condition_streaming("id", 10, lo, hi, N_ROWS)
            )
        counts = [
            duck.execute(PG.count_sql("", "testtab", p)).fetchone()[0]
            for p in all_preds
        ]
        assert sum(counts) == N_ROWS

    def test_time_window_predicates_partition_exactly(self, duck):
        """Time splitter (A8): windows over the probed [min, max] must
        cover every non-NULL-ts row exactly once, including the
        sub-second max row an exclusive upper bound would drop."""
        lo, hi = duck.execute(
            PG.minmax_time_sql("", "testtab", "ts", "ts IS NOT NULL")
        ).fetchone()
        windows = split_time_windows(
            "ts", "minute", lo.strftime("%Y-%m-%d %H:%M:%S"), hi
        )
        counts = [
            duck.execute(
                PG.count_sql("", "testtab", f"ts IS NOT NULL AND {w}")
            ).fetchone()[0]
            for w in windows
        ]
        assert sum(counts) == N_ROWS // 2

    def test_delete_after_sync_round_trip(self, duck):
        """Unbatched pg delete (A34, source/postgres.go:174-187): the
        archived-range delete leaves exactly the unarchived rows."""
        duck.execute(PG.delete_sql("", "testtab", "id <= 100"))
        left = duck.execute(PG.count_sql("", "testtab", "")).fetchone()[0]
        assert left == N_ROWS - 100
        # remaining ids are all above the archived range
        lo2, _, _ = duck.execute(
            PG.bounds_sql("", "testtab", "id", "")
        ).fetchone()
        assert lo2 == 101

    def test_quoted_identifiers_parse(self, duck):
        """Double-quote identifier quoting must round-trip through a
        second parser (mixed-case table name forces real quoting)."""
        duck.execute('CREATE TABLE "MixedCase" ("Id" BIGINT)')
        duck.execute('INSERT INTO "MixedCase" VALUES (7)')
        sql = PG.count_sql("", "MixedCase", "")
        assert duck.execute(sql).fetchone()[0] == 1

    def test_list_databases_sql_is_pg_shaped(self):
        """Golden-only: datistemplate exists on real PostgreSQL servers
        but not in DuckDB's pg_database compatibility view."""
        assert PG.list_databases_sql() == (
            "SELECT datname AS name FROM pg_database "
            "WHERE datistemplate = false"
        )
