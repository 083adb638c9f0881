"""Partitioned JDBC source — the Spark-native form of the reference's
extraction engine (A1-A4, A20-A24).

Where the Go engine hand-rolls goroutine pools consuming predicate
strings from a channel (worker/worker.go:86-136), Spark's JDBC reader
takes the same predicate list and makes each predicate one partition =
one task; the scheduler is the worker pool. Pagination (the MSSQL
OFFSET/FETCH loop, source/sql_server.go:284-313) is replaced by
``fetchsize``; the time-split single-thread restriction
(worker/worker.go:139-143) disappears because window predicates are
independent snapshots, not LIMIT/OFFSET pages.

No live database exists in this environment; the SQL/URL/option
generation is unit-tested and the DataFrame plumbing is exercised via
the file-source path which shares the planner.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..config import Config
from ..planner import (
    coerce_key,
    parse_time_dynamic,
    plan_jdbc_partitions,
    split_time_windows,
)
from .dialects import Dialect, get_dialect

__all__ = ["JdbcSource", "JdbcReadPlan"]


def _floor_bound(v: object) -> str:
    """Lower split bound at whole-second precision (truncation only
    widens the window downward — safe)."""
    return str(v)[:19].replace("T", " ")


def _ceil_bound(v: object) -> str:
    """Upper split bound: whole seconds, rounded UP when the probed
    max has sub-second precision. Plain truncation would make the
    final inclusive window ``key <= max-truncated-to-seconds`` and
    silently exclude rows past it — including the max row itself."""
    from datetime import timedelta

    s = str(v).replace("T", " ")
    head, dot, frac = s.partition(".")
    if dot and any(c != "0" for c in frac):
        t = parse_time_dynamic(head[:19] if len(head) >= 19 else head)
        return (t + timedelta(seconds=1)).strftime("%Y-%m-%d %H:%M:%S")
    return head[:19]


@dataclass
class JdbcReadPlan:
    url: str
    table: str
    predicates: list[str]
    options: dict[str, str] = field(default_factory=dict)


class JdbcSource:
    """One (database, table) extraction source."""

    def __init__(self, spark: SparkSession, cfg: Config):
        self.spark = spark
        self.cfg = cfg
        self.dialect: Dialect = get_dialect(cfg.database_type)

    # --- low-level helpers -------------------------------------------
    def _url(self, database: str | None = None) -> str:
        return self.dialect.jdbc_url(
            self.cfg.source_host,
            self.cfg.source_port,
            database if database is not None else self.cfg.source_db,
            self.cfg.ssl_mode,
            self.cfg.oracle_sid,
        )

    def _base_options(self) -> dict[str, str]:
        return {
            "user": self.cfg.source_user,
            "password": self.cfg.source_pass,
            "driver": self.dialect.driver,
            # bounds per-fetch memory like the reference's 10k-row
            # MSSQL pages (source/sql_server.go:284)
            "fetchsize": "10000",
            # per-query timeout analog of the 60s page timeout
            # (source/sql_server.go:314)
            "queryTimeout": "60",
        }

    def _query_df(self, sql: str, database: str | None = None) -> DataFrame:
        reader = (
            self.spark.read.format("jdbc")
            .option("url", self._url(database))
            .option("query", sql)
        )
        for k, v in self._base_options().items():
            reader = reader.option(k, v)
        df = reader.load()
        # Oracle/Derby fold unquoted aliases to UPPERCASE; normalize so
        # probe rows are addressable by the alias we wrote (min_key...)
        return df.toDF(*[c.lower() for c in df.columns])

    # --- DSv2 catalog (aggregate/limit pushdown) ---------------------
    def register_v2_catalog(self, catalog_name: str = "srcdb") -> str:
        """Expose this source as a Spark DSv2 JDBC catalog with
        aggregate and limit pushdown enabled, and return the catalog
        name. ``SELECT MIN(k), MAX(k), COUNT(*) FROM <cat>.<schema>.
        <table>`` then executes source-side (the plan shows
        ``PushedAggregates``), matching the reference's source-side
        bounds aggregation (source/mysql.go:79-114) through Catalyst
        instead of hand-written SQL. The raw-SQL probes above remain
        the driver-parity path (COALESCE sentinels, dialect CONVERT);
        this is the idiomatic route for ad-hoc DataFrame work against
        the source, where v1 ``spark.read.jdbc`` would pull every row
        of an aggregated column. Verified against embedded Derby in
        tests/test_jdbc_e2e.py."""
        conf = self.spark.conf
        prefix = f"spark.sql.catalog.{catalog_name}"
        conf.set(
            prefix,
            "org.apache.spark.sql.execution.datasources.v2.jdbc."
            "JDBCTableCatalog",
        )
        conf.set(f"{prefix}.url", self._url())
        conf.set(f"{prefix}.driver", self.dialect.driver)
        conf.set(f"{prefix}.pushDownAggregate", "true")
        conf.set(f"{prefix}.pushDownLimit", "true")
        if self.cfg.source_user:
            conf.set(f"{prefix}.user", self.cfg.source_user)
        if self.cfg.source_pass:
            conf.set(f"{prefix}.password", self.cfg.source_pass)
        return catalog_name

    # --- probes (A10-A12, A18) ---------------------------------------
    def probe_bounds(self) -> tuple[int, int, int]:
        """min/max/count in ONE round trip (the reference runs three:
        GetMinMaxSplitKey + GetSourceReadRowsCount)."""
        sql = self.dialect.bounds_sql(
            self.cfg.source_db,
            self.cfg.source_table,
            self.cfg.source_split_key,
            self.cfg.source_where_condition,
        )
        row = self._query_df(sql).first()
        return (
            coerce_key(row["min_key"]),
            coerce_key(row["max_key"]),
            int(row["cnt"]),
        )

    def probe_time_bounds(self) -> tuple[str | None, str | None]:
        sql = self.dialect.minmax_time_sql(
            self.cfg.source_db,
            self.cfg.source_table,
            self.cfg.source_split_time_key,
            self.cfg.source_where_condition,
        )
        row = self._query_df(sql).first()
        return row["min_time"], row["max_time"]

    def count(self) -> int:
        sql = self.dialect.count_sql(
            self.cfg.source_db,
            self.cfg.source_table,
            self.cfg.source_where_condition,
        )
        return int(self._query_df(sql).first()["cnt"])

    # --- partitioned reads (A1-A9, A20-A24) --------------------------
    def plan_key_split(self) -> JdbcReadPlan:
        mn, mx, cnt = self.probe_bounds()
        plan = plan_jdbc_partitions(
            self.cfg.source_split_key,
            mn,
            mx,
            cnt,
            batch_size=self.cfg.batch_size,
            where_condition=self.cfg.source_where_condition,
        )
        return JdbcReadPlan(
            url=self._url(),
            table=self.dialect.table_ref(
                self.cfg.source_db, self.cfg.source_table
            ),
            predicates=plan.predicates,
            options=self._base_options(),
        )

    def plan_time_split(self) -> JdbcReadPlan:
        lo, hi = self.probe_time_bounds()
        predicates: list[str] = []
        if lo is not None and hi is not None:
            windows = split_time_windows(
                self.cfg.source_split_time_key,
                self.cfg.time_split_unit,
                _floor_bound(lo),
                _ceil_bound(hi),
            )
            where = self.cfg.source_where_condition
            predicates = (
                [f"{w} and ({where})" for w in windows] if where else windows
            )
        return JdbcReadPlan(
            url=self._url(),
            table=self.dialect.table_ref(
                self.cfg.source_db, self.cfg.source_table
            ),
            predicates=predicates,
            options=self._base_options(),
        )

    def read(self, plan: JdbcReadPlan | None = None) -> DataFrame:
        """Partitioned read: one Spark partition per predicate. Filters
        and column pruning push down into the generated per-partition
        SQL (Catalyst JDBC pushdown)."""
        if plan is None:
            plan = (
                self.plan_time_split()
                if self.cfg.source_split_time_key
                else self.plan_key_split()
            )
        if not plan.predicates:
            # empty-table sentinel (worker/worker.go:92-95): empty frame
            # with the source schema via an always-false predicate
            plan = JdbcReadPlan(
                plan.url, plan.table, ["1 = 0"], plan.options
            )
        return self.spark.read.jdbc(
            url=plan.url,
            table=plan.table,
            predicates=plan.predicates,
            properties=plan.options,
        )
