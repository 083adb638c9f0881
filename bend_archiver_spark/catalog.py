"""Regex catalog discovery — multi-table plan expansion (A15-A17).

``sourceDbTables`` entries have the form ``"dbRegex@tableRegex"``
('@' separates the two because '.' is regex-special —
source/mysql.go:388). Expansion: list databases, regex-filter, list
tables per database, regex-filter, merge with any explicit
``sourceDB``/``sourceTable`` (source/mysql.go:404-406), dedup
(source/sql_server.go:568-583).

The listing queries come from the dialect layer and run over JDBC; the
regex matching is driver-side Python ``re`` — same split of labor as
the reference (SQL catalog scan + host-language regex).
"""

from __future__ import annotations

import re
from collections.abc import Callable

__all__ = ["expand_db_tables", "match_names", "parse_selector"]


def parse_selector(selector: str) -> tuple[str, str]:
    """Split 'dbRegex@tableRegex'."""
    if "@" not in selector:
        raise ValueError(
            f"invalid sourceDbTables entry {selector!r}: expected 'dbRegex@tableRegex'"
        )
    db_re, table_re = selector.split("@", 1)
    return db_re, table_re


def match_names(pattern: str, names: list[str]) -> list[str]:
    """Regex-filter (unanchored search, as Go's regexp.MatchString —
    pinned by TestMatchDatabase, source/source_test.go:176-189)."""
    rx = re.compile(pattern)
    return [n for n in names if rx.search(n)]


def expand_db_tables(
    selectors: list[str],
    list_databases: Callable[[], list[str]],
    list_tables: Callable[[str], list[str]],
    explicit_db: str = "",
    explicit_table: str = "",
) -> dict[str, list[str]]:
    """Expand selectors to {database: [tables]}. ``list_databases`` /
    ``list_tables`` are injected (JDBC-backed in production, fixtures
    in tests)."""
    out: dict[str, list[str]] = {}
    if selectors:
        all_dbs = list_databases()
        for selector in selectors:
            db_re, table_re = parse_selector(selector)
            for db in match_names(db_re, all_dbs):
                tables = match_names(table_re, list_tables(db))
                if tables:
                    existing = out.setdefault(db, [])
                    for tbl in tables:
                        if tbl not in existing:  # dedup, sql_server.go:568-583
                            existing.append(tbl)
    if explicit_db and explicit_table:
        existing = out.setdefault(explicit_db, [])
        if explicit_table not in existing:
            existing.append(explicit_table)
    return out
