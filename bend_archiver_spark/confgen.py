"""Config generator — parity with tools/confgenerotor
(conf_generate.go:39-108): builds a job config that archives the last
day/week/month of a time-partitioned table, setting
``sourceWhereCondition = "<key> >= '<now-unit>' and <key> < '<now>'"``.
"""

from __future__ import annotations

from datetime import datetime, timedelta

__all__ = ["generate_archive_config"]

_UNIT_DELTAS = {
    "day": timedelta(days=1),
    "week": timedelta(weeks=1),
    "month": timedelta(days=30),
}

_FMT = "%Y-%m-%d %H:%M:%S"


def generate_archive_config(
    source_db: str,
    source_table: str,
    target_db_table: str,
    time_key: str = "t1",
    timeunit: str = "day",
    now: datetime | None = None,
    time_split_unit: str = "hour",
    **overrides,
) -> dict:
    """Emit a reference-compatible JSON config dict for a rolling
    archive job."""
    if timeunit not in _UNIT_DELTAS:
        raise ValueError(
            f"invalid timeunit {timeunit!r}: expected day, week, or month"
        )
    now = now or datetime.now()
    lo = (now - _UNIT_DELTAS[timeunit]).strftime(_FMT)
    hi = now.strftime(_FMT)
    conf = {
        "databaseType": "mysql",
        "sourceDB": source_db,
        "sourceTable": source_table,
        "databendTable": target_db_table,
        "sourceSplitTimeKey": time_key,
        "timeSplitUnit": time_split_unit,
        "sourceWhereCondition": f"{time_key} >= '{lo}' and {time_key} < '{hi}'",
        "batchSize": 40000,
        "maxThread": 1,
        "copyPurge": True,
        "copyForce": False,
        "disableVariantCheck": True,
        "deleteAfterSync": False,
    }
    conf.update(overrides)
    return conf
