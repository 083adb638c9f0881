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


def main(argv: list[str] | None = None) -> int:
    """CLI parity with tools/confgenerotor (conf_generate.go flags:
    -sourceDb -sourceTable -targetDbTable -timeunit), emitting the
    config JSON to stdout or a file."""
    import argparse
    import json

    p = argparse.ArgumentParser(
        prog="bend_archiver_spark.confgen",
        description="Generate a rolling-archive job config",
    )
    p.add_argument("--source-db", required=True)
    p.add_argument("--source-table", required=True)
    p.add_argument("--target-db-table", required=True)
    p.add_argument("--time-key", default="t1")
    p.add_argument("--timeunit", default="day", choices=sorted(_UNIT_DELTAS))
    p.add_argument("--out", default="", help="output path (default stdout)")
    args = p.parse_args(argv)
    conf = generate_archive_config(
        args.source_db,
        args.source_table,
        args.target_db_table,
        time_key=args.time_key,
        timeunit=args.timeunit,
    )
    text = json.dumps(conf, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"wrote {args.out}")
    else:
        print(text)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
