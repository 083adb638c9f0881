#!/usr/bin/env python
"""Registry-wide redundant-scan audit.

Counts DISTINCT parquet-scan identities per corpus table in every
registered query's executed plan. The plan STRING over-reports scans —
a cached (InMemoryRelation) subtree reprints its child scans at every
reference — but a reprint carries the SAME expression IDs, while a
genuine re-derivation of the subtree gets fresh ones, so counting
distinct `Scan parquet [...]` signatures separates "printed twice"
from "scanned twice".

A query scanning the same corpus table through more than a handful of
distinct scan identities is usually missing a persist barrier on a
small multi-consumer derived table (the round-9 audit found nine of
these; see COVERAGE.md "Redundant-corpus-scan audit").

This tool is the exploratory sweep; the ENFORCED pin lives in
tests/test_plans.py::TestScanCountGuard, which walks the physical
plan via the JVM (robust to plan-string truncation and cache
reprints) and restricts "bounded" to id-like probe columns. Use this
for quick triage, the test for the verdict.

Usage:
    python tools/scan_audit.py                # all queries, flag >threshold
    python tools/scan_audit.py --threshold 3
    python tools/scan_audit.py --all          # print every query's counts
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
# dimensions don't scale; re-scanning them is harmless
CORPUS = set(TABLES) - {"region", "nation"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--threshold", type=int, default=3)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--queries", default="")
    args = ap.parse_args()

    from bend_archiver_spark.queries import REGISTRY
    from bend_archiver_spark.session import get_spark

    spark = get_spark("scan_audit", shuffle_partitions=8)
    names = [q for q in args.queries.split(",") if q] or list(REGISTRY)
    flagged = 0
    for name in names:
        # per-query cache policy, same as bench/oracle_compare: one
        # query's persist must not collapse the next query's counts
        spark.catalog.clearCache()
        try:
            df = REGISTRY[name].spark(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {e}")
            flagged += 1
            continue
        sigs = set(re.findall(r"Scan parquet \[[^\]]*\]", plan))
        per_table: dict[str, int] = {}
        for s in sigs:
            cols = s[len("Scan parquet ") :]
            for t in TABLES:
                # scan signatures list the pruned columns; every table
                # has a distinctive column prefix in this schema
                probe = {
                    "region": "r_", "nation": "n_", "customer": "c_",
                    "supplier": "s_", "part": "p_", "orders": "o_",
                    "lineitem": "l_", "events": "event_",
                    "documents": "doc_", "embeddings": "vec_",
                }[t]
                if re.search(rf"\[{re.escape(probe)}|[ ,]{re.escape(probe)}", cols):
                    per_table[t] = per_table.get(t, 0) + 1
                    break
            else:
                per_table["?"] = per_table.get("?", 0) + 1
        hot = {t: c for t, c in per_table.items() if t in CORPUS and c > args.threshold}
        if hot:
            flagged += 1
            print(f"FLAG  {name:40s} {hot}  (all: {per_table})")
        elif args.all:
            print(f"ok    {name:40s} {per_table}")
    print(f"flagged: {flagged} / {len(names)} (threshold {args.threshold})")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
