#!/usr/bin/env python
"""Full-registry partition-invariance sweep.

The per-commit battery (tests/test_partition_invariance.py) checks a
representative ~50-query slice at two shuffle widths. This tool is the
exhaustive version: EVERY registered query, executed at two different
``spark.sql.shuffle.partitions`` settings, full result sets compared
bit-for-bit (sorted by all columns). Any query whose output depends on
the partition count — a float sum, a non-total-order window, a
collect_list without a canonicalizing sort — fails here even if the
oracle comparison passed by luck at the default width.

Usage:
    python tools/invariance_sweep.py [--sf-dir DIR] [--widths 7,29]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rows_of(spark, sf_dir, name):
    from bend_archiver_spark.queries import REGISTRY

    df = REGISTRY[name].spark(spark, sf_dir)
    cols = sorted(df.columns)
    out = [tuple(r) for r in df.select(*cols).collect()]
    return sorted(out, key=repr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--widths", default="7,29")
    args = ap.parse_args()
    w1, w2 = (int(x) for x in args.widths.split(","))

    from bend_archiver_spark.queries import REGISTRY
    from bend_archiver_spark.session import get_spark

    spark = get_spark("invariance_sweep")

    def _drop_caches() -> None:
        # BETWEEN the two widths, not just between queries: a persist
        # barrier (minhash shingles, BM25 postings) or the analytics7
        # daily-rollup memo would otherwise serve width-w1 blocks to
        # the w2 run and make the comparison vacuous for exactly the
        # stages this sweep exists to re-execute.
        from bend_archiver_spark.queries.analytics7 import clear_daily_cache

        spark.catalog.clearCache()
        clear_daily_cache()

    bad, err = [], []
    for i, name in enumerate(REGISTRY, 1):
        try:
            spark.conf.set("spark.sql.shuffle.partitions", str(w1))
            a = rows_of(spark, args.sf_dir, name)
            _drop_caches()
            spark.conf.set("spark.sql.shuffle.partitions", str(w2))
            b = rows_of(spark, args.sf_dir, name)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            err.append(name)
            print(f"ERR   {name}: {type(exc).__name__}: {exc}"[:300],
                  file=sys.stderr)
            continue
        finally:
            _drop_caches()
        if a == b:
            print(f"OK    {name} ({len(a)} rows)  [{i}/{len(REGISTRY)}]")
        else:
            bad.append(name)
            print(f"DIFF  {name}: {len(a)} vs {len(b)} rows or values")
    print(f"SUMMARY invariant={len(REGISTRY) - len(bad) - len(err)} "
          f"diff={len(bad)} err={len(err)} widths=({w1},{w2})")
    if bad:
        print("DIFFS:", bad)
    spark.stop()
    return 1 if (bad or err) else 0


if __name__ == "__main__":
    sys.exit(main())
