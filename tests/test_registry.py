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
        "driver cap — fold the latest CORRECTNESS greens into "
        "_CHECKED_GOOD (see __spark_entry__) or the overflow never gets "
        "a correctness row"
    )
    # and tier 1 must lead the emission order
    assert names[: len(tier1)] == tier1


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
