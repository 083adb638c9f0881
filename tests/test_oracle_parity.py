"""Oracle-side algorithm parity: where a registered DuckDB oracle
mirrors the Spark plan's bucketing (because the brute verification
shape cannot run at the 100x corpus), these tests pin the bucketed
oracle bit-equal to the brute independent-algorithm form at small
scale — the oracle twin of the Spark-side bucketed==brute pins in
tests/test_operators.py.

Reference analog: the verification contract in worker/worker.go:230-242
(verify whatever the archive ran, at the scale it ran).
"""

from __future__ import annotations

import pytest

from tests.oracle_compare import duck_con

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


class TestSimhashOracleParity:
    """The registered dedup_simhash oracle generates candidates via
    the same two-level pigeonhole as the Spark plan (4 wide blocks x
    radius-2 enumerated balls); exactness vs the brute O(n^2)
    self-join is a theorem, and this pins the SQL implementation of
    it on the real corpora."""

    @pytest.mark.parametrize("sf_dir", SF_DIRS)
    def test_pigeonhole_equals_brute(self, sf_dir):
        from bend_archiver_spark.queries.dedup import (
            _SIMHASH_BRUTE_TAIL,
            _SIMHASH_PIGEONHOLE_TAIL,
            _SIMHASH_SIG_SQL,
        )

        con = duck_con(sf_dir)
        order = " ORDER BY doc_a, doc_b"
        fast = con.execute(
            _SIMHASH_SIG_SQL + _SIMHASH_PIGEONHOLE_TAIL + order
        ).fetchall()
        brute = con.execute(
            _SIMHASH_SIG_SQL + _SIMHASH_BRUTE_TAIL + order
        ).fetchall()
        assert len(brute) > 0  # non-vacuous: the corpus has near-dups
        assert fast == brute

    def test_registered_oracle_is_the_pigeonhole_form(self):
        from bend_archiver_spark.queries import REGISTRY
        from bend_archiver_spark.queries.dedup import (
            _SIMHASH_PIGEONHOLE_TAIL,
            _SIMHASH_SIG_SQL,
        )

        assert (
            REGISTRY["dedup_simhash"].oracle
            == _SIMHASH_SIG_SQL + _SIMHASH_PIGEONHOLE_TAIL
        )


class TestAdaptivePlanesLockstep:
    """The cosine-LSH plane count is chosen per corpus size on BOTH
    engines: Python integer loop (operators.similarity.adaptive_planes)
    on the Spark side, the generated threshold-CASE ladder
    (_PLANES_CASE_SQL) on the oracle side. A divergence at any n would
    silently hash-mismatch every embedding-dedup query, so pin the two
    formulas equal across every ladder boundary and the real corpus
    sizes."""

    def test_case_ladder_matches_python(self):
        import duckdb

        from bend_archiver_spark.operators.similarity import (
            LSH_PLANES_CAP,
            LSH_PLANES_FLOOR,
            LSH_TARGET_BUCKET,
            adaptive_planes,
        )
        from bend_archiver_spark.queries.dedup import _PLANES_CASE_SQL

        probes = {1, 2, 500, 2000, 5000, 20_000, 200_000, 2_000_000,
                  5_000_000}
        for p in range(LSH_PLANES_FLOOR, LSH_PLANES_CAP + 1):
            b = (1 << p) * LSH_TARGET_BUCKET
            probes.update({b - 1, b, b + 1})
        rows = ", ".join(f"({n})" for n in sorted(probes))
        got = duckdb.sql(
            f"SELECT n, {_PLANES_CASE_SQL} AS np"
            f" FROM (VALUES {rows}) t(n) ORDER BY n"
        ).fetchall()
        for n, np in got:
            assert np == adaptive_planes(n), (n, np, adaptive_planes(n))

    def test_floor_at_driver_scales(self):
        # every driver/bench corpus sits at the 6-plane floor, so the
        # adaptive gate is bit-identical to the historical 8x6 config
        # at sf0.001 / sf0.01 / sf0.1 (500 / 500 / 2000 vectors)
        from bend_archiver_spark.operators.similarity import adaptive_planes

        assert adaptive_planes(500) == 6
        assert adaptive_planes(2000) == 6
        # and the scale points the sweeps run at
        assert adaptive_planes(20_000) == 9  # 10x
        assert adaptive_planes(200_000) == 12  # 100x


class TestAdaptiveTablesLockstep:
    """The table count amplifies alongside the plane count (holding
    near-dup recall as the gate narrows); both engines must walk the
    SAME integer ladder, and the hardcoded ladder must equal the
    amplification formula it documents."""

    def test_ladder_matches_amplification_formula(self):
        # ceil(8 * (1/p*)^(p - 6)), p* = 1 - acos(design)/pi: the
        # Indyk–Motwani amplification holding T * p*^planes constant
        import math

        from bend_archiver_spark.operators.similarity import (
            LSH_DESIGN_COSINE,
            LSH_PLANES_CAP,
            LSH_PLANES_FLOOR,
            LSH_TABLES_LADDER,
        )

        p_star = 1 - math.acos(LSH_DESIGN_COSINE) / math.pi
        for p in range(LSH_PLANES_FLOOR, LSH_PLANES_CAP + 1):
            want = math.ceil(8 * (1 / p_star) ** (p - LSH_PLANES_FLOOR) - 1e-9)
            got = LSH_TABLES_LADDER[p - LSH_PLANES_FLOOR]
            assert got == want, (p, got, want)

    def test_tables_case_ladder_matches_python(self):
        import duckdb

        from bend_archiver_spark.operators.similarity import (
            LSH_PLANES_CAP,
            LSH_PLANES_FLOOR,
            adaptive_tables,
        )
        from bend_archiver_spark.queries.dedup import _TABLES_CASE_SQL

        rows = ", ".join(
            f"({p})" for p in range(LSH_PLANES_FLOOR, LSH_PLANES_CAP + 1)
        )
        got = duckdb.sql(
            f"SELECT np, {_TABLES_CASE_SQL} AS nt"
            f" FROM (VALUES {rows}) t(np) ORDER BY np"
        ).fetchall()
        for np, nt in got:
            assert nt == adaptive_tables(np), (np, nt, adaptive_tables(np))

    def test_floor_and_sweep_rungs(self):
        # driver corpora stay at the historical 8-table floor; the
        # 10x/100x sweep rungs land at 15 and 26 tables
        from bend_archiver_spark.operators.similarity import adaptive_tables

        assert adaptive_tables(6) == 8
        assert adaptive_tables(9) == 15  # 10x (20k vectors)
        assert adaptive_tables(12) == 26  # 100x (200k vectors)
