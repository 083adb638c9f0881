"""Constructed-input SEMANTIC tests for the round-6 operators.

The oracle harness proves Spark == DuckDB on identical SQL; these
tests prove the operators mean what they claim, against independent
pure-Python reference implementations on hand-built inputs: Gini on a
distribution with a known closed form, run-length encoding on a
crafted event stream, MAD outliers with a planted spike, the CUSUM
argmax on a step-change series, dyadic EWMA replayed with exact
fractions, onion peeling on a lollipop graph, edge Jaccard on a known
clique-plus-bridge, shard packing's no-split/contiguity invariants,
and round-robin interleave's positional contract.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from bend_archiver_spark.queries import REGISTRY

from .test_round5_ops import _run, _write


# --- Gini: closed forms ------------------------------------------------


class TestGiniSemantics:
    def test_equal_spend_is_zero_and_whale_approaches_limit(
        self, spark, tmp_path
    ):
        """All-equal customers => G = 0 exactly. One whale holding
        (nearly) everything among n=4 => G -> (n-1)/n * (extreme
        share); checked against the direct rank-formula replay."""
        custs = [(1, "A", 100.0), (2, "A", 100.0), (3, "A", 100.0),
                 (4, "B", 1.0), (5, "B", 1.0), (6, "B", 1.0),
                 (7, "B", 997.0)]
        _write(
            tmp_path,
            "customer",
            {
                "c_custkey": pa.array([c[0] for c in custs], pa.int64()),
                "c_mktsegment": pa.array([c[1] for c in custs]),
            },
        )
        _write(
            tmp_path,
            "orders",
            {
                "o_custkey": pa.array([c[0] for c in custs], pa.int64()),
                "o_totalprice": pa.array(
                    [c[2] for c in custs], pa.float64()
                ),
            },
        )
        got = {r[0]: (r[1], r[2]) for r in _run(
            spark, tmp_path, "agg_gini_revenue"
        )}

        def ref_gini(xs):
            xs = sorted(xs)
            n = len(xs)
            srx = sum((i + 1) * x for i, x in enumerate(xs))
            return round(2 * srx / (n * sum(xs)) - (n + 1) / n, 9)

        assert got["A"] == (3, 0.0)
        assert got["B"] == (4, ref_gini([1.0, 1.0, 1.0, 997.0]))


# --- histogram bin floor parity on negative lengths ---------------------


class TestHistogramNegativeBinParity:
    def test_negative_n_chars_bins_match_oracle(self, spark, tmp_path):
        """DuckDB's integer // TRUNCATES toward zero ((-49)//50 = 0)
        while floor(-49/50) = -1 — the round-6 code-review's top
        finding: the oracle must spell out floor-of-double-division or
        any negative n_chars (corrupt metadata) lands in a different
        bin per engine. Exercises the exact divergence input."""
        import duckdb

        from bend_archiver_spark.queries import REGISTRY
        from tests.oracle_compare import compare_frames

        _write(
            tmp_path,
            "documents",
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(["a", "b", "c", "d"]),
                "source": pa.array(["s1", "s1", "s2", "s2"]),
                "n_chars": pa.array([-49, -51, 0, 120], pa.int64()),
            },
        )
        spec = REGISTRY["agg_histogram_merge_sources"]
        spark_pdf = spec.spark(spark, str(tmp_path)).toPandas()
        spark.catalog.clearCache()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'"
        )
        duck_pdf = con.execute(spec.oracle).df()
        res = compare_frames(spark_pdf, duck_pdf)
        assert (
            res["rows_match"] and res["cols_match"] and res["values_match"]
        ), res


# --- standardized_vectors helper: regroup of the registered query ------


class TestStandardizedVectorsHelper:
    def test_regroup_matches_exploded_rows(self, spark, tmp_path):
        """The unregistered array-shaped companion must be exactly the
        registered exploded query regrouped in dim order."""
        from bend_archiver_spark.queries.analytics5 import (
            standardized_vectors,
        )

        _write(
            tmp_path,
            "embeddings",
            {
                "vec_id": pa.array([1, 2], pa.int64()),
                "embedding": pa.array(
                    [[0.0, 10.0], [2.0, 14.0]], pa.list_(pa.float32())
                ),
                "label": pa.array([0, 1], pa.int32()),
            },
        )
        exploded = _run(spark, tmp_path, "embedding_standardize_dims")
        vecs = {
            (r["vec_id"], r["label"]): list(r["zvec"])
            for r in standardized_vectors(spark, str(tmp_path)).collect()
        }
        for (vec_id, label), zvec in vecs.items():
            for dim, zv in enumerate(zvec):
                assert (vec_id, label, dim, zv) in exploded
        assert sum(len(v) for v in vecs.values()) == len(exploded)


# --- runs encoding: replay ---------------------------------------------


class TestRunsEncodingSemantics:
    def test_crafted_stream_runs(self, spark, tmp_path):
        ts0 = datetime.datetime(2024, 2, 1)
        stream = ["a", "a", "b", "a", "a", "a", "c", "c"]
        _write(
            tmp_path,
            "events",
            {
                "event_id": pa.array(range(len(stream)), pa.int64()),
                "user_id": pa.array([7] * len(stream), pa.int64()),
                "event_type": pa.array(stream),
                "ts": pa.array(
                    [ts0 + datetime.timedelta(minutes=i)
                     for i in range(len(stream))],
                    pa.timestamp("us"),
                ),
            },
        )
        got = _run(spark, tmp_path, "events_runs_encoding")
        # (user, type, run_start 1-based, run_len)
        assert got == {
            (7, "a", 1, 2),
            (7, "b", 3, 1),
            (7, "a", 4, 3),
            (7, "c", 7, 2),
        }


# --- MAD: planted spike -------------------------------------------------


class TestMadSemantics:
    def test_planted_spike_is_the_only_anomaly(self, spark, tmp_path):
        """14 quiet days at ~100 plus one 10x day: only the spike may
        exceed 3 MAD."""
        ts0 = datetime.datetime(2024, 1, 1, 12)
        vals = [100.0 + (i % 3) for i in range(14)] + [1000.0]
        rows = [(i, ts0 + datetime.timedelta(days=i), v)
                for i, v in enumerate(vals)]
        _write(
            tmp_path,
            "events",
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["x"] * len(rows)),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            },
        )
        got = _run(spark, tmp_path, "timeseries_anomaly_mad")
        assert len(got) == 1
        (row,) = got
        assert row[0] == "x" and row[1] == "2024-01-15"
        assert row[2] == 1000.0  # total column


# --- CUSUM: step change --------------------------------------------------


class TestCusumSemantics:
    def test_step_change_day_is_argmax(self, spark, tmp_path):
        """Series 10,10,10,10,10 then 50,50,50,50,50: the CUSUM
        |n*prefix - t*total| peaks exactly at the last low day."""
        ts0 = datetime.datetime(2024, 3, 1, 6)
        vals = [10.0] * 5 + [50.0] * 5
        rows = [(i, ts0 + datetime.timedelta(days=i), v)
                for i, v in enumerate(vals)]
        _write(
            tmp_path,
            "events",
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["s"] * len(rows)),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            },
        )
        got = _run(spark, tmp_path, "timeseries_changepoint_cusum")
        (row,) = got
        # python replay of the scaled statistic
        n, tot = len(vals), sum(vals)
        best = max(
            (abs(n * sum(vals[: t + 1]) - (t + 1) * tot), t)
            for t in range(n)
        )
        assert row == ("s", "2024-03-05", round(best[0] / n, 6))
        assert best[1] == 4  # last low day (0-based)


# --- EWMA: exact fraction replay ------------------------------------------


class TestEwmaSemantics:
    def test_dyadic_weights_replay(self, spark, tmp_path):
        from fractions import Fraction

        ts0 = datetime.datetime(2024, 4, 1, 9)
        vals = [3.0, 5.0, 7.0, 11.0]
        rows = [(i, ts0 + datetime.timedelta(days=i), v)
                for i, v in enumerate(vals)]
        _write(
            tmp_path,
            "events",
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["e"] * len(rows)),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            },
        )
        got = {r[1]: r[3] for r in _run(spark, tmp_path, "timeseries_ewma_daily")}
        for tday in range(len(vals)):
            num = Fraction(0)
            den = Fraction(0)
            for j in range(0, min(tday + 1, 8)):
                w = 1 << (7 - j)
                num += Fraction(vals[tday - j]) * w
                den += w
            day = (ts0 + datetime.timedelta(days=tday)).strftime("%Y-%m-%d")
            assert got[day] == round(float(num / den), 6)


# --- onion peel: lollipop graph -------------------------------------------


class TestKcoreSemantics:
    def test_lollipop_peel_rounds(self, spark, tmp_path):
        """Triangle {1,2,3} with a path 3-4-5 hanging off (each edge
        needs >= 3 co-orders): node 5 (deg 1) peels round 1, node 4
        peels round 2 (its degree drops when 5 leaves), the triangle
        survives with degree 2."""
        from .test_round5_ops import _baskets_lineitem

        baskets = [
            ([1, 2], 3), ([2, 3], 3), ([1, 3], 3),
            ([3, 4], 3), ([4, 5], 3),
        ]
        _baskets_lineitem(tmp_path, baskets)
        got = _run(spark, tmp_path, "graph_kcore_peel")
        assert got == {
            (1, 0), (2, 0), (3, 0),
            (4, 2), (5, 1),
        }


# --- edge jaccard: clique + bridge ----------------------------------------


class TestEdgeJaccardSemantics:
    def test_clique_edge_vs_bridge(self, spark, tmp_path):
        """K4 on {1,2,3,4} plus a bridge 4-5: every clique edge has 2
        common neighbors and |union| = 2*deg - cn; the bridge has 0."""
        from itertools import combinations

        from .test_round5_ops import _baskets_lineitem

        edges = list(combinations([1, 2, 3, 4], 2)) + [(4, 5)]
        _baskets_lineitem(tmp_path, [(list(e), 3) for e in edges])
        got = {(r[0], r[1]): (r[2], r[3]) for r in _run(
            spark, tmp_path, "graph_edge_jaccard"
        )}
        # clique edge not touching 4: deg 3+3, cn 2 -> 2/(6-2)
        assert got[(1, 2)] == (2, 0.5)
        # edge touching node 4 (deg 4): 2/(3+4-2)
        assert got[(1, 4)] == (2, 0.4)
        # bridge: no common neighbors
        assert got[(4, 5)] == (0, 0.0)


# --- shard pack invariants -------------------------------------------------


class TestShardPackSemantics:
    def test_no_split_contiguous_and_budget_boundaries(
        self, spark, tmp_path
    ):
        texts = ["x" * n for n in (30000, 30000, 30000, 70000, 10)]
        _write(
            tmp_path,
            "documents",
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            },
        )
        rows = sorted(_run(spark, tmp_path, "multimodal_shard_pack"))
        # byte ranges are contiguous in doc order, items never split
        cum = 0
        for doc_id, n_bytes, byte_start, shard_id in rows:
            assert byte_start == cum
            cum += n_bytes
            assert shard_id == (cum - 1) // 65536
        # shard ids are non-decreasing
        sids = [r[3] for r in rows]
        assert sids == sorted(sids)


# --- interleave positional contract ----------------------------------------


class TestInterleaveSemantics:
    def test_positions_follow_round_robin_formula(self, spark, tmp_path):
        _write(
            tmp_path,
            "documents",
            {
                "doc_id": pa.array(range(9), pa.int64()),
                "source": pa.array(
                    ["s1", "s1", "s1", "s2", "s2", "s2", "s3", "s3", "s3"]
                ),
                "text": pa.array(["t"] * 9),
            },
        )
        rows = _run(spark, tmp_path, "pipeline_interleave_sources")
        by_src = {}
        for doc_id, source, src_rank, position in rows:
            by_src.setdefault(source, []).append((src_rank, position))
        idx = {"s1": 0, "s2": 1, "s3": 2}
        for source, pairs in by_src.items():
            for src_rank, position in pairs:
                assert position == (src_rank - 1) * 3 + idx[source]
        # equal-sized sources => positions are a permutation of 0..8
        assert sorted(p for _, _, _, p in rows) == list(range(9))
