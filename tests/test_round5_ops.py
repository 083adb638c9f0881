"""Constructed-input SEMANTIC tests for the round-5 operators.

The oracle harness proves Spark == DuckDB on the same SQL; these
tests prove the SQL means what the operator claims, on inputs designed
by hand: a known triangle graph, a skyline with ties and duplicates, a
barbell graph for communities/BFS (checked against independent pure-
Python reference implementations, not against a rearranged copy of
the query), distributions with a known KS statistic, a uniform
contingency table (chi2 must be exactly 0), phrase overlaps, shared
8-gram prefixes, and a three-user CDC merge.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from bend_archiver_spark.queries import REGISTRY


def _write(d, name, cols: dict):
    pq.write_table(pa.table(cols), str(d / f"{name}.parquet"))


def _run(spark, d, name):
    rows = REGISTRY[name].spark(spark, str(d)).collect()
    return {
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in rows
    }


def _baskets_lineitem(d, baskets):
    """lineitem rows from (basket, repeat) pairs — each repeat is its
    own order, so a pair co-occurring in r orders has support r."""
    ok, pk, orderkey = [], [], 0
    for basket, repeats in baskets:
        for _ in range(repeats):
            orderkey += 1
            for part in basket:
                ok.append(orderkey)
                pk.append(part)
    _write(
        d,
        "lineitem",
        {
            "l_orderkey": pa.array(ok, pa.int64()),
            "l_partkey": pa.array(pk, pa.int64()),
        },
    )


# --- graph: triangle / LPA / BFS on hand-built graphs ----------------


def _ref_edges(baskets, support=3):
    from collections import Counter

    c = Counter()
    for basket, repeats in baskets:
        for i, u in enumerate(basket):
            for v in basket[i + 1:]:
                c[(min(u, v), max(u, v))] += repeats
    return {e for e, n in c.items() if n >= support}


def _ref_lpa(edges, rounds=3):
    """Independent synchronous LPA with (count desc, label asc)."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        labels = {
            n: min(
                Counter(labels[m] for m in adj[n]).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for n in adj
        }
    return labels


def _ref_bfs(edges, hops=3):
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    src = min(adj)
    dist = {src: 0}
    frontier = {src}
    for h in range(1, hops + 1):
        frontier = {
            m for n in frontier for m in adj[n] if m not in dist
        }
        for m in frontier:
            dist[m] = h
    return dist


_BARBELL = [((1, 2, 3), 3), ((4, 5, 6), 3), ((3, 4), 3)]


class TestGraphSemantics:
    def test_triangle_known_graph(self, spark, tmp_path):
        # triangle {1,2,3} + pendant edge (3,4); basket {4,5} is
        # below the support floor and must NOT become an edge
        _baskets_lineitem(
            tmp_path, [((1, 2, 3), 3), ((3, 4), 3), ((4, 5), 2)]
        )
        got = _run(spark, tmp_path, "graph_triangle_count")
        assert got == {
            (1, 2, 1, 1.0),
            (2, 2, 1, 1.0),
            (3, 3, 1, 2 / 6),  # exact IEEE 2.0/6.0, same op as the query
            (4, 1, 0, 0.0),
        }

    def test_triangle_star_graph_zero(self, spark, tmp_path):
        # hub-and-spoke with the hub as the LOWEST id — the adversarial
        # case for raw-id orientation (C(deg,2) wedges through the
        # hub); degree-ordering points every spoke INTO the hub, so no
        # node has two out-edges and the wedge table is empty. Output:
        # no triangles anywhere, hub degree = #spokes.
        spokes = list(range(2, 10))
        _baskets_lineitem(tmp_path, [((1, sp), 3) for sp in spokes])
        got = _run(spark, tmp_path, "graph_triangle_count")
        assert got == {(1, len(spokes), 0, 0.0)} | {
            (sp, 1, 0, 0.0) for sp in spokes
        }

    def test_lpa_matches_reference_on_barbell(self, spark, tmp_path):
        _baskets_lineitem(tmp_path, _BARBELL)
        edges = _ref_edges(_BARBELL)
        ref = _ref_lpa(edges)
        sizes = {
            lab: sum(1 for v in ref.values() if v == lab)
            for lab in set(ref.values())
        }
        expect = {(n, ref[n], sizes[ref[n]]) for n in ref}
        got = _run(spark, tmp_path, "graph_label_propagation")
        assert got == expect

    def test_bfs_hops_on_barbell(self, spark, tmp_path):
        _baskets_lineitem(tmp_path, _BARBELL)
        ref = _ref_bfs(_ref_edges(_BARBELL))
        assert ref == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3, 6: 3}  # sanity
        got = _run(spark, tmp_path, "graph_bfs_hops")
        assert got == set(ref.items())


# --- skyline ---------------------------------------------------------


class TestSkylineSemantics:
    def test_frontier_with_ties_and_duplicates(self, spark, tmp_path):
        rows = [  # (key, name, price, size)
            (1, "a", 10.0, 5),   # dominated by b at same price
            (2, "b", 10.0, 7),   # frontier
            (3, "c", 12.0, 7),   # dominated by b (cheaper, same size)
            (4, "d", 8.0, 3),    # frontier (cheapest)
            (5, "e", 10.0, 7),   # duplicate of b: both stay
            (6, "f", 15.0, 9),   # frontier (largest)
        ]
        _write(
            tmp_path,
            "part",
            {
                "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "p_name": pa.array([r[1] for r in rows]),
                "p_retailprice": pa.array([r[2] for r in rows]),
                "p_size": pa.array([r[3] for r in rows], pa.int32()),
            },
        )
        got = _run(spark, tmp_path, "pareto_frontier_parts")
        assert got == {
            (2, "b", 10.0, 7),
            (4, "d", 8.0, 3),
            (5, "e", 10.0, 7),
            (6, "f", 15.0, 9),
        }


# --- histogram quantile sketch ---------------------------------------


class TestHistogramQuantileSemantics:
    def test_brackets_exact_order_statistics(self, spark, tmp_path):
        # o_totalprice = 1000 * i for i in 0..99: every order statistic
        # and bin edge is known in closed form
        _write(
            tmp_path,
            "orders",
            {
                "o_orderkey": pa.array(range(100), pa.int64()),
                "o_totalprice": pa.array(
                    [1000.0 * i for i in range(100)]
                ),
            },
        )
        got = {r[0]: r for r in (
            REGISTRY["agg_histogram_quantile"]
            .spark(spark, str(tmp_path))
            .collect()
        )}
        # rank ceil(q*100) -> value 1000*(rank-1); bin = value//10000
        for q, rank in ((0.5, 50), (0.9, 90), (0.99, 99)):
            exact = 1000.0 * (rank - 1)
            lo = (exact // 10000) * 10000
            assert got[q][1] == rank
            assert got[q][2] == lo and got[q][3] == lo + 10000
            assert got[q][4] == exact
            assert got[q][5] is True  # within_bin audit holds


# --- KS / chi2 -------------------------------------------------------


class TestDriftSemantics:
    def test_ks_known_distributions(self, spark, tmp_path):
        lens = [(f"d{i}", "src0", v) for i, v in enumerate([1, 2, 3, 4])]
        lens += [(f"e{i}", "src1", v) for i, v in enumerate([3, 4, 5, 6])]
        _write(
            tmp_path,
            "documents",
            {
                "doc_id": pa.array(range(len(lens)), pa.int64()),
                "source": pa.array([r[1] for r in lens]),
                "n_chars": pa.array([r[2] for r in lens], pa.int64()),
            },
        )
        got = _run(spark, tmp_path, "profile_ks_drift")
        # max |cum_a*nb - cum_b*na| = 8 at v=2 (2*4 - 0*4) -> D = 0.5
        assert got == {(4, 4, 8, 0.5)}

    def test_chi2_uniform_table_is_zero(self, spark, tmp_path):
        # 2 types x 2 days, every cell count 3 -> chi2 exactly 0, dof 1
        rows = []
        eid = 0
        for day in (15, 16):  # two distinct dows
            for etype in ("click", "view"):
                for _ in range(3):
                    rows.append(
                        (
                            eid,
                            datetime.datetime(2024, 1, day, 12, 0, 0),
                            etype,
                        )
                    )
                    eid += 1
        _write(
            tmp_path,
            "events",
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "event_type": pa.array([r[2] for r in rows]),
            },
        )
        got = _run(spark, tmp_path, "profile_chi2_independence")
        assert got == {(1, 0.0)}


# --- retrieval / span coverage ---------------------------------------


class TestTextSemantics:
    def _docs(self, d, texts):
        _write(
            d,
            "documents",
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            },
        )

    def test_phrase_search_counts_overlaps(self, spark, tmp_path):
        self._docs(
            tmp_path,
            [
                "table hash table hash hash",  # matches at pos 0 and 2
                "table table hash",            # match at pos 1
                "hash table",                  # reversed: no match
                "no phrase here",
            ],
        )
        got = _run(spark, tmp_path, "text_phrase_search")
        assert got == {(0, 2), (1, 1)}

    def test_span_coverage_shared_prefix(self, spark, tmp_path):
        shared = "g0 g1 g2 g3 g4 g5 g6 g7"  # exactly one shared 8-gram
        self._docs(
            tmp_path,
            [f"{shared} a8 a9", f"{shared} b8 b9", "short doc"],
        )
        got = _run(spark, tmp_path, "dedup_span_coverage")
        # positions 0..7 covered of 10 tokens; the short doc has no
        # grams and zero coverage
        assert got == {
            (0, 10, 8, 0.8),
            (1, 10, 8, 0.8),
            (2, 2, 0, 0.0),
        }


# --- CDC merge -------------------------------------------------------


class TestMergeUpsertSemantics:
    def test_three_way_provenance(self, spark, tmp_path):
        T = datetime.datetime
        rows = [
            # user 1: only before the cutover -> kept
            (1, T(2024, 1, 10, 8, 0, 0), 1, "view", 1.0),
            # user 2: before AND after -> updated, change wins
            (2, T(2024, 1, 10, 9, 0, 0), 2, "click", 2.0),
            (3, T(2024, 1, 20, 9, 0, 0), 2, "purchase", 3.0),
            # user 3: only after -> inserted
            (4, T(2024, 1, 21, 10, 0, 0), 3, "signup", 4.0),
        ]
        _write(
            tmp_path,
            "events",
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows]),
            },
        )
        got = _run(spark, tmp_path, "archive_merge_upsert")
        assert got == {
            (1, "view", 1.0, "kept"),
            (2, "purchase", 3.0, "updated"),
            (3, "signup", 4.0, "inserted"),
        }

    def test_matched_change_with_null_value_wins(self, spark, tmp_path):
        # the classic MERGE bug: per-column COALESCE resurrects the
        # base value when the change legitimately carries NULL — the
        # matched key must take the change row WHOLESALE
        T = datetime.datetime
        rows = [
            (1, T(2024, 1, 10, 9, 0, 0), 1, "click", 2.0),
            (2, T(2024, 1, 20, 9, 0, 0), 1, "error", None),
        ]
        _write(
            tmp_path,
            "events",
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            },
        )
        got = _run(spark, tmp_path, "archive_merge_upsert")
        assert got == {(1, "error", None, "updated")}

    def test_snapshot_diff_null_transition_is_changed(self, spark, tmp_path):
        # NULL-safe change detection: value 2.0 -> NULL is 'changed',
        # NULL -> NULL is 'unchanged' (a bare <> yields NULL on both
        # and silently misclassifies the first as unchanged)
        T = datetime.datetime
        rows = [
            (1, T(2024, 1, 10, 9, 0, 0), 1, "click", 2.0),
            (2, T(2024, 1, 20, 9, 0, 0), 1, "click", None),
            (3, T(2024, 1, 10, 9, 0, 0), 2, "view", None),
            (4, T(2024, 1, 20, 9, 0, 0), 2, "view", None),
        ]
        _write(
            tmp_path,
            "events",
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            },
        )
        got = _run(spark, tmp_path, "archive_snapshot_diff")
        ops = {r[0]: r[1] for r in got}
        assert ops == {1: "changed", 2: "unchanged"}


# --- attribution / standardization -----------------------------------


class TestAttributionSemantics:
    def test_last_touch_credit(self, spark, tmp_path):
        T = datetime.datetime
        rows = [  # one user: click -> purchase -> purchase -> view -> purchase
            (1, T(2024, 1, 1, 1), 1, "click", 0.0),
            (2, T(2024, 1, 1, 2), 1, "purchase", 10.0),
            (3, T(2024, 1, 1, 3), 1, "purchase", 20.0),
            (4, T(2024, 1, 1, 4), 1, "view", 0.0),
            (5, T(2024, 1, 1, 5), 1, "purchase", 30.0),
            # second user purchases with no prior touch -> direct
            (6, T(2024, 1, 1, 6), 2, "purchase", 5.0),
        ]
        _write(
            tmp_path,
            "events",
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows]),
            },
        )
        got = _run(spark, tmp_path, "events_attribution_last_touch")
        assert got == {
            ("click", 2, 30.0),
            ("view", 1, 30.0),
            ("direct", 1, 5.0),
        }


class TestStandardizeSemantics:
    def test_known_zscores(self, spark, tmp_path):
        _write(
            tmp_path,
            "embeddings",
            {
                "vec_id": pa.array([1, 2], pa.int64()),
                "embedding": pa.array(
                    [[0.0, 10.0], [2.0, 14.0]],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 1], pa.int32()),
            },
        )
        got = _run(spark, tmp_path, "embedding_standardize_dims")
        z = 0.707107  # 1/sqrt(2) rounded to 6 dp
        # round-6 reshape: exploded scalar rows (vec_id, label, dim, zv)
        assert got == {
            (1, 0, 0, -z),
            (1, 0, 1, -z),
            (2, 1, 0, z),
            (2, 1, 1, z),
        }


class TestIntegrityAuditSemantics:
    """The corpus is clean, so the sf sweeps only ever exercise the
    zero-violation path; these fixtures plant known orphans and
    duplicate keys."""

    def test_referential_orphans_counted(self, spark, tmp_path):
        _write(tmp_path, "region", {"r_regionkey": pa.array([0], pa.int64())})
        _write(
            tmp_path,
            "nation",
            {
                "n_nationkey": pa.array([0, 1], pa.int64()),
                # nation 1 points at a missing region -> 1 orphan
                "n_regionkey": pa.array([0, 9], pa.int64()),
            },
        )
        _write(
            tmp_path,
            "customer",
            {
                "c_custkey": pa.array([10, 11], pa.int64()),
                "c_nationkey": pa.array([0, 1], pa.int64()),
            },
        )
        _write(
            tmp_path,
            "supplier",
            {
                "s_suppkey": pa.array([20], pa.int64()),
                "s_nationkey": pa.array([7], pa.int64()),  # orphan
            },
        )
        _write(
            tmp_path,
            "orders",
            {
                "o_orderkey": pa.array([100, 101], pa.int64()),
                # order 101 belongs to a missing customer -> 1 orphan
                "o_custkey": pa.array([10, 99], pa.int64()),
            },
        )
        _write(tmp_path, "part", {"p_partkey": pa.array([30], pa.int64())})
        _write(
            tmp_path,
            "lineitem",
            {
                # rows: (ok 100 ok, part 30 ok, supp 20 ok),
                #       (ok 999 ORPHAN, part 31 ORPHAN, supp 21 ORPHAN)
                "l_orderkey": pa.array([100, 999], pa.int64()),
                "l_partkey": pa.array([30, 31], pa.int64()),
                "l_suppkey": pa.array([20, 21], pa.int64()),
            },
        )
        got = {
            r[0]: (r[1], r[2])
            for r in REGISTRY["verify_referential_integrity"]
            .spark(spark, str(tmp_path))
            .collect()
        }
        assert got == {
            "lineitem.l_orderkey->orders": (2, 1),
            "lineitem.l_partkey->part": (2, 1),
            "lineitem.l_suppkey->supplier": (2, 1),
            "orders.o_custkey->customer": (2, 1),
            "customer.c_nationkey->nation": (2, 0),
            "supplier.s_nationkey->nation": (1, 1),
            "nation.n_regionkey->region": (2, 1),
        }

    def test_duplicate_keys_counted(self, spark, tmp_path):
        # lineitem: composite key (orderkey, linenumber) duplicated
        # once; orders: o_orderkey 5 appears three times (ONE dup key,
        # not two); everything else clean singletons
        _write(
            tmp_path,
            "lineitem",
            {
                "l_orderkey": pa.array([1, 1, 1, 2], pa.int64()),
                "l_linenumber": pa.array([1, 1, 2, 1], pa.int64()),
            },
        )
        _write(
            tmp_path,
            "orders",
            {"o_orderkey": pa.array([5, 5, 5, 6], pa.int64())},
        )
        for name, key in (
            ("customer", "c_custkey"),
            ("part", "p_partkey"),
            ("supplier", "s_suppkey"),
            ("events", "event_id"),
            ("documents", "doc_id"),
            ("embeddings", "vec_id"),
        ):
            _write(tmp_path, name, {key: pa.array([1, 2], pa.int64())})
        got = {
            r[0]: (r[2], r[3], r[4])
            for r in REGISTRY["verify_key_uniqueness"]
            .spark(spark, str(tmp_path))
            .collect()
        }
        assert got["lineitem"] == (4, 3, 1)
        assert got["orders"] == (4, 2, 1)
        for tbl in (
            "customer", "part", "supplier", "events", "documents",
            "embeddings",
        ):
            assert got[tbl] == (2, 2, 0)
