"""Property-based graph-operator tests: random co-occurrence baskets,
checked against independent pure-Python reference implementations
(the same cross-implementation strategy as test_round5_ops, but over
Hypothesis-generated graphs instead of two hand-built ones).

Examples are few (Spark jobs per example) but each covers an
arbitrary small graph: disconnected components, isolated support
filtering, degree ties for the orientation order, self-converged
labels — shapes hand-written cases miss.
"""

import shutil
import tempfile
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bend_archiver_spark.queries import REGISTRY

from .test_round5_ops import (
    _baskets_lineitem,
    _ref_bfs,
    _ref_edges,
    _ref_lpa,
    _run,
)


class _Dir:
    def __init__(self):
        self.path = tempfile.mkdtemp(prefix="graph_prop_")

    def __truediv__(self, name):
        import pathlib

        return pathlib.Path(self.path) / name

    def __str__(self):
        return self.path


_basket = st.tuples(
    st.lists(
        st.integers(min_value=1, max_value=8),
        min_size=2,
        max_size=4,
        unique=True,
    ).map(tuple),
    st.integers(min_value=1, max_value=4),
)

# the fixed ((1,2), 3) basket guarantees a non-empty edge set, so the
# MIN-source BFS seed and the LPA node set are always defined
_baskets = st.lists(_basket, min_size=0, max_size=5).map(
    lambda bs: bs + [((1, 2), 3)]
)


def _ref_triangles(edges):
    nodes = {n for e in edges for n in e}
    tri = {n: 0 for n in nodes}
    for a, b, c in combinations(sorted(nodes), 3):
        if (
            (a, b) in edges and (b, c) in edges and (a, c) in edges
        ):
            for n in (a, b, c):
                tri[n] += 1
    deg = {n: sum(1 for e in edges if n in e) for n in nodes}
    return {
        (
            n,
            deg[n],
            tri[n],
            (2.0 * tri[n]) / (float(deg[n]) * (deg[n] - 1))
            if deg[n] >= 2
            else 0.0,
        )
        for n in nodes
    }


def _with_dir(baskets, fn):
    d = _Dir()
    try:
        _baskets_lineitem(d, baskets)
        return fn(d)
    finally:
        shutil.rmtree(d.path, ignore_errors=True)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(baskets=_baskets)
def test_triangle_matches_reference(spark, baskets):
    edges = _ref_edges(baskets)
    got = _with_dir(
        baskets, lambda d: _run(spark, d, "graph_triangle_count")
    )
    assert got == _ref_triangles(edges)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(baskets=_baskets)
def test_lpa_matches_reference(spark, baskets):
    ref = _ref_lpa(_ref_edges(baskets))
    sizes = {
        lab: sum(1 for v in ref.values() if v == lab)
        for lab in set(ref.values())
    }
    expect = {(n, ref[n], sizes[ref[n]]) for n in ref}
    got = _with_dir(
        baskets, lambda d: _run(spark, d, "graph_label_propagation")
    )
    assert got == expect


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(baskets=_baskets)
def test_bfs_matches_reference(spark, baskets):
    ref = _ref_bfs(_ref_edges(baskets))
    got = _with_dir(baskets, lambda d: _run(spark, d, "graph_bfs_hops"))
    assert got == set(ref.items())
