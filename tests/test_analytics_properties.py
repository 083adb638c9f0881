"""Property-based tests for the round-5 analytics operators against
brute-force references: random catalogs/distributions/event streams,
full-result-set equality with an O(n^2)-or-simpler pure-Python
implementation of the CLAIMED semantics (dominance scan for the
skyline, sorted-list order statistics for the quantile sketch, ECDF
walk for KS, per-user replay for attribution and CDC merge)."""

import datetime
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bend_archiver_spark.queries import REGISTRY

from .test_round5_ops import _run


def _tmp(cols_by_table):
    d = tempfile.mkdtemp(prefix="ana_prop_")
    for name, cols in cols_by_table.items():
        pq.write_table(pa.table(cols), f"{d}/{name}.parquet")
    return d


def _cleanup(d):
    shutil.rmtree(d, ignore_errors=True)


_settings = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- skyline vs O(n^2) dominance scan --------------------------------

_points = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=20).map(float),  # price
        st.integers(min_value=1, max_value=10),  # size
    ),
    min_size=1,
    max_size=12,
)


@_settings
@given(pts=_points)
def test_skyline_matches_dominance_scan(spark, pts):
    rows = [(i + 1, f"p{i}", pr, sz) for i, (pr, sz) in enumerate(pts)]
    d = _tmp(
        {
            "part": {
                "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "p_name": pa.array([r[1] for r in rows]),
                "p_retailprice": pa.array([r[2] for r in rows]),
                "p_size": pa.array([r[3] for r in rows], pa.int32()),
            }
        }
    )
    try:
        got = _run(spark, d, "pareto_frontier_parts")
    finally:
        _cleanup(d)
    expect = {
        (k, n, pr, sz)
        for k, n, pr, sz in rows
        if not any(
            (qr <= pr and qs >= sz and (qr < pr or qs > sz))
            for _, _, qr, qs in rows
        )
    }
    assert got == expect


# --- histogram quantile vs sorted-list order statistics --------------

_prices = st.lists(
    st.integers(min_value=0, max_value=200_000).map(float),
    min_size=1,
    max_size=40,
)


@_settings
@given(prices=_prices)
def test_histogram_quantile_brackets_exact(spark, prices):
    import math

    d = _tmp(
        {
            "orders": {
                "o_orderkey": pa.array(range(len(prices)), pa.int64()),
                "o_totalprice": pa.array(prices),
            }
        }
    )
    try:
        rows = REGISTRY["agg_histogram_quantile"].spark(spark, d).collect()
    finally:
        _cleanup(d)
    srt = sorted(prices)
    by_q = {r["q"]: r for r in rows}
    assert set(by_q) == {0.5, 0.9, 0.99}
    for q, r in by_q.items():
        rank = math.ceil(q * len(prices))
        assert r["target_rank"] == rank
        assert r["exact_value"] == srt[rank - 1]
        assert r["within_bin"] is True
        assert r["est_hi"] - r["est_lo"] == 10_000.0


# --- KS vs ECDF walk -------------------------------------------------

_sample = st.lists(
    st.integers(min_value=0, max_value=12), min_size=1, max_size=15
)


@_settings
@given(xs=_sample, ys=_sample)
def test_ks_matches_ecdf_walk(spark, xs, ys):
    docs = [(i, "src0", v) for i, v in enumerate(xs)]
    docs += [(len(xs) + i, "src1", v) for i, v in enumerate(ys)]
    d = _tmp(
        {
            "documents": {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "source": pa.array([r[1] for r in docs]),
                "n_chars": pa.array([r[2] for r in docs], pa.int64()),
            }
        }
    )
    try:
        got = _run(spark, d, "profile_ks_drift")
    finally:
        _cleanup(d)
    na, nb = len(xs), len(ys)
    num = max(
        abs(
            sum(1 for x in xs if x <= v) * nb
            - sum(1 for y in ys if y <= v) * na
        )
        for v in set(xs) | set(ys)
    )
    assert got == {(na, nb, num, num / (na * nb))}


# --- last-touch attribution vs per-user replay -----------------------

_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user
        st.sampled_from(["click", "view", "signup", "purchase", "error"]),
        st.integers(min_value=0, max_value=50),  # value (int-exact)
    ),
    min_size=1,
    max_size=25,
)


@_settings
@given(evs=_events)
def test_attribution_matches_replay(spark, evs):
    T0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, T0 + datetime.timedelta(minutes=i), u, ty, float(v))
        for i, (u, ty, v) in enumerate(evs)
    ]
    d = _tmp(
        {
            "events": {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows]),
            }
        }
    )
    try:
        got = _run(spark, d, "events_attribution_last_touch")
    finally:
        _cleanup(d)
    touch = {}
    credit = {}
    for _, _, u, ty, v in sorted(
        [(r[0], r[1], r[2], r[3], r[4]) for r in rows]
    ):
        if ty in ("click", "view", "signup"):
            touch[u] = ty
        if ty == "purchase":
            ch = touch.get(u, "direct")
            n, rev = credit.get(ch, (0, 0.0))
            credit[ch] = (n + 1, rev + v)  # int-valued: float sum exact
    expect = {(ch, n, rev) for ch, (n, rev) in credit.items()}
    assert got == expect


# --- per-dim standardization vs numpy --------------------------------

_vecs = st.lists(
    st.lists(
        st.integers(min_value=-50, max_value=50).map(float),
        min_size=3,
        max_size=3,
    ),
    min_size=2,
    max_size=10,
).filter(
    # every dimension needs nonzero variance or the z-score divides
    # by zero (the operator's contract assumes real embedding noise)
    lambda vs: all(
        len({v[d] for v in vs}) > 1 for d in range(3)
    )
)


@_settings
@given(vecs=_vecs)
def test_standardize_matches_numpy(spark, vecs):
    import numpy as np

    d = _tmp(
        {
            "embeddings": {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        }
    )
    try:
        got = _run(spark, d, "embedding_standardize_dims")
    finally:
        _cleanup(d)
    a = np.array(vecs)
    z = (a - a.mean(axis=0)) / a.std(axis=0, ddof=1)
    # the registered query returns the driver-hashable EXPLODED shape
    # (vec_id, label, dim, zv), one row per element
    expect = {
        (i, 0, dim, round(float(z[i][dim]), 6))
        for i in range(len(vecs))
        for dim in range(3)
    }
    assert got == expect


# --- OLS degenerate groups: NULL on both engines ---------------------


def test_linreg_degenerate_groups_null_both_engines(spark):
    """A group with a single distinct day has zero x-variance
    (den = n*sxx - sx^2 = 0); one with constant y has zero y-variance
    (r2 denominator = 0). Both must yield NULL slope/r2 on BOTH
    engines — without the mirrored nullif guards, Spark's non-ANSI
    division returns NULL while DuckDB's IEEE default returns
    inf/nan (the round-5 ADVICE finding)."""
    import duckdb

    ts0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    day = datetime.timedelta(days=1)
    rows = [
        # one-day group: x-variance 0 -> slope/intercept/r2 NULL
        ("oneday", ts0, 1.0),
        ("oneday", ts0 + datetime.timedelta(hours=2), 5.0),
        # constant-y group: y-variance 0 -> r2 NULL, slope 0
        ("consty", ts0, 3.0),
        ("consty", ts0 + day, 3.0),
        ("consty", ts0 + 2 * day, 3.0),
        # healthy group: everything defined
        ("ok", ts0, 1.0),
        ("ok", ts0 + day, 2.0),
        ("ok", ts0 + 2 * day, 4.0),
    ]
    d = _tmp(
        {
            "events": {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        }
    )
    try:
        got = {
            r["event_type"]: (r["slope"], r["r2"])
            for r in REGISTRY["agg_linear_regression_per_type"]
            .spark(spark, d)
            .collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
        )
        oracle = {
            r[0]: (r[2], r[4])
            for r in con.execute(
                REGISTRY["agg_linear_regression_per_type"].oracle
            ).fetchall()
        }
    finally:
        _cleanup(d)
    assert got["oneday"] == (None, None)
    assert got["consty"][1] is None
    assert got["ok"][0] is not None and got["ok"][1] is not None
    assert got == oracle
