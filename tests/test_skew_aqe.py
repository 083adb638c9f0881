"""AQE skew-join rehearsal pins (SCALE.md's third skew layer).

session.py enables ``spark.sql.adaptive.skewJoin`` for every session;
these tests prove the mechanism actually FIRES on a skewed shuffle
join (rather than silently never triggering) and that splitting a
skewed partition does not change the answer. The at-scale timing
comparison (aqe_on vs aqe_off vs salted on the 10x corpus) lives in
tools/skew_rehearsal.py with its results recorded in SCALE.md; this
is the fast always-on correctness pin.

Thresholds are lowered from the 256 MB production default so the
decision rule (hot partition > factor x median AND > threshold)
triggers at test scale; the rule itself is unchanged.
``forceOptimizeSkewedJoin`` is set because the asserted query
aggregates after the join and OptimizeSkewedJoin otherwise declines
plans where splitting adds a shuffle.
"""

import pytest
from pyspark.sql import functions as F

_SKEW_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


@pytest.fixture()
def skew_conf(spark):
    """Apply runtime skew-tuning confs, restoring previous values."""
    prev = {}
    for k, v in _SKEW_CONF.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_join(spark):
    """~30% of a 1.5M-row fact on one hot key, vs a 50k-key dim that
    must not broadcast; wide deterministic payload so the hot shuffle
    partition clears the (lowered) byte threshold."""
    n = 1_500_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(F.col("id") % 50_000)
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pay"),
    )
    dim = spark.range(50_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("dv"),
    )
    return fact.join(dim, "k").groupBy().agg(
        F.sum(F.col("v") + F.length("pay") + F.length("dv")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )


class TestAqeSkewJoin:
    def test_skew_split_fires_and_answer_is_invariant(
        self, spark, skew_conf
    ):
        df = _skewed_join(spark)
        row = df.collect()[0]
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE skew splitting did not fire on a partition holding "
            "~30% of the fact side — the rehearsal would be measuring "
            "an unsplit join"
        )
        assert "AQEShuffleRead skewed" in plan

        # same join, splitting disabled: answer must be identical
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        try:
            row_off = _skewed_join(spark).collect()[0]
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        assert (row["n"], row["s"]) == (row_off["n"], row_off["s"])
        assert row["n"] == 1_500_000

    def test_salted_join_matches_plain(self, spark, skew_conf):
        """operators/skew.py's salted_join returns exactly the plain
        join's multiset on the same skewed input (the salt column is
        internal and dropped)."""
        from bend_archiver_spark.operators.skew import salted_join

        n = 200_000
        fact = spark.range(n).select(
            F.when(F.col("id") % 10 < 3, F.lit(0))
            .otherwise(F.col("id") % 5_000)
            .alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        dim = spark.range(5_000).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("w")
        )
        plain = fact.join(dim, "k").groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
        ).collect()[0]
        salted = salted_join(fact, dim, "k", salt_buckets=8).groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
        ).collect()[0]
        assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])
